"""REST metadata sources (S5/S6): driver-side paginated fetch + incremental
checkpointed sync, network-free by injection.

Reference:
- S5 Gamma paginated sync: offset pages of ≤100, 50 ms between pages, open
  then closed passes (src/sync-metadata.ts:50-115).
- S6 incremental sync with checkpoint: ``since`` watermark persisted in
  ``indexer_status``, change-detection diff before writing, periodic
  checkpoint flush (src/sync-indexer-metadata.ts:47-251).

A metadata corpus (27k markets, README.md:13) is driver-sized by
definition — fetching it distributed buys nothing. The Spark-native part
is what happens AFTER the fetch: `spark.createDataFrame` → anti-join
change detection → versioned upsert into the latest-by-key table. The
fetcher is injected (any callable page → rows), so tests run with a fake
and production wires an HTTP client.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PageFetcher = Callable[[int, int], list[dict]]  # (offset, limit) -> rows


def fetch_all_pages(
    fetch: PageFetcher,
    page_size: int = 100,
    inter_page_delay_s: float = 0.0,
    max_pages: int = 10_000,
) -> Iterator[dict]:
    """Offset pagination until a short page (reference: 100/page, 50 ms
    delay — pass inter_page_delay_s=0.05 in production)."""
    offset = 0
    for _ in range(max_pages):
        rows = fetch(offset, page_size)
        yield from rows
        if len(rows) < page_size:
            return
        offset += page_size
        if inter_page_delay_s:
            time.sleep(inter_page_delay_s)


class Checkpoint:
    """Watermark persistence (reference indexer_status row, 001:337-345) —
    a tiny JSON file; at scale this is one row in any metadata store."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def write(self, state: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)


def sync_incremental(
    spark: SparkSession,
    fetch: PageFetcher,
    schema: str,
    table_path: str,
    checkpoint: Checkpoint,
    key: str,
    version_col: str,
) -> int:
    """One S6 sync round: fetch rows newer than the watermark, drop
    unchanged rows via anti-join (change detection,
    sync-indexer-metadata.ts:97-251), append the rest (latest-by-key views
    resolve versions on read), advance the watermark. Returns rows written.
    """
    state = checkpoint.read()
    since = state.get("since")
    rows = [r for r in fetch_all_pages(fetch) if since is None or r[version_col] > since]
    if not rows:
        return 0
    incoming = spark.createDataFrame(rows, schema)

    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path).select(key, version_col)
        incoming = incoming.join(
            existing,
            on=[key, version_col],
            how="left_anti",  # unchanged (same key+version) rows are no-ops
        )
    n = incoming.count()
    if n:
        incoming.write.mode("append").parquet(table_path)
    max_version = max(r[version_col] for r in rows)
    checkpoint.write({**state, "since": max_version, "rows_last_sync": n})
    return n
