"""Dedup / latest-by-key views.

The reference relies on ClickHouse ReplacingMergeTree semantics: duplicate
event ids from re-ingest collapse asynchronously, and every careful reader
adds ``FINAL`` or app-level dedup (reference src/ledger-engine.ts:508-517,
CLICKHOUSE_INDEXER_PLAN.md:26 "LIMIT 1 BY"). In Spark, dedup is an explicit
deterministic view — these helpers are the *only* read path for versioned
data, so the "forgot FINAL" bug class cannot exist here.

Scale notes: ``latest_by_key`` is one shuffle on the key (window function).
At 100 TB, partition the storage by a coarse key prefix so the window's
exchange is partial; AQE handles skewed keys. ``dropDuplicates`` on the id
is a hash aggregate with map-side partial dedup — no full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe_by_id(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Keep one arbitrary-but-complete row per id (rows are exact duplicates
    modulo re-ingest, so any winner is correct — matches ReplacingMergeTree)."""
    return df.dropDuplicates([id_col])


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Latest row per key, strictly ordered by ``order`` (give it a unique
    tiebreak column — the reference uses version columns like ``height`` /
    ``updated_at``; reference clickhouse/init/001_create_tables.sql:140-141,447-448).
    """
    cols = [F.col(c).desc() if isinstance(c, str) else c.desc() for c in order]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
