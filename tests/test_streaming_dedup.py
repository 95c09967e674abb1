"""Watermarked stream dedup (_dedup_stream_frame): the property that
matters is CROSS-BATCH state — the planted duplicate copy of every
md5-drawn event arrives one microbatch later than the original, so a
per-batch distinct would accept it and only surviving dedup state drops
it. Pinned at sf0.001: every event_type's accepted count equals its
original (pre-duplication) count, the measured drop count equals the
planted duplicate count and is strictly positive, and totals add up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.events import (
    _DEDUP_DUP_PRED,
    _dedup_stream_frame,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF0001 = "/root/testdata/sf0.001"


def test_cross_batch_duplicates_dropped(spark):
    out = {r["event_type"]: r for r in _dedup_stream_frame(spark, SF0001).collect()}
    ev = load_table(spark, SF0001, "events")
    base = {
        r["event_type"]: (int(r["n"]), int(r["d"]))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.expr(_DEDUP_DUP_PRED), 1).otherwise(0)).alias("d"),
        )
        .collect()
    }
    assert set(out) == set(base)
    total_dropped = 0
    for et, row in out.items():
        n_orig, n_dup = base[et]
        assert row["n_input"] == n_orig + n_dup
        # exactly-once: one accepted row per distinct event_id
        assert row["n_accepted"] == n_orig
        # measured drops == planted duplicates
        assert row["n_dropped"] == n_dup
        total_dropped += row["n_dropped"]
    assert total_dropped > 0  # the evidence is populated, not vacuous
