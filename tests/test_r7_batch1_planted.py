"""Planted cases for the r7 batch-1 operators: compaction offset-binning
(straddling oversized file), and exact decayed-leaderboard weights."""

from __future__ import annotations

import datetime


def test_compaction_offset_binning_straddle(spark):
    from neomarket_clickhouse_indexer_spark.queries.pipeline import (
        COMPACT_TARGET,
    )
    from pyspark.sql import functions as F

    # files: 1000, 2000(oversized: straddles), 400, 1300 in one source —
    # offsets 0, 1000, 3000, 3400 -> bins 0, 0, 2, 2 (bin 1 is EMPTY:
    # the straddler consumed its range; OPTIMIZE never splits a file)
    rows = [(1, "s", 1000), (2, "s", 2000), (3, "s", 400), (4, "s", 1300)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    from pyspark.sql import Window

    wspec = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = docs.select(
        "doc_id",
        F.coalesce(F.sum("n_chars").over(wspec), F.lit(0)).alias("off"),
    ).withColumn("bin_id", F.expr(f"off DIV {COMPACT_TARGET}"))
    got = {r.doc_id: r.bin_id for r in binned.collect()}
    assert got == {1: 0, 2: 0, 3: 2, 4: 2}


def test_decayed_leaderboard_exact_weights(spark):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        DECAY_ANCHOR,
        DECAY_HORIZON,
        events_decayed_leaderboard,
    )
    import os
    import shutil

    # two users: u1 has 100 cents at age 1 and age 2; u2 has 250 cents at
    # age 1 only. weight_fast = 2^(H - age)
    anchor = datetime.date.fromisoformat(DECAY_ANCHOR)
    rows = []
    for u, cents_ages in [(1, [(100, 1), (100, 2)]), (2, [(250, 1)])]:
        for cents, age in cents_ages:
            d = anchor - datetime.timedelta(days=age)
            rows.append(
                (len(rows), datetime.datetime(d.year, d.month, d.day, 12),
                 u, "purchase", cents / 100.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    tmp = "/tmp/nmci_decay_planted"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {r.user_id: r for r in events_decayed_leaderboard(spark, tmp).collect()}
    H = DECAY_HORIZON
    assert int(out[1].score_fast) == 100 * 2 ** (H - 1) + 100 * 2 ** (H - 2)
    assert int(out[2].score_fast) == 250 * 2 ** (H - 1)
    # 250*2^(H-1) > 100*(2^(H-1)+2^(H-2)) -> u2 ranks first
    assert list(out) == [2, 1] or out[2].score_fast > out[1].score_fast
