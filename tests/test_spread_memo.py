"""_spread()'s split-count memo (r15 optimization).

The probe (.rdd.getNumPartitions()) is ~0.1 s of serial driver work per
call across 23 call sites; the decision is a pure function of the scanned
file set, so it is memoized per (applicationId, parallelism, file set).
These tests pin (1) the memo actually populates and is keyed on the file
set, (2) a filtered slice of the same table shares the raw scan's entry,
and (3) the repartition decision itself is unchanged by the memo path.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries import documents as D
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_spread_memo_populates_and_decision_stable(spark):
    D._SPREAD_MEMO.clear()
    docs = load_table(spark, SF, "documents")
    out1 = D._spread(docs, spark)
    assert len(D._SPREAD_MEMO) == 1
    (key,) = D._SPREAD_MEMO
    assert key[0] == spark.sparkContext.applicationId
    assert key[1] == spark.sparkContext.defaultParallelism
    # second call hits the memo (no new entry) and yields the same
    # partitioning decision
    out2 = D._spread(load_table(spark, SF, "documents"), spark)
    assert len(D._SPREAD_MEMO) == 1
    assert (
        out1.rdd.getNumPartitions() == out2.rdd.getNumPartitions()
    )
    # the single-file fixture scan has fewer splits than cores, so the
    # spread must have fired
    assert out1.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_filtered_slice_shares_entry(spark):
    D._SPREAD_MEMO.clear()
    docs = load_table(spark, SF, "documents")
    D._spread(docs, spark)
    assert len(D._SPREAD_MEMO) == 1
    # a filtered slice scans the same file set -> same split count ->
    # shares the memo entry rather than re-probing
    D._spread(docs.filter(F.col("source") == "src1"), spark)
    assert len(D._SPREAD_MEMO) == 1
    # a different table is a different file set -> new entry
    D._spread(load_table(spark, SF, "events").select("event_id"), spark)
    assert len(D._SPREAD_MEMO) == 2


def test_spread_split_conf_change_invalidates_entry(spark):
    # r15 ADVICE: the memo key folds in the split-relevant
    # spark.sql.files.* confs — a loader that changes them mid-session
    # must re-probe, not inherit a stale split decision.
    D._SPREAD_MEMO.clear()
    docs = load_table(spark, SF, "documents")
    D._spread(docs, spark)
    assert len(D._SPREAD_MEMO) == 1
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "33554432")
        D._spread(load_table(spark, SF, "documents"), spark)
        assert len(D._SPREAD_MEMO) == 2
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
