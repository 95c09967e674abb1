"""Layout writer: partition pruning reaches the file index; clustered sort
holds within files."""

from __future__ import annotations

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.plans.explain import explain_str
from neomarket_clickhouse_indexer_spark.plans.layout import (
    month_col,
    pruned_scan,
    write_clustered,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_partition_pruning_and_cluster_order(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "year_month", month_col("ts")
    )
    path = str(tmp_path / "events_clustered")
    write_clustered(
        ev, path, partition_by=["year_month"], cluster_by=["event_type", "ts"]
    )

    scan = pruned_scan(spark, path, year_month="202401")
    plan = explain_str(scan, "formatted")
    # the partition filter must appear as a PartitionFilters entry on the
    # scan (pruning at the file index), not a post-scan Filter
    assert "PartitionFilters" in plan and "year_month" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert scan.count() == ev.filter(F.col("year_month") == "202401").count()

    # rows inside each file are clustered: event_type runs are contiguous
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{path}/year_month=202401/*.parquet")
    assert files
    t = pq.read_table(files[0], columns=["event_type"])
    vals = t.column("event_type").to_pylist()
    runs = 1 + sum(1 for a, b in zip(vals, vals[1:]) if a != b)
    assert runs <= 10, f"expected clustered runs, got {runs} transitions"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with ZERO
    Exchange nodes — the co-located join that removes the fact-fact
    shuffle at 100 TB."""
    import re

    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.plans import explain_str
    from neomarket_clickhouse_indexer_spark.plans.layout import write_bucketed
    from neomarket_clickhouse_indexer_spark.sources.tables import load_table

    from .conftest import SF_CORRECTNESS

    li = load_table(spark, SF_CORRECTNESS, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_CORRECTNESS, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    try:
        write_bucketed(li, "li_b", str(tmp_path / "li_b"), "l_orderkey")
        write_bucketed(orders, "ord_b", str(tmp_path / "ord_b"), "o_orderkey")
        j = (
            spark.table("li_b")
            .hint("merge")
            .join(
                spark.table("ord_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        plan = explain_str(j)
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges == 0, (
            "bucketed join must not shuffle:\n" + plan
        )
        assert "SortMergeJoin" in plan
        # and it computes the same rows as the plain join
        expected = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert j.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
