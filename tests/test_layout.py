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


def test_zorder_layout_skips_on_both_dims(spark):
    """The Z-ordered layout must (a) push BOTH dimension predicates down to
    the parquet scan, (b) concentrate any (type, user-range) slice into few
    files — the two-dimensional locality a single-column sort cannot give —
    and (c) serve exactly the raw table's rows."""
    import glob

    import pyarrow.parquet as pq

    from neomarket_clickhouse_indexer_spark.plans.layout import (
        zorder_events_layout,
    )

    out = zorder_events_layout(spark, SF_SMOKE)
    scan = (
        spark.read.parquet(out)
        .filter((F.col("event_type") == "purchase") & F.col("user_id").between(16, 47))
        .select("event_id")
    )
    plan = explain_str(scan, "formatted")
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "event_type" in pushed and "user_id" in pushed

    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) > 4, "z-layout should split into multiple zv-ranged files"
    # two-dim locality: the slice's rows live in a strict subset of files
    touching = 0
    for f in files:
        t = pq.read_table(f, columns=["event_type", "user_id"])
        et, uid = t.column("event_type").to_pylist(), t.column("user_id").to_pylist()
        if any(e == "purchase" and 16 <= u <= 47 for e, u in zip(et, uid)):
            touching += 1
    assert touching < len(files), (
        f"slice touches all {len(files)} files — no z-locality"
    )

    raw = load_table(spark, SF_SMOKE, "events")
    assert (
        scan.count()
        == raw.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").between(16, 47)
        ).count()
    )
