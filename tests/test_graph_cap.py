"""The CF hot-customer guard must actually fire: a planted customer
connected to more than CF_CUST_CAP suppliers keeps exactly CF_CUST_CAP
edges (a deterministic md5-uniform sample), so its pair contribution is
bounded at CAP(CAP-1)/2 regardless of skew, while normal customers pass
through untouched. Without the cap one hot key contributes S(S-1)/2 pair
rows and the shared-customer self-join goes quadratic at corpus scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.graph_q import (
    CF_CUST_CAP,
    _cap_customer_edges,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "c long, s long")


def test_hot_customer_capped_normal_untouched(spark):
    hot = [(1, s) for s in range(CF_CUST_CAP + 40)]
    normal = [(2, s) for s in range(5)]
    out = _cap_customer_edges(_edges(spark, hot + normal))
    per_c = {
        r["c"]: r["n"]
        for r in out.groupBy("c").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_c == {1: CF_CUST_CAP, 2: 5}, per_c


def test_cap_is_deterministic_and_a_subset(spark):
    rows = [(1, s) for s in range(CF_CUST_CAP + 17)]
    a = {(r["c"], r["s"]) for r in _cap_customer_edges(_edges(spark, rows)).collect()}
    b = {(r["c"], r["s"]) for r in _cap_customer_edges(_edges(spark, rows)).collect()}
    assert a == b
    assert a <= {(c, s) for c, s in rows}
    assert len(a) == CF_CUST_CAP


def test_cap_inactive_below_threshold(spark):
    rows = [(c, s) for c in range(3) for s in range(10)]
    out = _cap_customer_edges(_edges(spark, rows))
    assert {(r["c"], r["s"]) for r in out.collect()} == set(rows)
