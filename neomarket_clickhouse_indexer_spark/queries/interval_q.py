"""Interval-overlap analytics — the temporal-join family.

The reference resolves positions against validity intervals (SCD2 windows
in category_leaderboard; snapshot intervals in the O2 tier) with as-of
semantics. This module adds the symmetric case: OVERLAP self-joins over
interval sets, where the naive formulation is a per-key quadratic
predicate join. The Spark side runs the scale path — each interval is
expanded to the (few) coarse week buckets it covers, the join runs on
(key, week) equality, the exact overlap predicate filters, and pair
dedup collapses multi-bucket matches; expansion factor is bounded by
interval length / bucket width, so the shuffle stays linear in input.
The DuckDB oracle runs the DIRECT quadratic predicate join, so the
differential proves the bucketization loses no pairs and invents none —
the same lossless-candidate-generation pattern as the PPJoin and LSH
gates. Peak concurrency comes from the classic sweep line (±1 deltas,
pre-aggregated per date so ties cannot reorder, running-sum window).

Determinism: all dates are calendar DATEs (NTZ-safe), durations are
exact integers derived from quantity, and pair identity is the full
(d0, d1, iid) interval tuple over the DISTINCT interval set —
(orderkey, linenumber) alone is not unique in the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

_WEEK_ANCHOR = "1995-01-01"  # week 0 epoch for bucketization


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shipment interval per DISTINCT lineitem row: [shipdate,
    shipdate + dur] where dur = (quantity mod 7) + 1 days (quantity is an
    exact integer 1..50 shipped as double). (orderkey, linenumber) is NOT
    unique in the fixture (1401 duplicate keys with differing supplier/
    date fields), so the interval identity is the full (d0, d1, iid)
    tuple and the set is DISTINCT — both engines dedup identically."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
        F.col("l_shipdate").cast("date").alias("d0"),
        F.expr(
            "date_add(CAST(l_shipdate AS DATE), "
            "(CAST(l_quantity AS INT) % 7) + 1)"
        ).alias("d1"),
    )
    return li.distinct()


def supplier_shipment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _intervals(spark, sf_dir)
    wk = "datediff({d}, DATE'{a}') DIV 7"
    expanded = iv.select(
        "s",
        "iid",
        "d0",
        "d1",
        F.explode(
            F.sequence(
                F.expr(wk.format(d="d0", a=_WEEK_ANCHOR)),
                F.expr(wk.format(d="d1", a=_WEEK_ANCHOR)),
            )
        ).alias("w"),
    )
    a = expanded.select(
        "s", "w",
        F.col("iid").alias("ia"),
        F.col("d0").alias("a0"),
        F.col("d1").alias("a1"),
    )
    b = expanded.select(
        "s", "w",
        F.col("iid").alias("ib"),
        F.col("d0").alias("b0"),
        F.col("d1").alias("b1"),
    )
    lt = F.struct("a0", "a1", "ia") < F.struct("b0", "b1", "ib")
    pairs = (
        a.join(b, ["s", "w"])
        .filter(
            lt
            & (F.col("a0") <= F.col("b1"))
            & (F.col("b0") <= F.col("a1"))
        )
        .select("s", "a0", "a1", "ia", "b0", "b1", "ib")
        .distinct()  # a pair sharing 2+ week buckets matches once
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_overlap_pairs"))
    )

    # sweep line: +1 at d0, -1 the day after d1; deltas pre-aggregated
    # per (s, date) so same-day events cannot reorder the running sum
    deltas = (
        iv.select("s", F.col("d0").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            iv.select(
                "s", F.date_add("d1", 1).alias("d"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("s", "d")
        .agg(F.sum("delta").alias("delta"))
    )
    wsweep = (
        Window.partitionBy("s")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = (
        deltas.withColumn("running", F.sum("delta").over(wsweep))
        .groupBy("s")
        .agg(F.max("running").cast("long").alias("peak_concurrent"))
    )

    return (
        iv.select("s")
        .distinct()
        .join(pairs, "s", "left")
        .join(peak, "s", "left")
        .select(
            F.col("s").alias("supp_key"),
            F.coalesce("n_overlap_pairs", F.lit(0)).cast("long")
            .alias("n_overlap_pairs"),
            F.coalesce("peak_concurrent", F.lit(0)).cast("long")
            .alias("peak_concurrent"),
        )
    )


SUPPLIER_SHIPMENT_OVERLAP_SQL = """
WITH iv AS (
  SELECT DISTINCT l_suppkey AS s,
         l_orderkey * 10 + l_linenumber AS iid,
         CAST(l_shipdate AS DATE) AS d0,
         CAST(l_shipdate AS DATE)
           + INTERVAL ((CAST(l_quantity AS INT) % 7) + 1) DAY AS d1
  FROM lineitem
),
pairs AS (
  -- the DIRECT quadratic predicate join the bucketized Spark plan
  -- must reproduce exactly; pair identity is the full interval tuple
  -- ((orderkey, linenumber) is not unique in the fixture)
  SELECT a.s, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs
  FROM iv a JOIN iv b
    ON a.s = b.s
   AND (a.d0, a.d1, a.iid) < (b.d0, b.d1, b.iid)
   AND a.d0 <= b.d1 AND b.d0 <= a.d1
  GROUP BY 1
),
deltas AS (
  SELECT s, d, CAST(SUM(delta) AS BIGINT) AS delta
  FROM (
    SELECT s, d0 AS d, 1 AS delta FROM iv
    UNION ALL
    SELECT s, CAST(d1 AS DATE) + INTERVAL 1 DAY, -1 FROM iv
  )
  GROUP BY 1, 2
),
peak AS (
  SELECT s, CAST(MAX(running) AS BIGINT) AS peak_concurrent
  FROM (
    SELECT s, SUM(delta) OVER (
      PARTITION BY s ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS running
    FROM deltas
  )
  GROUP BY 1
)
SELECT sup.s AS supp_key,
       CAST(COALESCE(p.n_overlap_pairs, 0) AS BIGINT) AS n_overlap_pairs,
       CAST(COALESCE(pk.peak_concurrent, 0) AS BIGINT) AS peak_concurrent
FROM (SELECT DISTINCT s FROM iv) sup
LEFT JOIN pairs p ON sup.s = p.s
LEFT JOIN peak pk ON sup.s = pk.s
"""
