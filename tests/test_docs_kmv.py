"""KMV sketch mergeability under skew: the pairwise Jaccard stage must
consume per-source bottom-K SKETCHES (≤2K rows per pair), yet produce
bit-identical results to a direct bottom-K over the corpus-scale union
(the pre-r14 implementation). Planted HOT source: one source carries
~50× the distinct hashes of the other, so any sketch-boundary mistake
(wrong K cut, membership flag read from the raw set vs the sketch)
shifts `shared`/`k_used`. Property: bottom-K(A∪B) ⊆ bottomK(A)∪bottomK(B),
and for any h in bottom-K(A∪B), h∈A ⟺ h∈bottomK(A)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.documents import (
    KMV_K,
    _kmv_pair_est,
)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_pair_est_from_sketch_equals_direct_on_hot_source(spark):
    # hot source A: 12_800 distinct hashes (50 x KMV_K); cold source B:
    # 256 hashes, half shared with A's range so the intersection is real.
    a_rows = [("A", _h(f"a{i}")) for i in range(50 * KMV_K)]
    b_rows = [("B", _h(f"a{i}")) for i in range(0, 4 * KMV_K, 2)] + [
        ("B", _h(f"b{i}")) for i in range(128)
    ]
    hashed = spark.createDataFrame(
        a_rows + b_rows, "source string, h long"
    ).distinct()

    wsrc = Window.partitionBy("source").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(wsrc))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    got = _kmv_pair_est(sk, "A", "B").collect()[0]

    # direct (pre-r14) computation over the full two-source hash union
    per_hash = hashed.groupBy("h").agg(
        F.max(F.col("source") == "A").alias("in_a"),
        F.max(F.col("source") == "B").alias("in_b"),
    )
    bottom = (
        per_hash.withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
    )
    want = bottom.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("shared"),
    ).collect()[0]

    assert got["k_used"] == want["k_used"] == KMV_K
    assert got["shared"] == want["shared"]
    assert got["shared"] > 0  # the planted intersection actually lands
    assert (
        got["jaccard_est_ppm"]
        == want["shared"] * 1_000_000 // want["k_used"]
    )


def test_pair_est_small_sets_are_exact(spark):
    # both sources below K: the sketches ARE the sets, estimator exact.
    rows = [("A", _h(f"x{i}")) for i in range(40)] + [
        ("B", _h(f"x{i}")) for i in range(20, 60)
    ]
    hashed = spark.createDataFrame(rows, "source string, h long").distinct()
    wsrc = Window.partitionBy("source").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(wsrc))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    got = _kmv_pair_est(sk, "A", "B").collect()[0]
    assert got["k_used"] == 60  # |A ∪ B|
    assert got["shared"] == 20  # |A ∩ B|
    assert got["jaccard_est_ppm"] == 20 * 1_000_000 // 60
