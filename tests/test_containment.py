"""Containment verify stage: planted subset-dup coverage.

The driver gate (docs_containment_pairs) runs the verify math over real
LSH candidates, but the fixture corpus's near-dups are SYMMETRIC — every
high-containment pair is also high-Jaccard, so the subset_dup flag's
TRUE path never fires there (and symmetric MinHash LSH under-recalls
true containment candidates by design, per the gate docstring). This
test feeds the factored verify stage a planted short-doc-inside-long
pair and pins both flag branches plus the exact ppm arithmetic."""

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.documents import (
    CONTAIN_SUBSET_PPM,
    containment_verify_frame,
)


def _sh(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, sh: array<string>")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a: long, doc_b: long")


def test_planted_subset_dup_flag_true(spark):
    # doc 1 = 4 shingles, all contained in doc 2's 20 → containment(1)=1.0,
    # jaccard = 4/20 = 0.2 < 0.6 → subset_dup TRUE
    long_sh = [f"g{i}" for i in range(20)]
    sh = _sh(spark, [(1, long_sh[:4]), (2, long_sh)])
    out = containment_verify_frame(_pairs(spark, [(1, 2)]), sh).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cont_a_ppm"] == 1_000_000
    assert r["cont_b_ppm"] == 200_000
    assert r["jaccard_ppm"] == 200_000
    assert r["subset_dup"] is True


def test_symmetric_near_dup_flag_false(spark):
    # 9/10 shared shingles both ways → jaccard 9/11 > 0.6 → flag FALSE
    base = [f"g{i}" for i in range(10)]
    sh = _sh(spark, [(1, base[:9] + ["x"]), (2, base[:9] + ["y"])])
    out = containment_verify_frame(_pairs(spark, [(1, 2)]), sh).collect()
    r = out[0]
    assert r["cont_a_ppm"] == 900_000 >= CONTAIN_SUBSET_PPM
    assert r["subset_dup"] is False  # high containment but ALSO high jaccard


def test_low_containment_filtered(spark):
    # 1/10 shared → max containment 100000 < the 0.5 keep threshold
    sh = _sh(
        spark,
        [(1, [f"a{i}" for i in range(9)] + ["s"]),
         (2, [f"b{i}" for i in range(9)] + ["s"])],
    )
    out = containment_verify_frame(_pairs(spark, [(1, 2)]), sh).collect()
    assert out == []
