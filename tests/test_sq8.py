"""SQ8 scalar-quantization invariants at sf0.001: the gate pins the
exact per-vector state; this file pins the QUANTIZER GUARANTEES — codes
fit in 8 bits and the reconstruction error is bounded by one
quantization step (the property that makes a 4x-smaller serving tier
usable at all)."""

import math

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    embeddings_sq8_audit,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def audit_rows(spark):
    return embeddings_sq8_audit(spark, SF).collect()


def test_shape_and_code_bounds(audit_rows):
    assert len(audit_rows) == 500
    for r in audit_rows:
        assert r["n_dims"] == 64
        # 64 dims x max code 255
        assert 0 <= r["code_sum"] <= 64 * 255


def test_reconstruction_error_within_one_step(spark, audit_rows):
    """|x - rec| <= step + 1 micro-unit per dim, where step is the
    widest per-dim quantization step ceil((hi-lo)/255); +1 absorbs the
    two integer-floor truncations (code and reconstruction)."""
    ex = (
        load_table(spark, SF, "embeddings")
        .select(F.posexplode("embedding").alias("dim", "v"))
        .select(
            "dim",
            F.expr(
                "CAST(FLOOR(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
            ).alias("vu"),
        )
        .groupBy("dim")
        .agg((F.max("vu") - F.min("vu")).alias("range"))
        .collect()
    )
    max_step = max(math.ceil(r["range"] / 255) for r in ex)
    for r in audit_rows:
        assert r["max_err_micro"] <= max_step + 1, (r, max_step)
        assert r["abs_err_micro"] <= 64 * (max_step + 1)
