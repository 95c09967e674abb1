"""Property tests for the cross-engine exact-sum discipline
(determinism.dsum / sql_dsum fast path).

The fast path's correctness argument has three legs, each tested here:
1. quantization (floor(x*1e10) → long) is bit-identical in Spark and DuckDB
   over adversarial doubles (negatives, ties, subnormal-ish, large);
2. the 3-field long split + decimal reconstruct equals a direct exact
   big-integer sum of the quantized units (no overflow / sign bugs);
3. Spark dsum output == DuckDB sql_dsum output on random frames, including
   groups whose sums land near rounding boundaries.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.determinism import dsum, sql_dsum

FINITE = st.floats(
    min_value=-9e8, max_value=9e8, allow_nan=False, allow_infinity=False
)


def _py_reference(values: list[float], scale: int = 4) -> float | None:
    """Direct exact reference: floor-quantize each value to 1e-10 units in
    IEEE double, sum in Python's unbounded ints, round half-away at
    ``scale``."""
    vals = [v for v in values if v is not None]
    if not vals:
        return None
    total = sum(int(math.floor(v * 1e10)) for v in vals)
    div = 10 ** (10 - scale)
    # trunc-division/mod toward zero (SQL % semantics), in unbounded ints
    q, rem = divmod(abs(total), div)
    base = q if total >= 0 else -q
    r = rem if total >= 0 else -rem
    adj = 1 if r >= div // 2 else (-1 if r <= -(div // 2) else 0)
    return float(base + adj) / 10**scale


@given(st.lists(FINITE, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_duckdb_matches_python_reference(values):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (1, ?)", [(v,) for v in values])
    got = con.execute(
        f"SELECT {sql_dsum('v', 's')} FROM t GROUP BY g"
    ).fetchone()[0]
    assert got == pytest.approx(_py_reference(values), abs=0.0), values


def test_spark_matches_duckdb_on_adversarial_frame(spark):
    vals = [
        0.1, -0.1, 0.00005, -0.00005, 123456.78915, -123456.78915,
        1e-11, -1e-11, 2.5e-5, -2.5e-5, 899999999.9, -899999999.9,
        1 / 3, -1 / 3, 0.0, 7.000000000049, -7.000000000049,
    ]
    rows = [(i % 3, v) for i, v in enumerate(vals)]
    sdf = spark.createDataFrame(rows, "g int, v double")
    got_spark = {
        r["g"]: r["s"]
        for r in sdf.groupBy("g").agg(dsum(F.col("v"), "s")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_duck = dict(
        con.execute(f"SELECT g, {sql_dsum('v', 's')} FROM t GROUP BY g").fetchall()
    )
    assert got_spark == got_duck


def test_spark_matches_duckdb_randomized(spark):
    # deterministic pseudo-random frame (md5-derived, no `random`):
    # 2000 rows, 7 groups, values spanning signs and magnitudes
    import hashlib

    rows = []
    for i in range(2000):
        h = int(hashlib.md5(f"dsum{i}".encode()).hexdigest(), 16)
        g = h % 7
        mag = 10 ** (h // 7 % 9 - 4)  # 1e-4 .. 1e4
        v = ((h // 63 % 2_000_003) - 1_000_001) / 1_000_001 * mag
        rows.append((g, v))
    sdf = spark.createDataFrame(rows, "g int, v double").repartition(13)
    got_spark = {
        r["g"]: r["s"]
        for r in sdf.groupBy("g").agg(dsum(F.col("v"), "s")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_duck = dict(
        con.execute(f"SELECT g, {sql_dsum('v', 's')} FROM t GROUP BY g").fetchall()
    )
    assert got_spark == got_duck
    # and partition-count independence (order-free exactness)
    got_spark2 = {
        r["g"]: r["s"]
        for r in sdf.repartition(3)
        .groupBy("g")
        .agg(dsum(F.col("v"), "s"))
        .collect()
    }
    assert got_spark == got_spark2
