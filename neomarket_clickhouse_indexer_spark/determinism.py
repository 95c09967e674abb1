"""Cross-engine determinism helpers.

The correctness gate hash-compares our Spark results against a DuckDB oracle.
Floating-point *aggregation* is order-dependent (IEEE addition is not
associative), and Spark sums partition-wise in nondeterministic order. To make
results bit-stable across engines we:

- sum doubles through an exact DECIMAL(30,10) accumulator (``dsum`` /
  ``SQL_DSUM``): per-row double arithmetic is deterministic IEEE (identical in
  both engines), the decimal sum is exact and order-free, and the final
  decimal→double cast is deterministic;
- round ratio/similarity outputs to a fixed scale (both engines round
  half-even for doubles at these scales; inputs are far from ties);
- give every ordering a unique tiebreak key (event_id, doc_id, …) so top-k /
  window ranks are deterministic;
- cast Spark's int-typed computed columns to BIGINT to match DuckDB's wider
  aggregate types.

This mirrors the reference's determinism discipline (deterministic
``tuple(block_number, log_index)`` order keys for argMin/argMax — reference
clickhouse/init/001_create_tables.sql:406-425).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"

# The exact sum is ROUNDED IN INTEGER/DECIMAL SPACE (both engines round
# half-away-from-zero there, exactly — no binary-repr ambiguity), then
# cast to double. Rounding after the double cast is subtly wrong: an exact
# decimal tie like -75.51265 casts to the binary -75.5126499…, which Spark's
# shortest-repr F.round sends up while DuckDB's binary ROUND sends down
# (caught at sf0.01 by domain_ledger_summary). The final exact-int/10^4
# division is a single correctly-rounded operation in both engines for
# |value| < 2^53/10^4 ≈ 9e11 — far above any sum here.
DSUM_ROUND = 4

# dsum quantization grain: 1e-10 units (matches the DECIMAL(30,10) scale the
# slow path uses).
_FSCALE = 10
_R1 = 1_000_000  # low-field radix (1e6)
_R2 = 1_000_000_000_000  # mid/high split radix (1e12)


def dsum(col: Column, alias: str, scale: int = DSUM_ROUND) -> Column:
    """Order-independent exact sum of a double expression, as double.

    Fast path: quantize each value to 1e-10 units with ``floor(x * 1e10)`` —
    pure IEEE double ops, bit-identical in Spark and DuckDB — then split the
    scaled integer into three long fields at 1e6/1e12 radix so every
    aggregation buffer stays long-backed. (A DECIMAL(30,10) sum's buffer has
    precision > 18, is BigDecimal-backed in Tungsten rows, and benches ~6×
    slower than a long sum; the split reaches whole-stage-codegen long adds.)
    The three exact long sums are recombined in decimal space per GROUP (not
    per row), rounded half-away-from-zero at ``scale``, and cast to double.

    Exactness bounds (documented, asserted nowhere — far above our data):
    |x| < 9.2e8 per value, ≤ ~9e11 rows per group. The per-field extractions
    use only trunc-``%`` (sign of dividend in both engines) and exact
    divisions of multiples, so every intermediate is engine-independent.
    """
    q = F.floor(col * F.lit(1e10)).cast("long")
    lo = q % F.lit(_R1)
    r12 = q % F.lit(_R2)
    mid = ((r12 - lo) / F.lit(_R1)).cast("long")
    hi = ((q - r12) / F.lit(_R2)).cast("long")
    t = (
        F.sum(hi).cast("decimal(38,0)") * F.lit(_R2)
        + F.sum(mid).cast("decimal(38,0)") * F.lit(_R1)
        + F.sum(lo).cast("decimal(38,0)")
    )
    div = 10 ** (_FSCALE - scale)
    if div == 1:
        return (t.cast("double") / F.lit(float(10**_FSCALE))).alias(alias)
    r = t % F.lit(div)
    base = (t - r) / F.lit(div)
    adj = (
        F.when(r >= F.lit(div // 2), F.lit(1))
        .when(r <= F.lit(-(div // 2)), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return ((base + adj).cast("double") / F.lit(float(10**scale))).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = DSUM_ROUND) -> str:
    """DuckDB mirror of :func:`dsum`.

    DuckDB sums BIGINT into HUGEINT (int128) — already exact, so no field
    split is needed; only the quantization (``FLOOR(x * 1e10)``) and the
    half-away rounding in integer space must match Spark's op-for-op.
    """
    q = f"CAST(FLOOR(({expr}) * 1e10) AS BIGINT)"
    t = f"SUM({q})"
    div = 10 ** (_FSCALE - scale)
    if div == 1:
        return f"(CAST({t} AS DOUBLE) / 1e{_FSCALE}) AS {alias}"
    r = f"({t} % {div})"
    return (
        f"(CAST(({t} - {r}) // {div} + "
        f"(CASE WHEN {r} >= {div // 2} THEN 1 "
        f"WHEN {r} <= -{div // 2} THEN -1 ELSE 0 END) "
        f"AS DOUBLE) / 1e{scale}) AS {alias}"
    )


def dsum_dec(col: Column, alias: str, scale: int = DSUM_ROUND) -> Column:
    """Slow-path exact sum through a DECIMAL(30,10) accumulator.

    Kept for call sites whose oracle pairs with inline
    ``SUM(CAST(… AS DECIMAL(30,10)))`` text (fifo interval SQL, window
    running sums) — the quantization grain differs from :func:`dsum`'s
    floor-based one (decimal cast rounds the shortest-decimal repr), so the
    two are NOT interchangeable on one side of a differential pair.
    """
    return F.round(F.sum(col.cast(DEC)), scale).cast("double").alias(alias)


def sql_dsum_dec(expr: str, alias: str, scale: int = DSUM_ROUND) -> str:
    """DuckDB mirror of :func:`dsum_dec`."""
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(30,10))), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )


def ranked_topk(df, order, k: int, rank_alias: str = "rank",
                rank_offset: int = 0):
    """Scale-safe deterministic top-k (T1/W4) with dense 1-based ranks.

    ``orderBy().offset().limit()`` plans as ONE TakeOrderedAndProject —
    each task keeps its local top-(offset+k) and the driver merges — so no
    stage ever moves the full input to a single partition. The rank window
    then runs over the ≤k-row result, partitioned by a constant-valued but
    non-foldable expression (``pmod(xxhash64(col), 1)`` ≡ 0): a bare
    ``lit(0)`` is constant-folded out of the spec, reviving WindowExec's
    empty-partition path (and its warning) even though the input is bounded.

    Replaces the global `row_number() ... WHERE rank <= k` shape, which
    funnels every row through one partition (round-1 verdict: correct at
    sf0.1, a scale-killer at 100×). ``order`` must reach a unique key for a
    total order (CLAUDE.md tiebreak rule).
    """
    from pyspark.sql import Window

    limited = df.orderBy(*order)
    limited = limited.offset(rank_offset) if rank_offset else limited
    limited = limited.limit(k)
    const0 = F.pmod(F.xxhash64(F.col(df.columns[0])), F.lit(1))
    w = Window.partitionBy(const0).orderBy(*order)
    return limited.withColumn(
        rank_alias, (F.row_number().over(w) + F.lit(rank_offset)).cast("long")
    )


def lsum(col: Column, alias: str) -> Column:
    """Exact integer sum, as bigint (DuckDB SUM(int) is HUGEINT → cast)."""
    return F.sum(col).cast("long").alias(alias)


def sql_lsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT) AS {alias}"


# DuckDB reads the events table's nanosecond timestamps natively; Spark (with
# spark.sql.legacy.parquet.nanosAsLong) reads them as long ns and we convert
# to microsecond timestamps. The oracle must see the same µs truncation:
EVENTS_SQL = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events)"
)
