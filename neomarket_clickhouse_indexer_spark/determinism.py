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

# The exact decimal sum is converted to double differently by the two engines
# (Spark: correctly-rounded BigDecimal→double; DuckDB: int128→double then a
# double division by 10^scale — off by 1 ulp sometimes). A final ROUND at a
# scale far above ulp noise (1e-7 relative at 1e9 magnitudes) but far below
# the data grain pins both to the same value.
DSUM_ROUND = 4


def dsum(col: Column, alias: str, scale: int = DSUM_ROUND) -> Column:
    """Order-independent exact sum of a double expression, as double."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), scale).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = DSUM_ROUND) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,10))) AS DOUBLE), {scale})"
        f" AS {alias}"
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
