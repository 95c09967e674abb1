"""Skew mitigation: salted two-phase aggregation.

At 100 TB a handful of hot keys (an exchange wallet, a viral market) can
hold an entire stage hostage: one reducer gets the key's billions of rows.
AQE's skew-join splitting handles joins; for *aggregations* the classic fix
is salting — spread each key over N subkeys, partially aggregate on
(key, salt), then finish on key. Works for any associative aggregate
(sum/count/min/max and the candle partial states).

The salt is derived from a row attribute (hash % N), not random — plans
stay deterministic and re-runnable (Date.now/rand are banned in this
codebase for exactly this reason).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Callable[[], list[Column]],
    final_aggs: Callable[[], list[Column]],
    salt_col: str,
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    ``partial_aggs()`` aggregates raw rows at (keys, salt) grain;
    ``final_aggs()`` merges the partials at (keys) grain. Column names must
    line up (partial output feeds final input).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs())
    return partial.groupBy(*keys).agg(*final_aggs())


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    salt_col: str,
    num_salts: int = 32,
    dec: str = "decimal(30,10)",
) -> DataFrame:
    """Common case: exact-decimal sum + count per key, skew-safe."""
    return salted_agg(
        df,
        keys,
        partial_aggs=lambda: [
            F.sum(F.col(value).cast(dec)).alias("__sum"),
            F.count(F.lit(1)).alias("__n"),
        ],
        final_aggs=lambda: [
            F.sum("__sum").cast("double").alias(f"sum_{value}"),
            F.sum("__n").cast("long").alias("n_rows"),
        ],
        salt_col=salt_col,
        num_salts=num_salts,
    )
