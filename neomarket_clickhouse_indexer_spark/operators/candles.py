"""OHLCV candles: time-bucketed open/high/low/close/volume aggregation.

The reference's headline feature: a ``candles_1m`` AggregatingMergeTree table
fed by a materialized view, with open/close as
``argMin/argMax(price, tuple(block_number, log_index))`` (reference
clickhouse/init/001_create_tables.sql:403-430) and coarser buckets
re-aggregated at read time from the 1m partials (reference
src/api.ts:1821-1879). That took the candle endpoint from ~6 s to <300 ms
(reference README.md:12).

Spark mapping: ``groupBy(key, minute)`` with ``min_by/max_by(price, ord)``.
open/close compose across re-bucketing because we carry the order key of the
first/last trade in each bucket — exactly ClickHouse's partial-aggregate
state, expressed as plain columns. Volume is kept as an exact DECIMAL so
re-aggregation is order-independent; the serving layer casts to double.

Scale notes: the 1m aggregation is one shuffle on (key, minute) with map-side
partial aggregation; re-bucketing reads the (much smaller) 1m table and
shuffles on (key, coarse bucket). This is the same two-tier strategy that
makes the reference fast, and it's why reads at any grain never rescan raw
trades.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..determinism import DEC


def _bucket(ts: Column, seconds: int) -> Column:
    """Deterministic epoch-floor bucketing (identical in DuckDB:
    to_timestamp(floor(epoch(ts)/N)*N))."""
    return F.timestamp_seconds(
        (F.unix_timestamp(ts) - (F.unix_timestamp(ts) % seconds)).cast("long")
    )


def ohlcv(
    df: DataFrame,
    key: str,
    ts: str,
    price: str,
    ord_col: str,
    bucket_seconds: int = 60,
) -> DataFrame:
    """1-tier OHLCV: per (key, bucket): open/high/low/close/volume/trades,
    carrying first_ord/last_ord so the result is re-bucketable."""
    return (
        df.groupBy(
            F.col(key).alias("key"),
            _bucket(F.col(ts), bucket_seconds).alias("bucket"),
        )
        .agg(
            F.min_by(F.col(price), F.col(ord_col)).alias("open"),
            F.max(F.col(price)).alias("high"),
            F.min(F.col(price)).alias("low"),
            F.max_by(F.col(price), F.col(ord_col)).alias("close"),
            F.sum(F.col(price).cast(DEC)).alias("volume_dec"),
            F.count(F.lit(1)).alias("trades"),
            F.min(F.col(ord_col)).alias("first_ord"),
            F.max(F.col(ord_col)).alias("last_ord"),
        )
    )


def rebucket(candles: DataFrame, bucket_seconds: int) -> DataFrame:
    """Re-aggregate fine-grained candles to a coarser grain without touching
    raw data — merges partial states like ClickHouse ``-Merge`` finalization
    (reference src/api.ts:1850-1879)."""
    return (
        candles.groupBy(
            "key", _bucket(F.col("bucket"), bucket_seconds).alias("bucket")
        )
        .agg(
            F.min_by(F.col("open"), F.col("first_ord")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by(F.col("close"), F.col("last_ord")).alias("close"),
            F.sum("volume_dec").alias("volume_dec"),
            F.sum("trades").cast("long").alias("trades"),
            F.min("first_ord").alias("first_ord"),
            F.max("last_ord").alias("last_ord"),
        )
    )


def finalize(candles: DataFrame) -> DataFrame:
    """Serving projection: drop partial-state columns, cast exact volume to
    double."""
    return candles.select(
        "key",
        "bucket",
        "open",
        "high",
        "low",
        "close",
        F.round(F.col("volume_dec"), 4).cast("double").alias("volume"),
        F.col("trades").cast("long").alias("trades"),
    )
