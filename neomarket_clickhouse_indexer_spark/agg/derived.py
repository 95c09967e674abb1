"""Derived aggregate tables — the reference's materialized-view layer as
declarative batch builders.

Reference MVs (SURVEY §1.1): user_balances (001:382-398), candles_1m
(001:403-430 — see operators/candles.py), token_last_price (001:552-568),
token_volume_1h (001:571-589), wallet_token_buys (001:592-622),
wallet_leaderboard_stats_1h/_all (002:6-68), wallet_trades view
(001:352-377).

Each builder is a pure DataFrame function over bronze tables: run it batch
for a full rebuild, or feed it a microbatch and additively MERGE at the
same grain (streaming/incremental.py shows the candle instance; sums/counts
merge by addition, argMax states by max on the carried order key).

All builders shuffle exactly once, on their output grain. Input trade rows
are deduped by id first — dedup is the engine's job, not the reader's
(SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedupe_by_id

USDC_SCALE = 1_000_000


def _usd(col: str):
    return F.col(col).cast("double") / USDC_SCALE


def wallet_trades(trades: DataFrame) -> DataFrame:
    """Union-relabel view: each trade from the maker's and taker's
    perspective (reference wallet_trades view, 001:352-377)."""
    trades = dedupe_by_id(trades)
    common = [
        F.col("block_timestamp"),
        F.col("block_number"),
        F.col("log_index"),
        F.col("token_id"),
        _usd("usdc_amount").alias("usdc"),
        _usd("token_amount").alias("tokens"),
        _usd("fee").alias("fee"),
    ]
    maker = trades.select(
        F.col("maker").alias("wallet"), F.col("is_maker_buy").alias("is_buy"), *common
    )
    taker = trades.select(
        F.col("taker").alias("wallet"), F.col("is_taker_buy").alias("is_buy"), *common
    )
    return maker.unionByName(taker)


def user_balances(transfers: DataFrame) -> DataFrame:
    """SummingMergeTree analog: balance = Σ inbound − Σ outbound per
    (wallet, token), zero address excluded (reference user_balances MV,
    001:389-398). Signed union → one hash agg."""
    ZERO = "0x" + "0" * 40
    t = dedupe_by_id(transfers)
    inbound = t.filter(F.col("to") != ZERO).select(
        F.col("to").alias("wallet"),
        F.col("token_id"),
        F.col("value").cast("decimal(38,0)").alias("delta"),
    )
    outbound = t.filter(F.col("from") != ZERO).select(
        F.col("from").alias("wallet"),
        F.col("token_id"),
        (-F.col("value").cast("decimal(38,0)")).alias("delta"),
    )
    return (
        inbound.unionByName(outbound)
        .groupBy("wallet", "token_id")
        .agg(F.sum("delta").alias("balance"))
    )


def token_last_price(trades: DataFrame) -> DataFrame:
    """AggregatingMergeTree argMax analog: last trade price per token,
    ordered by (block_number, log_index) (reference token_last_price MV,
    001:552-568). Price = usdc/tokens, NOT the buggy stored
    price_per_token (CLICKHOUSE_API_SPEC.md:437)."""
    t = dedupe_by_id(trades).filter(F.col("token_amount") > 0)
    ord_key = F.struct(F.col("block_number"), F.col("log_index"))
    price = _usd("usdc_amount") / _usd("token_amount")
    return t.groupBy("token_id").agg(
        F.max_by(price, ord_key).alias("last_price"),
        F.max(ord_key).alias("last_ord"),
    )


def token_volume_1h(trades: DataFrame) -> DataFrame:
    """Hourly USDC volume + trade count per token (reference
    token_volume_1h MV, 001:571-589)."""
    t = dedupe_by_id(trades)
    return t.groupBy(
        "token_id", F.date_trunc("hour", F.col("block_timestamp")).alias("hour")
    ).agg(
        F.sum(_usd("usdc_amount").cast("decimal(30,10)")).cast("double").alias("volume"),
        F.count(F.lit(1)).alias("trades"),
    )


def wallet_token_buys(trades: DataFrame) -> DataFrame:
    """Σ buy-side USDC and tokens per (wallet, token) — cost-basis feed
    (reference wallet_token_buys maker+taker MVs, 001:592-622)."""
    wt = wallet_trades(trades).filter(F.col("is_buy"))
    return wt.groupBy("wallet", "token_id").agg(
        F.sum(F.col("usdc").cast("decimal(30,10)")).cast("double").alias("usdc_spent"),
        F.sum(F.col("tokens").cast("decimal(30,10)")).cast("double").alias("tokens_bought"),
        F.count(F.lit(1)).alias("n_buys"),
    )


def wallet_leaderboard_stats(trades: DataFrame, bucket: str | None = "hour") -> DataFrame:
    """Leaderboard partial states per wallet (×hour when bucketed):
    volume, net cashflow (sells − buys), trades, distinct tokens
    (reference wallet_leaderboard_stats_1h/_all, 002:6-68). With
    bucket=None this is the _all variant; hourly partials re-aggregate to
    any window (sum/sum/sum/approx-union compose)."""
    wt = wallet_trades(trades)
    signed = F.when(F.col("is_buy"), -F.col("usdc")).otherwise(F.col("usdc"))
    keys = [F.col("wallet")]
    if bucket is not None:
        keys.append(F.date_trunc(bucket, F.col("block_timestamp")).alias("bucket"))
    return wt.groupBy(*keys).agg(
        F.sum(F.col("usdc").cast("decimal(30,10)")).cast("double").alias("volume"),
        F.sum(signed.cast("decimal(30,10)")).cast("double").alias("net_cashflow"),
        F.count(F.lit(1)).alias("n_trades"),
        F.countDistinct("token_id").alias("n_tokens"),
    )
