"""Salted aggregation equivalence + adapter prep normalization."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.ledger.prep import (
    normalize_adapter_conversions,
    normalize_adapter_simple,
)
from neomarket_clickhouse_indexer_spark.operators.skew import salted_sum_count
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

from .conftest import SF_SMOKE

T0 = dt.datetime(2024, 1, 1)


def test_salted_sum_equals_direct(spark):
    """Salting must be invisible in the result — exact decimal partials
    merge associatively."""
    ev = load_table(spark, SF_SMOKE, "events")
    direct = (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double").alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("event_type")
        .collect()
    )
    salted = (
        salted_sum_count(ev, ["event_type"], "value", salt_col="event_id", num_salts=16)
        .orderBy("event_type")
        .collect()
    )
    assert [(r["event_type"], r["sum_value"], r["n_rows"]) for r in direct] == [
        (r["event_type"], r["sum_value"], r["n_rows"]) for r in salted
    ]


def test_adapter_simple_normalization(spark):
    splits = spark.createDataFrame(
        [("a1-0", "a1", 0, 100, T0, "0xw", "c1", 5_000_000, 100)],
        "id string, tx_hash string, log_index int, block_number long, "
        "block_timestamp timestamp, stakeholder string, condition_id string, "
        "amount long, height long",
    )
    meta = spark.createDataFrame(
        [("c1", ["yes1", "no1"], T0)],
        "condition_id string, token_ids array<string>, updated_at timestamp",
    )
    out = normalize_adapter_simple(splits, meta, "adapter_split").collect()
    assert len(out) == 1
    r = out[0]
    assert r["type"] == "adapter_split" and r["usdc"] == pytest.approx(5.0)
    assert r["outcome_token_ids"] == ["yes1", "no1"]


def test_adapter_conversion_normalization_feeds_engine(spark):
    conversions = spark.createDataFrame(
        [("x1-0", "x1", 0, 100, T0, "0xw", "m1", 1, 10_000_000, 100)],
        "id string, tx_hash string, log_index int, block_number long, "
        "block_timestamp timestamp, stakeholder string, market_id string, "
        "index_set long, amount long, height long",
    )
    legs = spark.createDataFrame(
        [("m1", 1, ["noA"], ["yesB", "yesC"])],
        "market_id string, index_set long, burn_token_ids array<string>, "
        "mint_token_ids array<string>",
    )
    rows = normalize_adapter_conversions(conversions, legs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["type"] == "adapter_conversion"
    assert r["qty"] == pytest.approx(10.0)
    assert r["outcome_token_ids"] == ["noA"]
    assert r["mint_token_ids"] == ["yesB", "yesC"]

    # and the engine consumes it end-to-end
    from neomarket_clickhouse_indexer_spark.ledger.engine import LedgerEngine

    eng = LedgerEngine("0xw")
    eng.replay([
        dict(ts=T0, block_number=99, log_index=0, type="trade", token_id="noA",
             condition_id="m1", qty=10.0, usdc=3.0, fee=0.0, is_buy=True,
             is_in=False, outcome_token_ids=[], payout_ratios=[]),
        dict(ts=r["ts"], block_number=r["block_number"], log_index=r["log_index"],
             type=r["type"], token_id=r["token_id"], condition_id=r["condition_id"],
             qty=r["qty"], usdc=r["usdc"], fee=r["fee"], is_buy=r["is_buy"],
             is_in=r["is_in"], outcome_token_ids=list(r["outcome_token_ids"]),
             payout_ratios=[], mint_token_ids=list(r["mint_token_ids"])),
    ])
    assert eng.book.qty("yesB") == pytest.approx(10.0)
    assert eng.book.avg_cost("yesB") == pytest.approx(0.15)  # 3.0 / (2 legs × 10)
