"""Tests for derived-aggregate builders, idempotent sinks, and invariant
harnesses over small domain fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.agg import (
    token_last_price,
    user_balances,
    wallet_leaderboard_stats,
    wallet_token_buys,
    wallet_trades,
)
from neomarket_clickhouse_indexer_spark.sources.sinks import (
    append,
    read,
    replace_partitions,
)
from neomarket_clickhouse_indexer_spark.verify import (
    check_non_negative_inventory,
    reconcile_balances,
)

T0 = dt.datetime(2024, 1, 1)
ZERO = "0x" + "0" * 40

TRADES_SCHEMA = (
    "id string, tx_hash string, log_index int, block_number long, "
    "block_timestamp timestamp, maker string, taker string, "
    "is_maker_buy boolean, is_taker_buy boolean, token_id string, "
    "usdc_amount long, token_amount long, fee long, height long"
)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        # maker buys 10 tok1 @0.5; duplicate id simulates re-ingest
        ("t1-0", "t1", 0, 100, T0, "0xa", "0xb", True, False, "tok1",
         5_000_000, 10_000_000, 0, 100),
        ("t1-0", "t1", 0, 100, T0, "0xa", "0xb", True, False, "tok1",
         5_000_000, 10_000_000, 0, 100),
        # later trade: maker sells 4 tok1 @0.75
        ("t2-0", "t2", 0, 101, T0 + dt.timedelta(hours=1), "0xa", "0xc",
         False, True, "tok1", 3_000_000, 4_000_000, 0, 101),
    ]
    return spark.createDataFrame(rows, TRADES_SCHEMA).cache()


def test_wallet_trades_dedup_and_relabel(trades):
    wt = wallet_trades(trades)
    assert wt.count() == 4  # 2 unique trades × 2 perspectives
    a_buy = wt.filter((F.col("wallet") == "0xa") & F.col("is_buy")).collect()
    assert len(a_buy) == 1 and a_buy[0]["usdc"] == pytest.approx(5.0)


def test_token_last_price_uses_order_key_not_stored_price(trades):
    row = token_last_price(trades).collect()[0]
    assert row["token_id"] == "tok1"
    assert row["last_price"] == pytest.approx(0.75)  # from the later block


def test_wallet_token_buys(trades):
    rows = {r["wallet"]: r for r in wallet_token_buys(trades).collect()}
    assert rows["0xa"]["usdc_spent"] == pytest.approx(5.0)
    assert rows["0xc"]["tokens_bought"] == pytest.approx(4.0)


def test_leaderboard_stats_signed_cashflow(trades):
    stats = {r["wallet"]: r for r in wallet_leaderboard_stats(trades, bucket=None).collect()}
    # 0xa: buy 5.0 (−) then sell 3.0 (+) → net −2.0, volume 8.0
    assert stats["0xa"]["net_cashflow"] == pytest.approx(-2.0)
    assert stats["0xa"]["volume"] == pytest.approx(8.0)
    assert stats["0xa"]["n_trades"] == 2


def test_user_balances_signed_sum(spark):
    transfers = spark.createDataFrame(
        [
            ("x1-0", "x1", 0, 100, T0, "0xop", ZERO, "0xa", "tok1", 10_000_000, 100),
            ("x2-0", "x2", 0, 101, T0, "0xop", "0xa", "0xb", "tok1", 4_000_000, 101),
            ("x2-0", "x2", 0, 101, T0, "0xop", "0xa", "0xb", "tok1", 4_000_000, 101),
        ],
        "id string, tx_hash string, log_index int, block_number long, "
        "block_timestamp timestamp, operator string, from string, to string, "
        "token_id string, value long, height long",
    )
    bal = {r["wallet"]: int(r["balance"]) for r in user_balances(transfers).collect()}
    assert bal["0xa"] == 6_000_000  # mint 10 − out 4 (duplicate id collapsed)
    assert bal["0xb"] == 4_000_000


def test_replace_partitions_idempotent(spark, tmp_path):
    path = str(tmp_path / "rollup")
    df1 = spark.createDataFrame(
        [("w1", "2024-01-01", 1.0), ("w2", "2024-01-01", 2.0)],
        "wallet string, day string, pnl double",
    )
    append(df1, path, partition_by=["day"])
    # rebuild day with corrected values — only that partition replaced
    df2 = spark.createDataFrame(
        [("w1", "2024-01-01", 5.0)], "wallet string, day string, pnl double"
    )
    replace_partitions(df2, path, partition_by=["day"])
    replace_partitions(df2, path, partition_by=["day"])  # idempotent
    got = read(spark, path).collect()
    assert len(got) == 1 and got[0]["pnl"] == 5.0

    # other partitions survive
    df3 = spark.createDataFrame(
        [("w9", "2024-01-02", 9.0)], "wallet string, day string, pnl double"
    )
    replace_partitions(df3, path, partition_by=["day"])
    assert read(spark, path).count() == 2


def test_invariant_checker_flags_oversell(spark):
    entries = spark.createDataFrame(
        [
            ("w1", "trade_buy", T0, 100, 0, "tok1", "c", 5.0, -2.5, 0.5, 2.5, 0.0),
            ("w1", "trade_sell", T0, 101, 0, "tok1", "c", 8.0, 4.0, 0.5, 2.5, 1.5),
            ("w2", "trade_buy", T0, 100, 0, "tok1", "c", 5.0, -2.5, 0.5, 2.5, 0.0),
        ],
        "wallet string, event_type string, block_timestamp timestamp, "
        "block_number long, log_index long, token_id string, condition_id string, "
        "quantity double, usdc_delta double, unit_price double, cost_basis double, "
        "realized_pnl double",
    )
    bad = check_non_negative_inventory(entries).collect()
    assert len(bad) == 1 and bad[0]["wallet"] == "w1"
    assert bad[0]["min_running_qty"] == pytest.approx(-3.0)


def test_reconcile_balances_tolerance(spark):
    ledger = spark.createDataFrame(
        [("w1", "tok1", 5.0), ("w2", "tok1", 1.0)], "wallet string, token_id string, qty double"
    )
    external = spark.createDataFrame(
        [("w1", "tok1", 5.00005), ("w3", "tok1", 2.0)], "wallet string, token_id string, qty double"
    )
    bad = {(r["wallet"], r["token_id"]) for r in reconcile_balances(ledger, external).collect()}
    assert bad == {("w2", "tok1"), ("w3", "tok1")}  # w1 within 1e-4
