"""Whole-pipeline domain integration: Python-encoded raw EVM logs →
JVM ABI decoders → prep normalization → distributed FIFO ledger →
balances reconciliation (O5) and invariants (O7).

This is the reference's full dataflow (main.ts ingest → tables →
ledger-engine → reconcile-balances) exercised as one Spark pipeline.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.agg import user_balances
from neomarket_clickhouse_indexer_spark.ledger.build import build_wallet_ledger
from neomarket_clickhouse_indexer_spark.ledger.prep import (
    normalize_trades,
    normalize_transfers,
)
from neomarket_clickhouse_indexer_spark.sources.ingest import (
    RAW_LOG_SCHEMA,
    SIG_ORDER_FILLED,
    SIG_TRANSFER_SINGLE,
    decode_order_filled,
    decode_transfer_single,
)
from neomarket_clickhouse_indexer_spark.verify.invariants import (
    check_non_negative_inventory,
    reconcile_balances,
)

T0 = dt.datetime(2024, 1, 1)
ALICE, BOB, EXCHANGE = "0x" + "aa" * 20, "0x" + "bb" * 20, "0x" + "ee" * 20
TOKEN = 0xBEEF


def w(v: int) -> str:
    return f"{v:064x}"


def t_addr(a: str) -> str:
    return "0x" + "0" * 24 + a.removeprefix("0x")


def _log(ts_min, log_index, tx, topics, data):
    return (100 + ts_min, T0 + dt.timedelta(minutes=ts_min), log_index, tx,
            EXCHANGE, topics, "0x" + "".join(data))


@pytest.fixture(scope="module")
def raw_logs(spark):
    oh = "0x" + w(0x77)
    rows = [
        # t0: Alice buys 10 tokens for 4 USDC from Bob (maker=Alice pays USDC)
        _log(0, 0, "0xt1",
             [SIG_ORDER_FILLED, oh, t_addr(ALICE), t_addr(BOB)],
             [w(0), w(TOKEN), w(4_000_000), w(10_000_000), w(0)]),
        # the exchange-driven transfer explaining the same tx (skip set!)
        _log(0, 1, "0xt1",
             [SIG_TRANSFER_SINGLE, t_addr(EXCHANGE), t_addr(BOB), t_addr(ALICE)],
             [w(TOKEN), w(10_000_000)]),
        # t1: Alice sells 6 tokens for 4.2 USDC to Bob (maker=Alice sells)
        _log(1, 0, "0xt2",
             [SIG_ORDER_FILLED, oh, t_addr(ALICE), t_addr(BOB)],
             [w(TOKEN), w(0), w(6_000_000), w(4_200_000), w(0)]),
        _log(1, 1, "0xt2",
             [SIG_TRANSFER_SINGLE, t_addr(EXCHANGE), t_addr(ALICE), t_addr(BOB)],
             [w(TOKEN), w(6_000_000)]),
        # t2: Alice gifts 1 token to Bob (plain transfer, separate tx)
        _log(2, 0, "0xt3",
             [SIG_TRANSFER_SINGLE, t_addr(ALICE), t_addr(ALICE), t_addr(BOB)],
             [w(TOKEN), w(1_000_000)]),
        # duplicate of the gift (re-ingest) — must dedup
        _log(2, 0, "0xt3",
             [SIG_TRANSFER_SINGLE, t_addr(ALICE), t_addr(ALICE), t_addr(BOB)],
             [w(TOKEN), w(1_000_000)]),
    ]
    return spark.createDataFrame(rows, RAW_LOG_SCHEMA).cache()


def test_full_pipeline_decode_prep_ledger(spark, raw_logs):
    trades_raw = decode_order_filled(raw_logs)
    transfers_raw = decode_transfer_single(raw_logs)

    # prep: trade perspectives + transfers minus trade-explained txs
    trade_events = normalize_trades(trades_raw)
    trade_txs = trades_raw.select("tx_hash").distinct()
    transfer_events = normalize_transfers(
        transfers_raw, skip_tx_hashes=trade_txs, operator_whitelist=[EXCHANGE]
    )
    events = trade_events.unionByName(transfer_events)
    entries = build_wallet_ledger(events).cache()

    by = {
        (r["wallet"], r["event_type"]): r
        for r in entries.collect()
    }
    # Alice: buy 10 @0.4, sell 6 @0.7 → realized 6·0.3 = 1.8; gift 1 out at cost
    alice_sell = by[(ALICE, "trade_sell")]
    assert alice_sell["realized_pnl"] == pytest.approx(1.8)
    alice_out = by[(ALICE, "transfer_out")]
    assert alice_out["quantity"] == pytest.approx(1.0)
    assert alice_out["cost_basis"] == pytest.approx(0.4)
    assert alice_out["realized_pnl"] == 0.0

    # invariant: Alice's running inventory never goes negative; Bob is
    # CORRECTLY flagged — he sells at t0 with no tracked acquisition
    # (oversell), which is exactly what the checker exists to surface
    # (reference never_negative_inventory, src/api.ts:1593-1636)
    violations = check_non_negative_inventory(entries).collect()
    assert {v["wallet"] for v in violations} == {BOB}

    # Alice ledger open position: 10 − 6 − 1 = 3 tokens
    alice_pos = (
        entries.filter(F.col("wallet") == ALICE)
        .agg(
            F.sum(
                F.when(F.col("event_type").isin("trade_buy", "transfer_in"),
                       F.col("quantity"))
                .when(F.col("event_type").isin("trade_sell", "transfer_out"),
                      -F.col("quantity"))
                .otherwise(F.lit(0.0))
            ).alias("pos")
        )
        .collect()[0]["pos"]
    )
    assert alice_pos == pytest.approx(3.0)


def test_balances_reconcile_with_ledger(spark, raw_logs):
    """O5: chain-truth balances (from ALL transfers incl. exchange ones)
    must reconcile with ledger-derived positions."""
    transfers_raw = decode_transfer_single(raw_logs)
    trades_raw = decode_order_filled(raw_logs)

    chain = user_balances(transfers_raw).select(
        "wallet",
        "token_id",
        (F.col("balance").cast("double") / 1_000_000).alias("qty"),
    )

    trade_events = normalize_trades(trades_raw)
    transfer_events = normalize_transfers(
        transfers_raw,
        skip_tx_hashes=trades_raw.select("tx_hash").distinct(),
        operator_whitelist=[EXCHANGE],
    )
    entries = build_wallet_ledger(trade_events.unionByName(transfer_events))
    ledger_pos = (
        entries.filter(F.col("token_id") != "")
        .groupBy("wallet", "token_id")
        .agg(
            F.sum(
                F.when(F.col("event_type").isin("trade_buy", "transfer_in"),
                       F.col("quantity"))
                .when(F.col("event_type").isin("trade_sell", "transfer_out"),
                      -F.col("quantity"))
                .otherwise(F.lit(0.0))
            ).alias("qty")
        )
    )
    bad = reconcile_balances(ledger_pos, chain, tolerance=1e-6).collect()
    assert bad == [], bad
