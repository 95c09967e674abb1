"""Property-based tests for the FIFO engines (pure-Python core — fast, no
Spark): conservation laws that must hold for ANY event stream (SURVEY §5.4).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neomarket_clickhouse_indexer_spark.ledger.engine import LedgerEngine
from neomarket_clickhouse_indexer_spark.operators.fifo import _allocate_group

T0 = dt.datetime(2024, 1, 1)

event_strategy = st.lists(
    st.tuples(
        st.booleans(),                                  # is_buy
        st.integers(min_value=1, max_value=7),          # qty
        st.floats(min_value=0.01, max_value=10.0,
                  allow_nan=False, allow_infinity=False),  # price
    ),
    min_size=0,
    max_size=40,
)


@given(event_strategy)
@settings(max_examples=200, deadline=None)
def test_alloc_fifo_conservation(events):
    pdf = pd.DataFrame(
        {
            "key": [1] * len(events),
            "ts": [T0 + dt.timedelta(minutes=i) for i in range(len(events))],
            "ord": range(len(events)),
            "side": [1 if b else -1 for b, _, _ in events],
            "qty": [q for _, q, _ in events],
            "price": [p for _, _, p in events],
        }
    )
    if pdf.empty:
        return
    out = _allocate_group(pdf).iloc[0]
    total_buys = sum(q for b, q, _ in events if b)
    total_sells = sum(q for b, q, _ in events if not b)
    # allocation-FIFO matches the k-th sold unit to the k-th bought unit
    assert out["matched_qty"] == min(total_buys, total_sells)
    assert out["open_qty"] == total_buys - out["matched_qty"]
    assert out["buy_qty"] == total_buys and out["sell_qty"] == total_sells
    # realized = matched proceeds − matched cost (recompute independently
    # via cumulative-unit expansion — the oracle algorithm in miniature)
    buy_units, sell_units = [], []
    for b, q, p in events:
        (buy_units if b else sell_units).extend([p] * q)
    matched = min(len(buy_units), len(sell_units))
    expected = sum(sell_units[i] - buy_units[i] for i in range(matched))
    assert out["realized_pnl"] == pytest.approx(round(expected, 4), abs=1e-3)
    # open cost = cost of the unmatched buy tail
    expected_open = sum(buy_units[matched:])
    assert out["open_cost"] == pytest.approx(round(expected_open, 4), abs=1e-3)


@given(event_strategy)
@settings(max_examples=100, deadline=None)
def test_ledger_engine_trade_conservation(events):
    """Domain engine under trades only: cashflow + realized + open cost
    must reconcile: realized == cashflow + open_cost + oversold_income
    where inventory-covered trades conserve value."""
    eng = LedgerEngine("w")
    evs = []
    for i, (is_buy, qty, price) in enumerate(events):
        evs.append(
            dict(ts=T0 + dt.timedelta(minutes=i), block_number=i, log_index=0,
                 type="trade", token_id="t", condition_id="c",
                 qty=float(qty), usdc=qty * price, fee=0.0,
                 is_buy=is_buy, is_in=False,
                 outcome_token_ids=[], payout_ratios=[])
        )
    eng.replay(evs)
    open_cost = sum(
        eng.book.qty(t) * eng.book.avg_cost(t) for t in eng.book.open_tokens()
    )
    # value conservation: Σ realized = Σ cash received − Σ cash paid + open cost
    assert eng.realized == pytest.approx(eng.cashflow + open_cost, abs=1e-6)
    # inventory never negative by construction
    for t in eng.book.open_tokens():
        assert eng.book.qty(t) > 0
