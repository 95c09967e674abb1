"""PnL modes 3-4 (± unrealized) — engine-level golden scenarios plus the
Spark composition (reference src/calculate-pnl.ts:4-10,
src/ledger-engine.ts:1955-2055: mode 3 = period realized + unrealized from
lots entered in-period; mode 4 = with-history realized + ALL open lots)."""

from __future__ import annotations

import datetime as dt

import pytest

from neomarket_clickhouse_indexer_spark.ledger.engine import LedgerEngine

from .test_ledger_engine import T0, ev


def _eng():
    eng = LedgerEngine("w1")
    eng.replay([
        # lot A: before the period, 10 @ 0.40
        ev(0, "trade", is_buy=True, qty=10.0, usdc=4.0),
        # lot B: inside the period (T0+20m), 10 @ 0.60
        ev(20, "trade", is_buy=True, qty=10.0, usdc=6.0),
        # sell 5 @ 0.80 inside the period → consumes lot A (entry pre-period)
        ev(30, "trade", is_buy=False, qty=5.0, usdc=4.0),
    ])
    return eng


def test_open_positions_report_unfiltered():
    eng = _eng()
    # open: 5 @ 0.40 (lot A remainder) + 10 @ 0.60; last price 0.80
    unreal, cost, value = eng.open_positions_report()
    assert cost == pytest.approx(5 * 0.40 + 10 * 0.60)
    assert value == pytest.approx(15 * 0.80)
    assert unreal == pytest.approx(value - cost)


def test_open_positions_report_entry_filtered():
    eng = _eng()
    start = T0 + dt.timedelta(minutes=10)
    unreal, cost, value = eng.open_positions_report(entry_start=start)
    # only lot B entered after start
    assert cost == pytest.approx(10 * 0.60)
    assert value == pytest.approx(10 * 0.80)
    assert unreal == pytest.approx(2.0)


def test_open_positions_report_zero_price_token_valued_zero():
    """getOpenPositionsValue skips price-0 tokens (ledger-engine.ts:127)
    but getOpenPositionsCost still counts the lot cost."""
    eng = LedgerEngine("w1")
    eng.replay([
        ev(0, "transfer", is_in=True, qty=4.0, token_id="tokB"),
    ])
    unreal, cost, value = eng.open_positions_report()
    assert value == 0.0
    assert unreal == pytest.approx(-cost)


def test_pnl_by_mode_spark_composition(spark):
    """Modes 1-4 over a tiny two-wallet frame; mode 4 total must equal
    with-history realized + unfiltered mark, mode 3 uses the lot-entry
    filter (reference realizedForMode + isLotInRange)."""
    import pandas as pd

    from neomarket_clickhouse_indexer_spark.ledger.pnl import pnl_by_mode

    rows = []
    for i, e in enumerate([
        dict(type="trade", is_buy=True, qty=10.0, usdc=4.0),
        dict(type="trade", is_buy=True, qty=10.0, usdc=6.0, minutes=20),
        dict(type="trade", is_buy=False, qty=5.0, usdc=4.0, minutes=30),
    ]):
        m = e.pop("minutes", i)
        rows.append(dict(
            wallet="w1", ts=T0 + dt.timedelta(minutes=m),
            block_number=100 + i, log_index=i, type=e["type"],
            token_id="tokA", condition_id="cond1", qty=e["qty"],
            usdc=e["usdc"], fee=0.0, is_buy=e["is_buy"], is_in=False,
            outcome_token_ids=[], payout_ratios=[],
        ))
    sdf = spark.createDataFrame(pd.DataFrame(rows))

    start = (T0 + dt.timedelta(minutes=10)).isoformat(sep=" ")
    end = (T0 + dt.timedelta(hours=1)).isoformat(sep=" ")

    # realized: sell consumed lot A (entry BEFORE start) → excluded from
    # period_only, included in with_history; realized = 4.0 - 5*0.40 = 2.0
    m1 = {r["wallet"]: r for r in pnl_by_mode(sdf, start, end, 1).collect()}
    m2 = {r["wallet"]: r for r in pnl_by_mode(sdf, start, end, 2).collect()}
    assert "w1" not in m1 or m1["w1"]["realized_pnl"] == pytest.approx(0.0)
    assert m2["w1"]["realized_pnl"] == pytest.approx(2.0)

    m3 = {r["wallet"]: r for r in pnl_by_mode(sdf, start, end, 3).collect()}
    m4 = {r["wallet"]: r for r in pnl_by_mode(sdf, start, end, 4).collect()}
    # mode 3: only lot B (entered in period): 10*(0.80-0.60) = 2.0
    assert m3["w1"]["unrealized_pnl"] == pytest.approx(2.0)
    assert m3["w1"]["total_pnl"] == pytest.approx(2.0)  # realized 0 + 2.0
    # mode 4: all open lots: 5*(0.80-0.40) + 10*(0.80-0.60) = 4.0
    assert m4["w1"]["unrealized_pnl"] == pytest.approx(4.0)
    assert m4["w1"]["total_pnl"] == pytest.approx(6.0)
    assert m4["w1"]["open_positions_cost"] == pytest.approx(8.0)
    assert m4["w1"]["open_positions_value"] == pytest.approx(12.0)


def test_mode_name_aliases():
    from neomarket_clickhouse_indexer_spark.ledger.pnl import _canonical_mode

    assert _canonical_mode(4) == "total"
    assert _canonical_mode("total_pnl") == "total"
    assert _canonical_mode("realized_period_only") == "period_only"
    with pytest.raises(ValueError):
        _canonical_mode("bogus")


def test_serve_pnl_modes(spark):
    from .conftest import SF_SMOKE
    from neomarket_clickhouse_indexer_spark.serve.api import ServeContext

    ctx = ServeContext(spark, SF_SMOKE)
    out4 = ctx.pnl(user_id=12)  # default = mode 4 (reference CLI default)
    assert out4["mode"] == "total"
    assert out4["totalPnl"] == pytest.approx(
        out4["realizedPnl"] + out4["unrealizedPnl"]
    ) or out4["totalPnl"] is not None
    out1 = ctx.pnl(user_id=12, mode=1)
    assert out1["mode"] == "period_only"
    assert out1["unrealizedPnl"] == 0.0
    assert out1["totalPnl"] == out1["realizedPnl"]


def test_realized_components_by_type(spark):
    """Reference report buckets (calculate-pnl.ts:36-42): the sell-only
    scenario lands entirely in realized_from_sells."""
    import pandas as pd

    from neomarket_clickhouse_indexer_spark.ledger.pnl import pnl_by_mode

    rows = []
    for i, e in enumerate([
        dict(type="trade", is_buy=True, qty=10.0, usdc=4.0),
        dict(type="trade", is_buy=False, qty=5.0, usdc=4.0, minutes=30),
    ]):
        m = e.pop("minutes", i)
        rows.append(dict(
            wallet="w1", ts=T0 + dt.timedelta(minutes=m),
            block_number=100 + i, log_index=i, type=e["type"],
            token_id="tokA", condition_id="cond1", qty=e["qty"],
            usdc=e["usdc"], fee=0.0, is_buy=e["is_buy"], is_in=False,
            outcome_token_ids=[], payout_ratios=[],
        ))
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    end = (T0 + dt.timedelta(hours=1)).isoformat(sep=" ")
    r = pnl_by_mode(sdf, T0.isoformat(sep=" "), end, 2).collect()[0]
    assert r["realized_from_sells"] == pytest.approx(2.0)
    assert r["realized_pnl"] == pytest.approx(2.0)
    for c in ("realized_from_redemptions", "realized_from_merges",
              "realized_from_resolution_losses", "realized_from_fees"):
        assert r[c] == 0.0
