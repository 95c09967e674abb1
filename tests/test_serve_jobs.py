"""Remaining serve endpoints (ledger/snapshots/positions) + operational
ledger jobs (snapshot scheduler, scoped rebuild)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.ledger.jobs import (
    rebuild_wallet_ledgers,
    select_top_wallets,
    snapshot_top_wallets,
)
from neomarket_clickhouse_indexer_spark.queries.events import _domain_events
from neomarket_clickhouse_indexer_spark.serve import ServeContext

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ctx(spark):
    return ServeContext(spark, SF_SMOKE)


def test_ledger_endpoint_ordered_and_clamped(ctx):
    out = ctx.ledger(user_id=12, limit=50_000)  # clamp to 10000
    assert out["wallet"] == "0xw12" and out["ledger"]
    times = [e["time"] for e in out["ledger"]]
    assert times == sorted(times)
    assert len(out["ledger"]) <= 10000


def test_snapshots_endpoint_monotone_time(ctx):
    out = ctx.snapshots(user_id=12, interval_s=86400)
    times = [s["time"] for s in out["snapshots"]]
    assert times == sorted(times)
    if times:
        assert all("realized_pnl" in s and "cashflow" in s for s in out["snapshots"])


def test_positions_endpoint_positive_only(ctx):
    out = ctx.positions(user_id=12)
    assert all(p["qty"] > 0 for p in out["positions"])


def test_select_top_wallets_deterministic(spark):
    events = _domain_events(spark, SF_SMOKE)
    a = [r["wallet"] for r in select_top_wallets(events, 5).collect()]
    b = [r["wallet"] for r in select_top_wallets(events, 5).collect()]
    assert a == b and len(a) == 5


def test_snapshot_scheduler_round_idempotent(spark, tmp_path):
    events = _domain_events(spark, SF_SMOKE)
    out = str(tmp_path / "snaps")
    n1 = snapshot_top_wallets(events, out, n=5, interval_s=86400)
    first = spark.read.parquet(out).count()
    n2 = snapshot_top_wallets(events, out, n=5, interval_s=86400)
    second = spark.read.parquet(out).count()
    assert n1 == n2 == 5
    assert first == second  # partition replace, not append


def test_scoped_ledger_rebuild(spark, tmp_path):
    events = _domain_events(spark, SF_SMOKE)
    out = str(tmp_path / "ledger")
    rebuild_wallet_ledgers(events, out, wallets=["0xw12", "0xw13"])
    df = spark.read.parquet(out)
    assert set(r["wallet"] for r in df.select("wallet").distinct().collect()) == {
        "0xw12", "0xw13"
    }
    # scoped re-run of one wallet leaves the other intact
    rebuild_wallet_ledgers(events, out, wallets=["0xw12"])
    assert spark.read.parquet(out).select("wallet").distinct().count() == 2


def test_candles_freshness_fallback(spark):
    """A stale pre-agg tier must be bypassed in favor of the raw scan."""
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.operators.candles import ohlcv
    from neomarket_clickhouse_indexer_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    cutoff = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    stale_state = ohlcv(
        ev.filter(F.col("ts") < cutoff - dt.timedelta(days=7)),
        key="event_type", ts="ts", price="value", ord_col="event_id",
    )
    fresh_state = ohlcv(ev, key="event_type", ts="ts", price="value",
                        ord_col="event_id")

    stale_ctx = ServeContext(spark, SF_SMOKE, candle_state=stale_state)
    fresh_ctx = ServeContext(spark, SF_SMOKE, candle_state=fresh_state)
    raw_ctx = ServeContext(spark, SF_SMOKE)

    raw = raw_ctx.candles("purchase", "5m")["candles"]
    assert stale_ctx.candles("purchase", "5m")["candles"] == raw, (
        "stale tier must fall back to raw"
    )
    assert fresh_ctx.candles("purchase", "5m")["candles"] == raw

    with pytest.raises(ValueError, match="interval"):
        raw_ctx.candles("purchase", "17m")
