"""Serving layer — the reference's 14 HTTP GET endpoints re-expressed as
DataFrame pipelines returning JSON-ready envelopes.

Reference router: src/api.ts:1995-2041; per-endpoint handlers cited on each
method. The serving discipline carried over:

- result-size clamps (leaderboard ≤100, activity/trades ≤200, candles
  ≤5000, ledger/snapshots ≤10000 — src/api.ts:1324,876,1143,1784,701,728),
- the pre-aggregated-first / raw-fallback ladder (src/api.ts:1340-1360,
  1421-1429): serve from the derived table when it exists, recompute from
  raw otherwise,
- camelCase + unix-seconds response conventions (README.md:57-67).

The context takes the *generic* event-stream tables (driver testdata) or
domain-normalized frames; endpoints are thin — all heavy lifting lives in
operators/ and ledger/, so a real HTTP front (any WSGI wrapper) is a
30-line adapter.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.candles import finalize, ohlcv, rebucket
from ..queries import events as EQ

INTERVALS = {"1m": 60, "5m": 300, "1h": 3600, "1d": 86400, "1w": 604800}


def _rows(df: DataFrame, limit: int) -> list[dict[str, Any]]:
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


class ServeContext:
    """Bind a SparkSession + sf_dir once; each method is one endpoint."""

    def __init__(self, spark: SparkSession, sf_dir: str,
                 candle_state: DataFrame | None = None,
                 snapshot_state: DataFrame | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        # pre-aggregated candle tier (ladder step 1); None → recompute raw
        self.candle_state = candle_state
        # O2 snapshot tier (wallet_pnl_snapshots analog); None → built
        # lazily ONCE from the domain ledger and cached on the context
        self.snapshot_state = snapshot_state
        self._freshness_checked: bool | None = None

    def _snapshots(self) -> DataFrame:
        if self.snapshot_state is None:
            from ..ledger.build import build_wallet_snapshots
            from ..queries.events import SNAPSHOT_INTERVAL_S, _domain_events

            self.snapshot_state = build_wallet_snapshots(
                _domain_events(self.spark, self.sf_dir, integer_splits=True),
                interval_s=SNAPSHOT_INTERVAL_S,
            ).localCheckpoint(eager=True)
        return self.snapshot_state

    def _candle_state_fresh(self, lag_seconds: int = 3600) -> bool:
        """The tier is fresh if its max bucket is within ``lag_seconds`` of
        the raw data's max event time (checked once per context)."""
        if self._freshness_checked is None:
            from ..sources.tables import load_table

            state_max = self.candle_state.agg(F.max("bucket")).collect()[0][0]
            raw_max = (
                load_table(self.spark, self.sf_dir, "events")
                .agg(F.max("ts"))
                .collect()[0][0]
            )
            self._freshness_checked = (
                state_max is not None
                and raw_max is not None
                and (raw_max - state_max).total_seconds() <= lag_seconds
            )
        return self._freshness_checked

    # /leaderboard (src/api.ts:1322-1473); category= routes to the filtered
    # raw-join plan (queryLeaderboardFromRawFiltered, src/api.ts:597-635)
    def leaderboard(self, sort: str = "volume", limit: int = 100,
                    category: str | None = None) -> dict:
        from ..determinism import ranked_topk

        limit = max(1, min(limit, 100))
        if category is not None:
            df = EQ.category_leaderboard(self.spark, self.sf_dir, category)
            return {"sort": sort, "category": category,
                    "entries": _rows(df, limit)}
        if sort == "volume":
            df = EQ.top_users_by_volume(self.spark, self.sf_dir)
        elif sort == "pnl":
            # TakeOrdered top-k then rank the ≤100-row frame;
            # monotonically_increasing_id is NOT a rank — it encodes the
            # partition id in the high bits (ADVICE r1)
            df = ranked_topk(
                EQ.fifo_user_pnl(self.spark, self.sf_dir),
                [F.desc("realized_pnl"), F.asc("key")],
                limit,
            )
        else:
            raise ValueError(f"unsupported sort {sort!r}")
        return {"sort": sort, "entries": _rows(df, limit)}

    # /market/candles (src/api.ts:1784-1879). The ladder is freshness-aware
    # (reference materialized→raw fallback, src/api.ts:1340-1360,1421-1429):
    # a stale pre-agg tier (max bucket older than the raw data it should
    # cover) silently falls back to the raw scan instead of serving holes.
    def candles(self, key: str, interval: str = "1m", limit: int = 5000) -> dict:
        limit = max(1, min(limit, 5000))
        if interval not in INTERVALS:
            raise ValueError(
                f"interval must be one of {sorted(INTERVALS)}, got {interval!r}"
            )
        seconds = INTERVALS[interval]
        if self.candle_state is not None and self._candle_state_fresh():
            base = self.candle_state
            tier = rebucket(base, seconds) if seconds > 60 else base
        else:
            from ..sources.tables import load_table

            ev = load_table(self.spark, self.sf_dir, "events")
            tier = ohlcv(ev, key="event_type", ts="ts", price="value",
                         ord_col="event_id", bucket_seconds=seconds)
        out = (
            finalize(tier)
            .filter(F.col("key") == key)
            .orderBy("bucket")
            .select(
                F.unix_timestamp("bucket").alias("time"),
                "open", "high", "low", "close", "volume", "trades",
            )
        )
        return {"key": key, "interval": interval, "candles": _rows(out, limit)}

    # /chart (beyond-ref): gap-filled hourly volume series, LTTB-
    # downsampled to max_points when the range is long — the dashboard
    # charting path largestTriangleThreeBuckets exists for. Composes the
    # WITH-FILL spine (events_gap_fill) with the reusable LTTB kernel
    # (queries/timeseries_q.py::lttb_select); filled hours chart as 0.
    def chart_series(self, event_type: str, max_points: int = 200) -> dict:
        from ..queries.timeseries_q import events_gap_fill, lttb_select

        max_points = max(3, min(max_points, 2000))
        filled = (
            events_gap_fill(self.spark, self.sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                "event_type",
                (
                    F.datediff(
                        "bucket", F.lit("2024-01-01").cast("date")
                    ) * 1440
                    + F.hour("bucket") * 60
                ).cast("long").alias("x"),
                F.col("cents").alias("y"),
            )
        )
        pts = (
            lttb_select(filled, max_points)
            .orderBy("pos")
            .select(
                F.col("pos"),
                F.expr(
                    "TIMESTAMP'2024-01-01 00:00:00' + make_interval"
                    "(0, 0, 0, 0, 0, CAST(x_min AS INT), 0)"
                ).alias("bucket"),
                F.col("cents"),
            )
            .select(
                # ISO wall-clock string, NOT epoch seconds: the bucket is
                # rebuilt from NTZ-derived minute offsets, so epoch
                # conversion would shift with the driver session's
                # timezone (CLAUDE.md determinism rule 6); interpret+format
                # happen in the same session tz and cancel
                "pos",
                F.date_format("bucket", "yyyy-MM-dd'T'HH:mm:ss").alias("time"),
                "cents",
            )
        )
        return {
            "key": event_type,
            "maxPoints": max_points,
            "points": _rows(pts, max_points),
        }

    # /user/stats (src/api.ts:1034-1116)
    def user_stats(self, user_id: int) -> dict:
        df = EQ.user_stats(self.spark, self.sf_dir).filter(
            F.col("user_id") == user_id
        )
        rows = _rows(df, 1)
        return rows[0] if rows else {}

    # /activity (src/api.ts:876-918) — keyset-deterministic pagination
    def activity(self, user_id: int, limit: int = 200, offset: int = 0) -> dict:
        from ..sources.tables import load_table

        limit = max(1, min(limit, 200))
        ev = (
            load_table(self.spark, self.sf_dir, "events")
            .filter(F.col("user_id") == user_id)
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .select(
                "event_id",
                F.unix_timestamp("ts").alias("time"),
                "event_type",
                "value",
            )
        )
        page = ev.offset(offset) if offset else ev
        return {"userId": user_id, "events": _rows(page, limit)}

    # /portfolio/history (src/api.ts:993-1009): snapshot-FIRST — the
    # interval marks come from the O2 snapshot tier (wallet_pnl_snapshots
    # analog: argMax(open_positions_value / token_count / realized +
    # unrealized, snapshot_time) per requested bucket), never recomputed
    # from raw events. Mirrors the reference's prebuilt-table read; the
    # tier is injected (snapshot_state) or built once per context.
    def portfolio_history(self, user_id: int, interval: str = "1d") -> dict:
        secs = INTERVALS[interval]
        wallet = f"0xw{user_id}"
        snaps = self._snapshots().filter(F.col("wallet") == wallet)
        bucket = (F.floor(F.col("snapshot_epoch") / secs) * secs).cast("long")
        df = (
            snaps.groupBy(bucket.alias("timestamp"))
            .agg(
                F.max_by("open_positions_value", "snapshot_epoch")
                .alias("totalValue"),
                F.max_by("token_count", "snapshot_epoch").alias("positions"),
                F.max_by(
                    F.col("realized_pnl") + F.col("unrealized_pnl"),
                    "snapshot_epoch",
                ).alias("pnl"),
            )
            .orderBy("timestamp")
        )
        return {
            "userId": user_id,
            "interval": interval,
            "snapshots": _rows(df, 10000),
        }

    # /trades recent window with adaptive widening (T6: retry with a 365d
    # window when the 30d window returns <10 rows, src/api.ts:1188-1192)
    def recent_trades(self, user_id: int, now=None, min_rows: int = 10) -> dict:
        from ..queries.events import FIXED_NOW
        from ..sources.tables import load_table

        now = F.lit(now or FIXED_NOW).cast("timestamp")
        ev = load_table(self.spark, self.sf_dir, "events").filter(
            (F.col("user_id") == user_id) & (F.col("event_type") == "purchase")
        )

        def window_rows(days: int):
            return (
                ev.filter(F.col("ts") >= now - F.expr(f"INTERVAL {days} DAYS"))
                .orderBy(F.desc("ts"), F.desc("event_id"))
                .select("event_id", F.unix_timestamp("ts").alias("time"), "value")
            )

        rows = _rows(window_rows(30), 200)
        widened = False
        if len(rows) < min_rows:
            rows = _rows(window_rows(365), 200)
            widened = True
        return {"userId": user_id, "trades": rows, "windowWidened": widened}

    # /pnl (src/api.ts: ledger-backed; modes in src/calculate-pnl.ts:4-10)
    def pnl(self, user_id: int, mode: str = "total",
            start: str | None = None, end: str | None = None) -> dict:
        """All four reference PnL modes (src/calculate-pnl.ts:4-10; CLI
        default mode 4 = total). Modes 1-2 are realized-only filters;
        modes 3-4 add the open-lot unrealized mark at the period end."""
        from ..ledger.pnl import _canonical_mode
        from ..operators.fifo import fifo_unrealized_modes
        from ..queries.events import FIXED_NOW, _fifo_input

        mode = _canonical_mode(mode)
        start = start or "1970-01-01 00:00:00"
        end = end or FIXED_NOW
        base = _fifo_input(self.spark, self.sf_dir).filter(
            F.col("key") == user_id
        )
        df = fifo_unrealized_modes(base, start, end)
        rows = _rows(df, 1)
        if not rows:
            return {"userId": user_id, "mode": mode, "realizedPnl": 0.0,
                    "unrealizedPnl": 0.0, "totalPnl": 0.0}
        r = rows[0]
        realized = (r["realized_period_only"]
                    if mode in ("period_only", "period_plus_unrealized")
                    else r["realized_with_history"])
        unrealized = {"period_plus_unrealized": r["unrealized_period"],
                      "total": r["unrealized_all"]}.get(mode, 0.0)
        total = {"period_plus_unrealized": r["pnl_period"],
                 "total": r["pnl_total"]}.get(mode, realized)
        return {
            "userId": user_id,
            "mode": mode,
            "realizedPnl": realized,
            "unrealizedPnl": unrealized,
            "totalPnl": total,
            "openQty": r["open_qty"],
        }

    # /leaderboard/explain (src/api.ts:1560-1667): per-wallet ledger entries
    # + the never-negative-inventory invariant verdict (O7)
    def explain_user(self, user_id: int, limit: int = 10000) -> dict:
        from ..queries.events import _domain_events
        from ..ledger.build import build_wallet_ledger
        from ..verify.invariants import check_non_negative_inventory

        wallet = f"0xw{user_id}"
        events = _domain_events(self.spark, self.sf_dir).filter(
            F.col("wallet") == wallet
        )
        entries = build_wallet_ledger(events)
        violations = check_non_negative_inventory(entries).count()
        rows = _rows(
            entries.orderBy("block_timestamp", "block_number", "log_index").select(
                "event_type",
                F.unix_timestamp("block_timestamp").alias("time"),
                "token_id",
                "quantity",
                "usdc_delta",
                "realized_pnl",
            ),
            min(limit, 10000),
        )
        return {
            "wallet": wallet,
            "entries": rows,
            "invariants": {
                "never_negative_inventory": violations == 0,
                "violations": violations,
            },
        }

    # /market/holders (src/api.ts top-5 holders shape): largest open
    # positions per market proxy
    def holders(self, limit: int = 5) -> dict:
        df = (
            EQ.fifo_user_pnl(self.spark, self.sf_dir)
            .filter(F.col("open_qty") > 0)
            .orderBy(F.desc("open_qty"), F.asc("key"))
            .select(
                F.col("key").alias("user_id"), "open_qty", "open_cost"
            )
        )
        return {"holders": _rows(df, max(1, min(limit, 5)))}

    # /market/stats (src/api.ts:1240-1256 shape): 24h window aggregates +
    # deterministic last price per key
    def market_stats(self, key: str) -> dict:
        from ..queries.events import FIXED_NOW
        from ..sources.tables import load_table

        ev = load_table(self.spark, self.sf_dir, "events").filter(
            F.col("event_type") == key
        )
        now = F.lit(FIXED_NOW).cast("timestamp")
        day = ev.filter(F.col("ts") >= now - F.expr("INTERVAL 24 HOURS"))
        agg = day.agg(
            F.count(F.lit(1)).alias("trades24h"),
            F.round(F.sum(F.col("value").cast("decimal(30,10)")), 4).cast("double")
            .alias("volume24h"),
            F.countDistinct("user_id").alias("uniqueUsers24h"),
        ).collect()[0]
        last = ev.agg(F.max_by("value", "event_id").alias("lastPrice")).collect()[0]
        return {
            "key": key,
            "trades24h": agg["trades24h"],
            "volume24h": agg["volume24h"] or 0.0,
            "uniqueUsers24h": agg["uniqueUsers24h"],
            "lastPrice": last["lastPrice"],
        }

    # /discover/markets (src/api.ts:1940-1988): 3-way left join of metadata
    # proxy × last price × windowed volume, sorted by volume
    def discover(self, limit: int = 20) -> dict:
        from ..sources.tables import load_table

        ev = load_table(self.spark, self.sf_dir, "events")
        vol = ev.groupBy("event_type").agg(
            F.round(F.sum(F.col("value").cast("decimal(30,10)")), 4).cast("double")
            .alias("volume"),
            F.count(F.lit(1)).alias("events"),
        )
        last = ev.groupBy("event_type").agg(
            F.max_by("value", "event_id").alias("lastPrice")
        )
        users = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("uniqueUsers")
        )
        out = (
            vol.join(last, "event_type", "left")
            .join(users, "event_type", "left")
            .orderBy(F.desc("volume"), F.asc("event_type"))
        )
        return {"markets": _rows(out, max(1, min(limit, 100)))}

    # /ledger (src/api.ts ledger rows, clamp ≤10000, keyset order)
    def ledger(self, user_id: int, limit: int = 10000) -> dict:
        from ..ledger.build import build_wallet_ledger
        from ..queries.events import _domain_events

        wallet = f"0xw{user_id}"
        entries = build_wallet_ledger(
            _domain_events(self.spark, self.sf_dir).filter(F.col("wallet") == wallet)
        ).orderBy("block_timestamp", "block_number", "log_index")
        rows = _rows(
            entries.select(
                "event_type",
                F.unix_timestamp("block_timestamp").alias("time"),
                "token_id", "quantity", "usdc_delta", "unit_price",
                "cost_basis", "realized_pnl",
            ),
            max(1, min(limit, 10000)),
        )
        return {"wallet": wallet, "ledger": rows}

    # /snapshots (src/api.ts snapshots, clamp ≤10000)
    def snapshots(self, user_id: int, interval_s: int = 86400,
                  limit: int = 10000) -> dict:
        from ..ledger.build import build_wallet_snapshots
        from ..queries.events import _domain_events

        wallet = f"0xw{user_id}"
        snaps = build_wallet_snapshots(
            _domain_events(self.spark, self.sf_dir).filter(F.col("wallet") == wallet),
            interval_s=interval_s,
        ).orderBy("snapshot_epoch")
        rows = _rows(
            snaps.select(
                F.col("snapshot_epoch").cast("long").alias("time"),
                "realized_pnl", "unrealized_pnl", "cashflow", "token_count",
            ),
            max(1, min(limit, 10000)),
        )
        return {"wallet": wallet, "snapshots": rows}

    # /positions (src/api.ts positions from balances + enrichment)
    def positions(self, user_id: int) -> dict:
        from ..ledger.build import build_wallet_ledger
        from ..queries.events import _domain_events

        wallet = f"0xw{user_id}"
        entries = build_wallet_ledger(
            _domain_events(self.spark, self.sf_dir).filter(F.col("wallet") == wallet)
        )
        signed = (
            F.when(F.col("event_type").isin("trade_buy", "transfer_in"),
                   F.col("quantity"))
            .when(F.col("event_type").isin(
                "trade_sell", "transfer_out", "resolution_loss"),
                -F.col("quantity"))
            .otherwise(F.lit(0.0))
        )
        pos = (
            entries.filter(F.col("token_id") != "")
            .groupBy("token_id")
            # exact decimal accumulator (dsum pattern): a bare double sum is
            # partition-order-dependent and can flip the qty>1e-9 filter at
            # the 6th decimal across runs (ADVICE r1)
            .agg(
                F.round(F.sum(signed.cast("decimal(30,10)")), 6)
                .cast("double")
                .alias("qty")
            )
            .filter(F.col("qty") > 1e-9)
            .orderBy(F.desc("qty"), F.asc("token_id"))
        )
        return {"wallet": wallet, "positions": _rows(pos, 1000)}
