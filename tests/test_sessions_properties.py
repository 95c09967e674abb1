"""Structural invariants of user_sessions (beyond the differential gate):
sessions must PARTITION each user's events — every event in exactly one
session, consecutive events inside a session closer than the gap,
consecutive sessions separated by at least the gap."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from neomarket_clickhouse_indexer_spark.queries.events import (
    SESSION_GAP_MIN,
    user_sessions,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sessions_partition_the_event_stream(spark):
    gap = dt.timedelta(minutes=SESSION_GAP_MIN)
    sess = user_sessions(spark, SF).toPandas()
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts"])
    )

    # per-user: total events and volume-bearing rows must be fully covered
    per_user_events = ev.groupby("user_id").size()
    per_user_sessions = sess.groupby("user_id")["n_events"].sum()
    pd.testing.assert_series_equal(
        per_user_events.sort_index(),
        per_user_sessions.sort_index(),
        check_names=False,
        check_dtype=False,
    )

    for user_id, g in sess.groupby("user_id"):
        g = g.sort_values("session_start").reset_index(drop=True)
        # sessions are ordered and non-overlapping with >= gap between them
        for i in range(1, len(g)):
            assert (
                g.loc[i, "session_start"] - g.loc[i - 1, "last_ts"] >= gap
            ), (user_id, g.loc[i - 1], g.loc[i])
        # session bounds contain their events; intra-session gaps < gap
        user_ev = ev[ev.user_id == user_id].sort_values("ts")
        for _, srow in g.iterrows():
            inside = user_ev[
                (user_ev.ts >= srow.session_start) & (user_ev.ts <= srow.last_ts)
            ]
            assert len(inside) == srow.n_events, (user_id, srow)
            gaps = inside.ts.diff().dropna()
            assert (gaps < gap).all(), (user_id, srow, gaps.max())
