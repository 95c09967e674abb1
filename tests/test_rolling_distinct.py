"""Interval-sweep sliding distinct (events_rolling_distinct_users, r7
rewrite): planted cases the coverage-merge must get right — a user whose
active hours straddle the 23h carry (merge), exceed it (split), repeat
within one hour (distinct), and overlap other users (sum of coverage
indicators, not of hours). Expected values are hand-computed from the
definition: n_distinct_24h(type, x) = |{u : u active in [x-23, x]}|."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
    rolling_distinct_frame,
)

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(user, hour, minute=0, etype="view"):
    return (etype, BASE + datetime.timedelta(hours=hour, minutes=minute), user)


def test_interval_merge_split_and_overlap(spark):
    rows = [
        # user 1: hours 0 and 10 (gap 10 <= 23 -> one interval [0, 33]),
        # then hour 40 (gap 30 > 23 -> second interval [40, 63])
        _ev(1, 0),
        _ev(1, 10),
        _ev(1, 40),
        # user 2: two events inside hour 0 (must count once) + hour 40
        _ev(2, 0, 5),
        _ev(2, 0, 55),
        _ev(2, 40),
        # user 3: hour 24 only — covers anchors 24..47
        _ev(3, 24),
        # other type: must not leak across the partition key
        _ev(9, 0, 0, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id bigint"
    )
    got = {
        (r.event_type, r.x): (r.n_distinct_1h, r.n_distinct_24h)
        for r in rolling_distinct_frame(df).collect()
    }
    # anchors = observed (type, hour)s only
    assert set(got) == {
        ("view", 0), ("view", 10), ("view", 24), ("view", 40), ("click", 0)
    }
    # x=0: users 1,2 active in [-23, 0]
    assert got[("view", 0)] == (2, 2)
    # x=10: users 1,2 (hour-0 activity still carries), user 3 not yet
    assert got[("view", 10)] == (1, 2)
    # x=24: user 1 (hour 10 carries to 33), user 2 (hour 0 expired at 23
    # -> NOT covered), user 3 active
    assert got[("view", 24)] == (1, 2)
    # x=40: users 1,2 re-active, user 3's hour 24 carries to 47
    assert got[("view", 40)] == (2, 3)
    assert got[("click", 0)] == (1, 1)


def test_sweep_matches_bruteforce_on_fixture(spark):
    """Cross-check the sweep against a literal per-anchor recount over the
    sf0.001 fixture (the oracle's algorithm, in Spark)."""
    from neomarket_clickhouse_indexer_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", F.col("ts").alias("ts"), "user_id"
    )
    got = {
        (r.event_type, r.x): r.n_distinct_24h
        for r in rolling_distinct_frame(ev).collect()
    }
    hour_x = (
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
        + F.hour("ts")
    ).cast("long")
    uh = ev.select("event_type", hour_x.alias("x"), "user_id").distinct()
    anchors = uh.select("event_type", "x").distinct()
    brute = (
        anchors.alias("a")
        .join(
            uh.alias("e"),
            (F.col("a.event_type") == F.col("e.event_type"))
            & (F.col("e.x") >= F.col("a.x") - 23)
            & (F.col("e.x") <= F.col("a.x")),
        )
        .groupBy(F.col("a.event_type").alias("t"), F.col("a.x").alias("x"))
        .agg(F.countDistinct("e.user_id").alias("n"))
    )
    want = {(r.t, r.x): r.n for r in brute.collect()}
    assert got == want
