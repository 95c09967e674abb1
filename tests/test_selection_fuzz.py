"""Seeded fuzz differentials for the r7 selection/sweep operators
against literal Python references: the interval-sweep sliding distinct
vs a per-anchor set recount, rank-k selection vs sorted indexing, and
median/MAD outliers vs the same definition in plain Python."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from pyspark.sql import functions as F

T0 = datetime.datetime(2024, 1, 1)


@pytest.mark.parametrize("seed", [5, 67])
def test_rolling_distinct_fuzz_vs_recount(spark, seed):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        rolling_distinct_frame,
    )

    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(400):
        t = ["view", "click"][rng.randint(0, 2)]
        # hours clustered around multiples of ~30 so gaps straddle the
        # 23h carry both ways (merge AND split cases occur)
        h = int(rng.randint(0, 4) * 30 + rng.randint(0, 12))
        u = int(rng.randint(0, 25))
        rows.append((t, T0 + datetime.timedelta(hours=h, minutes=int(rng.randint(0, 60))), u))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id bigint"
    )
    got = {
        (r.event_type, r.x): (r.n_distinct_1h, r.n_distinct_24h)
        for r in rolling_distinct_frame(df).collect()
    }
    # literal recount per observed (type, hour) anchor
    uh = {
        (t, (ts - T0).days * 24 + (ts - T0).seconds // 3600, u)
        for t, ts, u in rows
    }
    anchors = {(t, x) for t, x, _ in uh}
    want = {}
    for t, x in anchors:
        h1 = {u for tt, xx, u in uh if tt == t and xx == x}
        h24 = {u for tt, xx, u in uh if tt == t and x - 23 <= xx <= x}
        want[(t, x)] = (len(h1), len(h24))
    assert got == want


@pytest.mark.parametrize("seed", [13, 91])
def test_quantile_select_fuzz_vs_sorted(spark, seed, tmp_path):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        QSEL_PCTS,
        events_quantile_select,
    )

    rng = np.random.RandomState(seed)
    rows = []
    vals: dict[str, list[int]] = {"view": [], "click": []}
    for i in range(500):
        t = ["view", "click"][rng.randint(0, 2)]
        # heavy ties + a wide range so bucket boundaries are exercised
        cents = int(rng.choice([3, 3, 700, 700, 700, int(rng.randint(1, 40000))]))
        vals[t].append(cents)
        rows.append(
            (i, T0 + datetime.timedelta(minutes=i), 1, t, cents / 100.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        (r.event_type, r.q_pct): (r.n, r.k, r.value_cents)
        for r in events_quantile_select(spark, str(tmp_path)).collect()
    }
    want = {}
    for t, v in vals.items():
        v = sorted(v)
        n = len(v)
        for q in QSEL_PCTS:
            k = (n - 1) * q // 100 + 1
            want[(t, q)] = (n, k, v[k - 1])
    assert got == want


@pytest.mark.parametrize("seed", [29])
def test_mad_outliers_fuzz_vs_python(spark, seed, tmp_path):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        MAD_K_FACTOR,
        events_value_mad_outliers,
    )

    rng = np.random.RandomState(seed)
    rows, vals = [], []
    for i in range(300):
        cents = int(rng.randint(90, 111)) if rng.rand() < 0.9 else int(
            rng.randint(5000, 9000)
        )  # 10% gross outliers
        vals.append(cents)
        rows.append(
            (i, T0 + datetime.timedelta(minutes=i), 1, "view", cents / 100.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    (row,) = events_value_mad_outliers(spark, str(tmp_path)).collect()
    n = len(vals)
    k = (n - 1) // 2 + 1
    med = sorted(vals)[k - 1]
    mad = sorted(abs(v - med) for v in vals)[k - 1]
    n_out = sum(1 for v in vals if abs(v - med) > MAD_K_FACTOR * mad)
    assert (row.n, row.med_cents, row.mad_cents, row.n_outliers) == (
        n, med, mad, n_out,
    )
    assert row.outlier_ppm == n_out * 1_000_000 // n
    # the planted gross outliers are actually flagged (signal, not just
    # cross-engine agreement)
    assert row.n_outliers >= 10
