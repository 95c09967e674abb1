"""r8 planted/property checks: multi-touch credit conservation and the
max-drawdown fold vs a literal Python reference."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
T0 = datetime.datetime(2024, 1, 1)


def test_attribution_conserves_purchase_cents(spark):
    """Every purchase's cents land somewhere: Σ attributed + direct ==
    Σ purchase cents (the DIV-k + remainder discipline is lossless)."""
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        _events_cents,
        events_multitouch_attribution,
    )

    out = events_multitouch_attribution(spark, SF)
    got = out.agg(F.sum("cents")).collect()[0][0]
    want = (
        _events_cents(spark, SF)
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("cents"))
        .collect()[0][0]
    )
    assert got == want
    # and the direct bucket is non-degenerate in both directions
    lags = {r.lag_h for r in out.select("lag_h").distinct().collect()}
    assert -1 in lags and any(h >= 0 for h in lags)


@pytest.mark.parametrize("seed", [11, 47])
def test_max_drawdown_fuzz_vs_literal(spark, seed):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        user_max_drawdown,
    )

    rng = np.random.RandomState(seed)
    rows = []
    for uid in range(6):
        for i in range(rng.randint(5, 60)):
            typ = ["purchase", "view", "click"][rng.randint(0, 3)]
            val = float(rng.randint(1, 5000)) / 100.0
            rows.append(
                (
                    uid * 1000 + i,
                    T0 + datetime.timedelta(minutes=i),
                    uid,
                    typ,
                    val,
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {
            r.user_id: r.asDict() for r in user_max_drawdown(spark, d).collect()
        }
    # literal reference
    import collections

    series = collections.defaultdict(list)
    for eid, ts, uid, typ, val, _ in rows:
        cents = int(np.floor(val * 100 + 0.5))
        series[uid].append((ts, eid, cents if typ == "purchase" else -cents))
    for uid, evs in series.items():
        evs.sort()
        p, peak, mdd, under, ps = 0, None, 0, 0, []
        for _, _, d_ in evs:
            p += d_
            peak = p if peak is None else max(peak, p)
            mdd = max(mdd, peak - p)
            under += 1 if p < peak else 0
            ps.append(p)
        g = got[uid]
        assert g["n_events"] == len(evs)
        assert g["peak_cents"] == max(ps)
        assert g["final_cents"] == ps[-1]
        assert g["max_drawdown_cents"] == mdd
        assert g["underwater_events"] == under
