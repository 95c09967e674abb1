"""Planted-case tests for parts_coorder_triangles (hand-countable K4 +
support prune) and events_hourly_autocov (gap handling at both lags),
driven through tmp-dir parquet so the real loaders run."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _write_li(spark, tmp_path, rows):
    """rows = [(orderkey, partkey)] — minimal lineitem for the graph."""
    df = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


def test_triangles_planted_k4(spark, tmp_path):
    """K4 on parts 1-4 (each edge co-ordered twice to clear the support
    prune) has exactly C(4,3)=4 triangles, 3 per node; part 9 hangs off
    node 1 via a support-2 edge but closes nothing; a support-1 pair
    (8, 9) must be pruned before it can form anything."""
    from neomarket_clickhouse_indexer_spark.queries.graph_q import (
        TRI_MIN_SUPPORT,
        parts_coorder_triangles,
    )

    assert TRI_MIN_SUPPORT == 2
    rows = []
    oid = 0
    # two orders per K4 edge
    for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 9)]:
        for _ in range(2):
            oid += 1
            rows += [(oid, a), (oid, b)]
    oid += 1
    rows += [(oid, 8), (oid, 9)]  # support-1: pruned
    sf = _write_li(spark, tmp_path, rows)
    got = {
        r.part_key: (r.rank, r.tri_cnt)
        for r in parts_coorder_triangles(spark, sf).collect()
    }
    assert got == {
        1: (1, 3), 2: (2, 3), 3: (3, 3), 4: (4, 3)
    }  # node 9 closes no triangle -> absent; 8 pruned entirely


def test_triangles_orientation_handles_hub(spark, tmp_path):
    """A star (hub part 1 co-ordered with 2..9, no rim edges) has zero
    triangles — the oriented wedge join must emit nothing even though
    the hub's raw degree dominates."""
    from neomarket_clickhouse_indexer_spark.queries.graph_q import (
        parts_coorder_triangles,
    )

    rows = []
    oid = 0
    for spoke in range(2, 10):
        for _ in range(2):  # clear the support prune
            oid += 1
            rows += [(oid, 1), (oid, spoke)]
    sf = _write_li(spark, tmp_path, rows)
    assert parts_coorder_triangles(spark, sf).count() == 0


def _write_events(spark, tmp_path, rows):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (
                i,
                base + datetime.timedelta(hours=h),
                1,
                t,
                v,
                "{}",
            )
            for i, (t, h, v) in enumerate(rows)
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_autocov_gap_handling(spark, tmp_path):
    """Hours 0,1,2 then a gap, then 26,27: lag-1 pairs are (0,1),(1,2),
    (26,27) — the gap pair (2,26) must NOT pair; lag-24 pairs are
    (2,26) and (3,27)? No: only x and x-24 both observed -> (26,2) and
    (27,3): 3 is missing, so exactly one lag-24 pair. Values chosen so
    every sum is hand-checkable (value = cents/100)."""
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        events_hourly_autocov,
    )

    rows = [
        ("view", 0, 1.00),  # s=100 cents
        ("view", 1, 2.00),  # 200
        ("view", 2, 3.00),  # 300
        ("view", 26, 4.00),  # 400
        ("view", 27, 5.00),  # 500
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.lag_h: (r.n_pairs, r.sum_a, r.sum_b, int(r.sum_ab), int(r.cov_num))
        for r in events_hourly_autocov(spark, sf).collect()
    }
    # lag 1: pairs (a=100,b=200),(a=200,b=300),(a=400,b=500)
    sa, sb = 100 + 200 + 400, 200 + 300 + 500
    sab = 100 * 200 + 200 * 300 + 400 * 500
    assert got[1] == (3, sa, sb, sab, 3 * sab - sa * sb)
    # lag 24: only (a=s(2)=300, b=s(26)=400)
    assert got[24] == (1, 300, 400, 120000, 1 * 120000 - 300 * 400)


def test_forecast_backtest_planted(spark, tmp_path):
    """Same planted series as the autocov gap test: lag-1 pairs
    (0,1),(1,2),(26,27); lag-24 pair (2,26) only. Errors hand-computed;
    WAPE denominators are the actuals of the PAIRED hours only."""
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        events_forecast_backtest,
    )

    rows = [
        ("view", 0, 1.00),
        ("view", 1, 2.00),
        ("view", 2, 3.00),
        ("view", 26, 4.00),
        ("view", 27, 5.00),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.lag_h: (r.n_pairs, r.sum_err, r.sum_abs_err, r.sum_actual,
                  r.mae_milli, r.wape_ppm)
        for r in events_forecast_backtest(spark, sf).collect()
    }
    # lag 1: (y=200,yhat=100),(300,200),(500,400) -> e=100 each
    assert got[1] == (3, 300, 300, 1000, 100000, 300 * 1_000_000 // 1000)
    # lag 24: (y=400, yhat=300) -> e=100
    assert got[24] == (1, 100, 100, 400, 100000, 100 * 1_000_000 // 400)


def test_kcore_planted_lollipop(spark, tmp_path):
    """Lollipop: triangle {1,2,3} with a pendant chain 3-4-5 (every edge
    support-2). The peel strips 5 (deg 1), then 4; the triangle's three
    nodes survive with induced degree 2 each."""
    from neomarket_clickhouse_indexer_spark.queries.graph_q import (
        parts_coorder_kcore,
    )

    rows = []
    oid = 0
    for a, b in [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]:
        for _ in range(2):
            oid += 1
            rows += [(oid, a), (oid, b)]
    sf = _write_li(spark, tmp_path, rows)
    got = {
        r.part_key: r.core_deg
        for r in parts_coorder_kcore(spark, sf).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
