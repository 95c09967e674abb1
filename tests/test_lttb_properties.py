"""Structural invariants of events_lttb_downsample (beyond the
differential gate): for every series the output is min(n, B) points, the
endpoints are always kept, selected x values are strictly increasing, and
every selected (x, y) is a real input point."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
    _LTTB_B,
    events_lttb_downsample,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _hourly(spark) -> pd.DataFrame:
    ev = load_table(spark, SF, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")).alias("y")
        )
        .select(
            "event_type",
            (
                F.datediff("bucket", F.lit("2024-01-01").cast("date")) * 1440
                + F.hour("bucket") * 60
            ).cast("long").alias("x"),
            "y",
        )
        .toPandas()
    )


def test_lttb_shape_endpoints_and_membership(spark):
    out = events_lttb_downsample(spark, SF).toPandas()
    raw = _hourly(spark)
    for et, grp in raw.groupby("event_type"):
        grp = grp.sort_values("x").reset_index(drop=True)
        sel = out[out["event_type"] == et].sort_values("pos").reset_index(drop=True)
        n = len(grp)
        assert len(sel) == min(n, _LTTB_B)
        # endpoints always kept
        assert sel["x_min"].iloc[0] == grp["x"].iloc[0]
        assert sel["x_min"].iloc[-1] == grp["x"].iloc[-1]
        # strictly increasing x (LTTB picks one point per ordered bucket)
        assert (sel["x_min"].diff().dropna() > 0).all()
        # every selected point is a genuine input point
        pts = set(zip(grp["x"], grp["y"]))
        assert set(zip(sel["x_min"], sel["cents"])) <= pts
