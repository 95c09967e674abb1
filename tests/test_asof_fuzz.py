"""Seeded fuzz differential for the as-of join: the single-pass
union+carry-forward operator vs DuckDB's native ASOF JOIN on random frames
(including equal-timestamp anchor/probe pairs, the documented edge)."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest

from neomarket_clickhouse_indexer_spark.operators.asof import asof_join

from .compare import compare

T0 = dt.datetime(2024, 1, 1)


@pytest.mark.parametrize("seed", [3, 99])
def test_asof_fuzz(spark, seed):
    rng = np.random.RandomState(seed)
    n_keys = 5

    def frame(n, id_base):
        return [
            (
                int(rng.randint(0, n_keys)),
                # coarse seconds → deliberate ts collisions across frames
                T0 + dt.timedelta(seconds=int(rng.randint(0, 50))),
                id_base + i,
                round(float(rng.rand() * 100), 2),
            )
            for i in range(n)
        ]

    anchors = frame(60, 0)
    # de-duplicate anchor timestamps per key (two anchors tying on ts make
    # the oracle's pick ambiguous); keep probe timestamps coarse so
    # probe==anchor ts equality — the documented <= edge — still occurs
    anchors = [
        (k, ts + dt.timedelta(microseconds=eid), eid, v)
        for (k, ts, eid, v) in anchors
    ]
    probes = frame(40, 1000)
    schema = "k long, ts timestamp, event_id long, value double"
    a_df = spark.createDataFrame(anchors, schema)
    p_df = spark.createDataFrame(probes, schema).drop("value")

    out = asof_join(
        probes=p_df,
        anchors=a_df,
        on=["k"],
        ts="ts",
        payload=["value"],
        tiebreak="event_id",
    ).select("event_id", "k", "asof_value")

    con = duckdb.connect()
    con.register("anchors", pd.DataFrame(anchors, columns=["k", "ts", "event_id", "value"]))
    con.register("probes", pd.DataFrame(
        [(r[0], r[1], r[2]) for r in probes], columns=["k", "ts", "event_id"]
    ))
    oracle = """
    SELECT p.event_id, p.k, a.value AS asof_value
    FROM probes p ASOF LEFT JOIN anchors a
      ON p.k = a.k AND a.ts <= p.ts
    """
    compare(out, con, oracle)
    con.close()
