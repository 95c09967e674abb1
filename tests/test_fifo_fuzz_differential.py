"""Seeded fuzz differential: random event frames (with deliberate
timestamp collisions to exercise the (ts, ord) tiebreak) through BOTH the
Spark mapInPandas engines and their DuckDB oracles."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pytest

from neomarket_clickhouse_indexer_spark.operators.fifo import (
    avg_cost_positions,
    avg_cost_positions_sql,
    fifo_allocate,
    fifo_allocate_sql,
)

from .compare import compare

T0 = dt.datetime(2024, 1, 1)
SCHEMA = "key bigint, ts timestamp, ord bigint, side int, qty int, price double"


def _random_events(seed: int, n: int = 300, n_keys: int = 8):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                int(rng.randint(0, n_keys)),
                # coarse ts → many collisions; ord is the unique tiebreak
                T0 + dt.timedelta(minutes=int(rng.randint(0, 20))),
                i,
                1 if rng.rand() < 0.55 else -1,
                int(rng.randint(1, 6)),
                round(float(rng.rand() * 50 + 1), 2),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_fifo_allocate_fuzz(spark, seed):
    rows = _random_events(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["key", "ts", "ord", "side", "qty", "price"]
    )
    con.register("fuzz_events", pdf)
    compare(fifo_allocate(df), con, fifo_allocate_sql("fuzz_events"))
    con.close()


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_avgcost_fuzz(spark, seed):
    rows = _random_events(seed, n=200)
    df = spark.createDataFrame(rows, SCHEMA)
    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["key", "ts", "ord", "side", "qty", "price"]
    )
    con.register("fuzz_events", pdf)
    # oracle expects qty as DOUBLE-compatible; the recursive CTE walks rows
    compare(
        avg_cost_positions(df),
        con,
        avg_cost_positions_sql("(SELECT key, ts, ord, side, CAST(qty AS DOUBLE) AS qty, price FROM fuzz_events)"),
    )
    con.close()
