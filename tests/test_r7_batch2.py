"""Planted-case properties for the r7 batch-2 operators: mutual-kNN
(reciprocity bound, hub-edge cut, bucket cap), Nelson–Aalen churn hazard
vs a literal Python recount, and the encoding advisor's planted
run/cardinality verdicts."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from pyspark.sql import functions as F

T0 = datetime.datetime(2024, 1, 1)


def _emb_frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


def test_mutual_pairs_reciprocity_and_hub_cut(spark):
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        DIM,
        MUTUAL_K,
        mutual_pairs_frame,
    )

    rng = np.random.RandomState(7)
    # a tight cluster of MUTUAL_K+3 similar vectors + isolated randoms:
    # inside the cluster every vector has > MUTUAL_K close neighbors, so
    # some edges MUST be asymmetric-or-cut; the bound n*K/2 must hold
    base = rng.randn(DIM)
    cluster = [base + 0.05 * rng.randn(DIM) for _ in range(MUTUAL_K + 3)]
    noise = [rng.randn(DIM) for _ in range(10)]
    emb = _emb_frame(spark, cluster + noise)
    rows = mutual_pairs_frame(emb).collect()
    n = len(cluster) + len(noise)
    assert len(rows) <= n * MUTUAL_K // 2
    for r in rows:
        assert 1 <= r.rank_ab <= MUTUAL_K and 1 <= r.rank_ba <= MUTUAL_K
        assert r.vec_a < r.vec_b


def test_mutual_pairs_bucket_cap_bounds_flooded_bucket(spark):
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        DIM,
        MUTUAL_BUCKET_CAP,
        MUTUAL_K,
        mutual_pairs_frame,
    )

    # 3x the cap of IDENTICAL vectors -> one flooded LSH bucket; the cap
    # must bound the candidate pairs at cap*(cap-1)/2 before the top-K
    # cut, and the output at cap*K/2
    v = np.ones(DIM)
    emb = _emb_frame(spark, [v] * (3 * MUTUAL_BUCKET_CAP))
    rows = mutual_pairs_frame(emb).collect()
    assert len(rows) <= MUTUAL_BUCKET_CAP * MUTUAL_K // 2
    ids = {r.vec_a for r in rows} | {r.vec_b for r in rows}
    assert len(ids) <= MUTUAL_BUCKET_CAP


@pytest.mark.parametrize("seed", [3, 21])
def test_churn_hazard_vs_literal_recount(spark, seed):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        CHURN_CENSOR_DATE,
        CHURN_QUIET_DAYS,
        churn_hazard_frame,
    )

    rng = np.random.RandomState(seed)
    rows, lifetimes = [], {}
    censor = datetime.date.fromisoformat(CHURN_CENSOR_DATE)
    for u in range(60):
        first = int(rng.randint(0, 15))
        last = first + int(rng.randint(0, 29 - first))
        rows.append((u, T0 + datetime.timedelta(days=first, hours=3)))
        rows.append((u, T0 + datetime.timedelta(days=last, hours=5)))
        t = last - first
        last_d = (T0 + datetime.timedelta(days=last)).date()
        churned = (censor - last_d).days >= CHURN_QUIET_DAYS
        lifetimes[u] = (t, churned)
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {r.t_days: r for r in churn_hazard_frame(df).collect()}

    ts = sorted({t for t, _ in lifetimes.values()})
    cum = 0
    for t in ts:
        n_risk = sum(1 for lt, _ in lifetimes.values() if lt >= t)
        d = sum(1 for lt, ch in lifetimes.values() if lt == t and ch)
        c = sum(1 for lt, ch in lifetimes.values() if lt == t and not ch)
        h = d * 1_000_000 // n_risk
        cum += h
        r = got[t]
        assert (r.n_risk, r.d_churn, r.n_censored, r.hazard_ppm,
                r.cum_hazard_ppm) == (n_risk, d, c, h, cum)
    assert set(got) == set(ts)


def test_encoding_advisor_planted_verdicts(spark):
    from neomarket_clickhouse_indexer_spark.queries.relational import (
        encoding_advisor_frame,
    )

    rng = np.random.RandomState(11)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                T0 + datetime.timedelta(days=i % 4, minutes=i),
                # user_id: all-distinct -> plain (400 runs, 400 distinct)
                int(1_000_000 + i),
                # event_type: constant -> rle (one run per day = 4 runs)
                "only",
                # value: 8 distinct cents values in random order ->
                # dict (few distinct, many runs)
                float(int(rng.randint(0, 8))) / 100.0,
                '{"k": 1}',
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    got = {r.col_name: r for r in encoding_advisor_frame(df).collect()}
    assert got["event_type"].runs == 4
    assert got["event_type"].encoding == "rle"
    assert got["user_id"].n_distinct == 400
    assert got["user_id"].encoding == "plain"
    assert got["cents"].n_distinct == 8
    assert got["cents"].encoding == "dict"
    assert got["props"].encoding == "rle"  # constant -> 4 runs too
    assert got["event_type"].n == 400 and got["event_type"].total_bytes == 1600
