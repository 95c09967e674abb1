"""Independent NumPy reference for the iterative k-means loop — a third
implementation besides the Spark job and the unrolled-CTE DuckDB oracle.
Assignments replicate the gate's discipline (squared-L2 rounded to 6dp,
lowest-id tiebreak, means rounded to 6dp per iteration); means are compared
at 1e-6 (the gate's own quantization), membership counts exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    KMEANS_ITERS,
    KMEANS_K,
    kmeans_train,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(emb: pd.DataFrame):
    X = np.stack(emb.sort_values("vec_id").embedding.to_numpy()).astype(np.float64)
    ids = emb.sort_values("vec_id").vec_id.to_numpy()
    cents = {int(ids[i]): X[i] for i in range(len(ids)) if ids[i] < KMEANS_K}
    for _ in range(KMEANS_ITERS):
        cids = sorted(cents)
        C = np.stack([cents[c] for c in cids])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).round(6)
        # argmin with lowest-cluster-id tiebreak (C is in ascending id order)
        assign = np.array([cids[j] for j in d2.argmin(axis=1)])
        cents = {
            int(c): X[assign == c].mean(axis=0).round(6)
            for c in np.unique(assign)
        }
    return cents, assign


def test_kmeans_train_matches_numpy(spark):
    emb = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
    )
    cents, assign = _numpy_kmeans(emb)
    got = kmeans_train(spark, SF).toPandas()

    counts = pd.Series(assign).value_counts().to_dict()
    for cid, g in got.groupby("cluster_id"):
        assert counts[cid] == g.n_members.iloc[0], (cid, counts)
        want = cents[cid]
        g = g.sort_values("dim")
        np.testing.assert_allclose(
            g.mean_v.to_numpy(), want, atol=2e-6, rtol=0,
            err_msg=f"cluster {cid}",
        )
    assert set(got.cluster_id.unique()) == set(cents.keys())
