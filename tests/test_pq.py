"""PQ-ADC ANN quality: the approximate result must actually approximate.

The differential gate proves Spark == oracle; this test proves the
algorithm is a credible ANN — recall@10 against exact L2 (numpy, float64)
on the sf0.01 corpus. Measured at build time: ADC-only ≈ 0.50, after the
exact re-rank of the top-50 shortlist ≈ 0.96.
"""

from __future__ import annotations

import duckdb
import numpy as np

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    N_QUERIES,
    knn_pq_adc,
)

from .conftest import SF_CORRECTNESS


def test_pq_rerank_recall_at_10(spark):
    out = knn_pq_adc(spark, SF_CORRECTNESS).toPandas()

    emb = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_CORRECTNESS}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    vecs = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    queries, corpus, corpus_ids = (
        vecs[:N_QUERIES], vecs[N_QUERIES:], ids[N_QUERIES:]
    )

    recalls = []
    for qi in range(N_QUERIES):
        d2 = ((corpus - queries[qi]) ** 2).sum(axis=1)
        exact_top = set(corpus_ids[np.argsort(d2, kind="stable")[:10]])
        approx_top = set(out[out["query_id"] == qi]["neighbor_id"])
        recalls.append(len(exact_top & approx_top) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
