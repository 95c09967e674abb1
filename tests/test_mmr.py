"""MMR re-rank properties at sf0.001: guarantees of the greedy objective
that hold independent of the data — first pick is the relevance argmax,
selections are unique shortlist members, the first score equals its own
relevance, and every later score is bounded by rel + 1 (maxsim >= -1).
(Score monotonicity does NOT hold in general: pairwise cosines can be
negative, so the diversity penalty can RAISE a later score — observed on
the fixture, query 0 step 2.)"""

import pytest

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    MMR_K,
    knn_bruteforce,
    knn_mmr_rerank,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mmr_rows(spark):
    return knn_mmr_rerank(spark, SF).collect()


def test_first_pick_is_relevance_argmax(spark, mmr_rows):
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in knn_bruteforce(spark, SF).collect()
        if r["rank"] == 1
    }
    for r in mmr_rows:
        if r["mmr_rank"] == 1:
            assert r["neighbor_id"] == top1[r["query_id"]]


def test_selection_shape(mmr_rows):
    by_q = {}
    for r in mmr_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == MMR_K, q
        assert sorted(r["mmr_rank"] for r in rows) == list(range(1, MMR_K + 1))
        ids = [r["neighbor_id"] for r in rows]
        assert len(set(ids)) == MMR_K, q


def test_mmr_score_bounds(mmr_rows):
    for r in mmr_rows:
        if r["mmr_rank"] == 1:
            # no penalty on the first pick: score == own relevance
            assert r["mmr_score"] == r["cosine_sim"], r
        else:
            # penalty = max sim to selected, in [-1, 1]
            assert r["cosine_sim"] - 1 <= r["mmr_score"] <= r["cosine_sim"] + 1, r


def test_lone_candidate_shortlist_survives():
    """A query whose shortlist has exactly ONE candidate produces no
    (cand, other) pairwise row; the left join feeds the kernel a single
    row with null other/sim and the kernel must still select the lone
    candidate at rank 1 with score == rel (ADVICE r6 latent mismatch —
    the oracle's pick1 selects it via COALESCE(maxsim, 0))."""
    import numpy as np
    import pandas as pd

    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        _mmr_kernel,
    )

    pdf = pd.DataFrame(
        {
            "query_id": [7],
            "cand": [42],
            "rel": [0.625],
            "other": [np.nan],
            "sim": [np.nan],
        }
    )
    out = _mmr_kernel(pdf)
    assert len(out) == 1
    row = out.iloc[0]
    assert (
        int(row.query_id),
        int(row.mmr_rank),
        int(row.neighbor_id),
        float(row.cosine_sim),
        float(row.mmr_score),
    ) == (7, 1, 42, 0.625, 0.625)
