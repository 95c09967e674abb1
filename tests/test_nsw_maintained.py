"""Serve-over-maintained-index invariants (knn_nsw_search_maintained):
the user-visible surface of the CRUD story. A query against the
post-insert+delete index must (1) never return a tombstoned vector,
(2) be able to return freshly inserted vectors, (3) return well-formed
ranked lists drawn from the survivor corpus."""

from __future__ import annotations

import hashlib

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    N_QUERIES,
    NSW_DEL_CHAR,
    NSW_DEL_POS,
    NSW_INCR_NEW_CHAR,
    NSW_INCR_NEW_POS,
    TOP_K,
    knn_nsw_search_maintained,
)

SF = "/root/testdata/sf0.001"


def _is_dead(vec_id: int) -> bool:
    h = hashlib.md5(str(vec_id).encode()).hexdigest()
    return h[NSW_DEL_POS - 1] == NSW_DEL_CHAR


def _is_new(vec_id: int) -> bool:
    h = hashlib.md5(str(vec_id).encode()).hexdigest()
    return h[NSW_INCR_NEW_POS - 1] == NSW_INCR_NEW_CHAR


def test_maintained_serve_invariants(spark):
    rows = knn_nsw_search_maintained(spark, SF).collect()
    serve = [r for r in rows if r["part"] == "serve"]
    audit = {r["part"]: r["neighbor_id"] for r in rows if r["part"] != "serve"}

    # audit rows agree with a python-side recount of the serve rows
    assert audit["audit_dead_in_results"] == sum(
        _is_dead(r["neighbor_id"]) for r in serve
    )
    assert audit["audit_new_in_results"] == sum(
        _is_new(r["neighbor_id"]) for r in serve
    )
    # (1) erased vectors are never served
    assert audit["audit_dead_in_results"] == 0
    # (2) fresh appends are retrievable immediately
    assert audit["audit_new_in_results"] >= 1

    # (3) well-formed result lists: every query answered with TOP_K
    # dense ranks, neighbors drawn from the survivor corpus
    by_q: dict = {}
    for r in serve:
        assert r["neighbor_id"] >= N_QUERIES
        assert not _is_dead(r["neighbor_id"])
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert sorted(by_q) == list(range(N_QUERIES))
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, TOP_K + 1))
