"""HNSW multi-layer NSW quality pins at sf0.001 (r10 verdict stretch
task): the driver gate hashes the deterministic layered adjacency AND
the descent results; THIS file pins the quality claim behind the
hierarchy — that descending md5-sampled layers with narrow beams up
top reaches HIGHER recall@10 than the flat NSW beam search (whose own
floor is pinned in tests/test_nsw.py), and that the layer pyramid and
nesting invariants hold.

Measured on the fixture (scores/query = the visited-set size, every
visited node scored exactly once): flat nsw_search recall@10 = 0.64
(4 hops at beam 16 from 8 arbitrary md5 entry points); layered
descent = 0.90 at ~305 scores/query (1+2+4 hops at beams 2/4/24 from
2 entry points at layer 2). The r12 sweep that picked layer-0
beam 24: extra hops saturate at 0.80, an extra NN-descent round buys
<= 0.02, beam 20 -> 0.86, beam 24 -> 0.90 at 1.26x the beam-16
baseline's 242 scores/query — the production-floor recall comes from
beam width (ef-search), a serve-only spend.
"""

import hashlib

import pytest

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    HNSW_LEVELS,
    N_QUERIES,
    _hnsw_level_pred,
    hnsw_search_frame,
    knn_bruteforce,
    nsw_frame,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hnsw_rows(spark):
    emb = load_table(spark, SF, "embeddings")
    caches: list = []
    stats: dict = {}
    rows = hnsw_search_frame(
        emb, _cache_out=caches, _stats=stats
    ).collect()
    for df in caches:
        df.unpersist()
    return rows, stats


def _py_level(vec_id: int) -> int:
    """Reference implementation of the md5 layer assignment."""
    h = hashlib.md5(str(vec_id).encode()).hexdigest()
    lvl = 0
    while lvl < HNSW_LEVELS - 1 and h[lvl] in "01":
        lvl += 1
    return lvl


def test_layer_pyramid_and_nesting(spark, hnsw_rows):
    """Layer populations decay geometrically (495/78/10 on the current
    fixture — but the pin is the MECHANISM, derived from the md5
    assignment itself, not the exact counts: a testdata regeneration
    should not break three tests at once; r11 ADVICE) and layers are
    nested: every layer-l node is a layer-(l-1) node."""
    hnsw_rows, _ = hnsw_rows
    emb = load_table(spark, SF, "embeddings")
    corpus_ids = [
        r["vec_id"]
        for r in emb.filter(f"vec_id >= {N_QUERIES}").select("vec_id").collect()
    ]
    by_lvl = {lvl: set() for lvl in range(HNSW_LEVELS)}
    for v in corpus_ids:
        for lvl in range(_py_level(v) + 1):
            by_lvl[lvl].add(v)
    # geometric decay: each layer is a 1/8 expected sample of the one
    # below — allow a wide band (1/3) so only a broken predicate, not
    # sampling noise on a regenerated fixture, fails
    assert len(by_lvl[0]) == len(corpus_ids)
    for lvl in range(1, HNSW_LEVELS):
        assert 0 < len(by_lvl[lvl]) <= len(by_lvl[lvl - 1]) // 3, lvl
    assert by_lvl[2] <= by_lvl[1] <= by_lvl[0]
    # the Spark predicate agrees with the python reference
    for lvl in range(HNSW_LEVELS):
        got = {
            r["vec_id"]
            for r in emb.filter(f"vec_id >= {N_QUERIES}")
            .filter(_hnsw_level_pred(lvl))
            .select("vec_id")
            .collect()
        }
        assert got == by_lvl[lvl], lvl
    # the gated adjacency covers exactly the per-layer populations
    # (a layer node with no edges is impossible here: every bucket has
    # >= 2 members on the fixture)
    for lvl in range(HNSW_LEVELS):
        srcs = {
            r["query_id"]
            for r in hnsw_rows
            if r["part"] == "adj" and r["layer"] == lvl
        }
        assert srcs == by_lvl[lvl], lvl


def test_layer0_adjacency_is_flat_nsw(spark, hnsw_rows):
    """Build parity: the hierarchy's layer 0 IS the flat corpus NSW
    graph (same parameters), so serve-side comparisons are
    apples-to-apples at equal base-layer edge budget."""
    hnsw_rows, _ = hnsw_rows
    emb = load_table(spark, SF, "embeddings")
    flat = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in nsw_frame(emb.filter(f"vec_id >= {N_QUERIES}")).collect()
    }
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in hnsw_rows
        if r["part"] == "adj" and r["layer"] == 0
    }
    assert got == flat


def test_descent_beats_flat_beam_recall(spark, hnsw_rows):
    """The production-floor pin (r11 verdict task 1): layered descent
    recall@10 >= 0.85 (measured 0.90 on the fixture) at a MEASURED
    serve cost within 1.5x the r11 beam-16 baseline's 242
    scores/query — and still above the flat beam search's pinned
    0.64 hard floor (narrow beams over the upper layers find better
    layer-0 entry points than the flat search's 8 md5 entries)."""
    hnsw_rows, stats = hnsw_rows
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(spark, SF).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in hnsw_rows
        if r["part"] == "serve"
    }
    recall = len(got & exact) / len(exact)
    assert recall > 0.64, recall          # the flat-search hard floor
    assert recall >= 0.85, recall         # the production floor
    # serve-cost side of the frontier: measured visited-set size per
    # query (304.8 on the fixture) stays within the 1.5x budget the
    # r11 verdict set against the 242-score baseline
    assert stats["scored_per_query"] <= 1.5 * 242, stats
