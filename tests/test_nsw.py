"""NSW graph-ANN quality pins at sf0.001 (r9 verdict task 6): the
driver gate hashes the deterministic final adjacency; THIS file pins the
quality claim behind it — recall@K vs exact brute force, and that each
NN-descent refinement round strictly improves it (the reason the
operator exists; a flat curve means the expansion degenerated back into
the bucket-transitivity trap the LSH forest is there to break).

Measured on the fixture (r11 tune: degree NSW_K=10 with rank<=4
sampled expansion): edge recall@10 = 0.1760 (round 0, LSH forest) →
0.2234 (round 1) → 0.2456 (round 2). The corpus is near-orthogonal
synthetic noise — the hardest case for ANN — so the absolute edge
recall is modest by construction; the pinned MONOTONE IMPROVEMENT is
the mechanism check, and the SERVE metric (beam recall@10 >= 0.5,
below) is the quality floor the wide degree buys."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    NSW_K,
    nsw_frame,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact_edges():
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    x = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = np.round(xn @ xn.T, 6)
    np.fill_diagonal(cos, -2)
    edges = set()
    for i in range(len(ids)):
        top = sorted(
            range(len(ids)), key=lambda j: (-cos[i, j], ids[j])
        )[:NSW_K]
        edges.update((int(ids[i]), int(ids[j])) for j in top)
    return edges, cos, {int(v): i for i, v in enumerate(ids)}


@pytest.fixture(scope="module")
def nsw_rounds(spark):
    emb = load_table(spark, SF, "embeddings")
    return {
        r: nsw_frame(emb, rounds=r).collect() for r in (0, 1, 2)
    }


def _recall(rows, exact):
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    return len(got & exact) / len(exact)


def test_refinement_strictly_improves_recall(nsw_rounds, exact_edges):
    exact, _, _ = exact_edges
    r0, r1, r2 = (_recall(nsw_rounds[r], exact) for r in (0, 1, 2))
    assert r0 < r1 < r2, (r0, r1, r2)
    # pinned bands around the measured fixture values (deterministic
    # modulo cross-platform ulp ties at the 6dp rounding boundary)
    assert abs(r0 - 0.1760) < 0.01, r0
    assert abs(r1 - 0.2234) < 0.01, r1
    assert abs(r2 - 0.2456) < 0.01, r2


def test_adjacency_shape(nsw_rounds):
    rows = nsw_rounds[2]
    by_q = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_q) == 500
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, NSW_K + 1))


def test_scores_match_reference_cosine(nsw_rounds, exact_edges):
    _, cos, idx = exact_edges
    for r in nsw_rounds[2]:
        ref = cos[idx[r["query_id"]], idx[r["neighbor_id"]]]
        assert abs(r["cosine_sim"] - ref) <= 1e-6, (r, ref)


def test_beam_search_recall_grows_with_hops(spark):
    """The serve path: beam search over the corpus-split graph must pull
    recall@10 monotonically toward the exact scan as hops increase —
    measured 0.00 (entries only) → 0.14 → 0.60 → 0.64 at hops
    0/1/3/4 on the fixture after the r11 degree-10 tune (was 0.16 at
    the old degree-4 graph). The >= 0.5 floor is the r10 verdict's
    quality target; the monotone curve is the mechanism check."""
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        NSW_SEARCH_H,
        knn_bruteforce,
        nsw_search_frame,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings")
    recalls = []
    for h in (0, 1, NSW_SEARCH_H):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in nsw_search_frame(emb, hops=h).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls[0] < recalls[1] < recalls[2], recalls
    assert recalls[2] >= 0.5, recalls
    assert abs(recalls[2] - 0.64) < 0.03, recalls


def test_incremental_insert_quality_and_mechanism(spark):
    """knn_nsw_incremental (r11 verdict task 3 — the graph-ANN
    maintenance tier): the gate hashes the deterministic post-insert
    adjacency; THIS pins the claims behind it.

    Measured on the fixture (495 corpus nodes, 38 in the md5
    position-8 'f' append batch):
      - edge overlap with the from-scratch rebuild: 0.92
      - new-node edge recall vs true kNN: 0.297 — BETTER than the
        rebuild's 0.262 on the same nodes (the expand-capped one-hop
        walk over the base graph supplies richer candidates than the
        rebuild's bucket-bounded NN-descent on a noise corpus)
    Mechanism: every corpus node is covered, ranks are contiguous, and
    a base node's neighbor set can differ from the base-only graph
    ONLY by new-batch nodes entering (repair candidates = current
    edges UNION new-node pairs, so deterministic re-scoring can never
    introduce a previously-unseen BASE neighbor)."""
    import hashlib

    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        N_QUERIES,
        _nsw_new_pred,
        knn_nsw_incremental,
    )

    emb = load_table(spark, SF, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    incr = knn_nsw_incremental(spark, SF).collect()
    rebuild_rows = nsw_frame(corpus).collect()
    base_rows = nsw_frame(
        corpus.filter(~_nsw_new_pred(F.col("vec_id")))
    ).collect()

    def is_new(v: int) -> bool:
        # position 8 (0-based 7): independent of the HNSW level chars
        return hashlib.md5(str(v).encode()).hexdigest()[7] == "f"

    corpus_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    new_ids = {v for v in corpus_ids if is_new(v)}
    assert new_ids, "fixture must contain an append batch"

    # coverage + contiguous ranks
    by_q: dict = {}
    for r in incr:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == corpus_ids
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))

    # bounded divergence vs rebuild
    incr_set = {(r["query_id"], r["neighbor_id"]) for r in incr}
    reb_set = {(r["query_id"], r["neighbor_id"]) for r in rebuild_rows}
    assert len(incr_set & reb_set) / len(reb_set) >= 0.85

    # new-node edge recall >= the rebuild's on the same nodes (with a
    # small slack band for fixture regeneration)
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    mask = ids >= N_QUERIES
    ids_c = ids[mask]
    x = np.stack(t["embedding"].to_numpy()).astype(np.float64)[mask]
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = np.round(xn @ xn.T, 6)
    np.fill_diagonal(cos, -2)
    idx = {int(v): i for i, v in enumerate(ids_c)}

    def edge_recall(pairs, nodes):
        hits = tot = 0
        for v in nodes:
            i = idx[v]
            top = sorted(
                range(len(ids_c)), key=lambda j: (-cos[i, j], ids_c[j])
            )[:NSW_K]
            true = {int(ids_c[j]) for j in top}
            got = {n for (q, n) in pairs if q == v}
            hits += len(true & got)
            tot += NSW_K
        return hits / tot

    r_incr = edge_recall(incr_set, new_ids)
    r_reb = edge_recall(reb_set, new_ids)
    assert r_incr >= r_reb - 0.05, (r_incr, r_reb)

    # mechanism: base-node neighbor changes involve ONLY new nodes
    base_nbrs: dict = {}
    for r in base_rows:
        base_nbrs.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, nbrs in base_nbrs.items():
        got = {n for (qq, n) in incr_set if qq == q}
        assert got - nbrs <= new_ids, (q, got - nbrs)


def test_hnsw_incremental_layer_structure(spark):
    """knn_hnsw_incremental (the layered insert): every layer's
    post-insert adjacency covers exactly its nested md5 population —
    including the append-batch nodes of that level — and a batch node
    of level L has rows in every layer <= L (HNSW Alg.1's
    insert-into-all-layers rule). The per-layer values themselves are
    driver-gated (the oracle re-runs the identical per-layer chain)."""
    import hashlib

    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        HNSW_LEVELS,
        N_QUERIES,
        knn_hnsw_incremental,
    )

    emb = load_table(spark, SF, "embeddings")
    corpus_ids = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") >= N_QUERIES)
        .select("vec_id").collect()
    }

    def level(v: int) -> int:
        h = hashlib.md5(str(v).encode()).hexdigest()
        lvl = 0
        while lvl < HNSW_LEVELS - 1 and h[lvl] in "01":
            lvl += 1
        return lvl

    def is_new(v: int) -> bool:
        return hashlib.md5(str(v).encode()).hexdigest()[7] == "f"

    rows = knn_hnsw_incremental(spark, SF).collect()
    by_layer: dict = {}
    for r in rows:
        by_layer.setdefault(r["layer"], set()).add(r["query_id"])
    assert set(by_layer) == set(range(HNSW_LEVELS))
    for lvl in range(HNSW_LEVELS):
        pop = {v for v in corpus_ids if level(v) >= lvl}
        assert by_layer[lvl] == pop, lvl
    # the independence fix's point: some batch node reaches layer >= 1
    batch = {v for v in corpus_ids if is_new(v)}
    assert batch
    upper_batch = {v for v in batch if level(v) >= 1}
    assert upper_batch, "batch split must be independent of levels"
    for v in upper_batch:
        for lvl in range(level(v) + 1):
            assert v in by_layer[lvl], (v, lvl)


def test_incremental_insert_servability(spark):
    """The operational insert claim: appended vectors must be SERVABLE —
    (a) every batch node gains at least one IN-link (the bidirectional-
    connect repair working; an in-degree-0 insert is invisible to graph
    descent), and (b) batch nodes are no less reachable from the md5
    entry points than the base population (measured 6/38 vs 93/457
    unreachable — the base NSW graph on a noise corpus is not strongly
    connected, and the insert must not create a second-class tier)."""
    import hashlib
    from collections import deque

    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        knn_nsw_incremental,
    )

    rows = knn_nsw_incremental(spark, SF).collect()
    adj: dict = {}
    for r in rows:
        adj.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def is_new(v: int) -> bool:
        return hashlib.md5(str(v).encode()).hexdigest()[7] == "f"

    nodes = set(adj)
    new = {v for v in nodes if is_new(v)}
    indeg: dict = {}
    for _q, ns in adj.items():
        for n in ns:
            indeg[n] = indeg.get(n, 0) + 1
    assert all(indeg.get(v, 0) >= 1 for v in new), "orphaned insert"
    entries = sorted(
        nodes, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:8]
    seen = set(entries)
    dq = deque(entries)
    while dq:
        u = dq.popleft()
        for n in adj.get(u, ()):
            if n not in seen:
                seen.add(n)
                dq.append(n)
    unreach_new = sum(1 for v in new if v not in seen) / len(new)
    base = nodes - new
    unreach_base = sum(1 for v in base if v not in seen) / len(base)
    assert unreach_new <= unreach_base + 0.10, (unreach_new, unreach_base)
