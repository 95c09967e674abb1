"""Tombstone-delete servability pins (r12 verdict task 1 — the last
CRUD leg of the graph-ANN maintenance family). The driver gate hashes
the deterministic post-compaction adjacency; THIS file pins the
operational claims behind it, measured on the fixture (495 corpus
nodes, 32 in the md5 position-9 'f' victim batch):

1. TOMBSTONE-FREE: no edge endpoint is a victim (a beam search over
   the compacted graph can never visit deleted data — the GDPR bit).
2. COVERAGE + DEGREE: every survivor keeps a full adjacency row set
   (ranks contiguous; affected srcs repair back to K edges — measured
   min degree 10 = NSW_K).
3. DIFFERENTIAL vs from-scratch rebuild on the surviving corpus:
   edge overlap measured 0.932 (the mirror of the insert tier's 0.92
   append==rebuild differential).
4. UNTOUCHED VERBATIM: survivors with no victim out-edge keep their
   base rows bit-for-bit.
5. REACHABILITY PARITY: the survivors' unreachable-from-entries share
   must not exceed the base graph's (the insert servability doctrine:
   compaction must not create a second-class tier). Measured
   209/463 vs 222/495.
"""

import hashlib
from collections import Counter, deque

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    N_QUERIES,
    NSW_K,
    _nsw_del_pred,
    knn_nsw_delete,
    nsw_frame,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _is_dead(v: int) -> bool:
    # md5 hex position 9 (0-based 8): disjoint from the HNSW level
    # chars (1-2) and the insert split (8) — the r12 degeneracy lesson
    return hashlib.md5(str(v).encode()).hexdigest()[8] == "f"


def _reach_unreachable(pairs: set, nodes: set) -> int:
    adj: dict = {}
    for q, n in pairs:
        adj.setdefault(q, []).append(n)
    entries = sorted(
        nodes, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:2]
    seen = set(entries)
    dq = deque(entries)
    while dq:
        u = dq.popleft()
        for w in adj.get(u, []):
            if w not in seen:
                seen.add(w)
                dq.append(w)
    return len(nodes - seen)


def test_delete_compaction_servability(spark):
    emb = load_table(spark, SF, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    corpus_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    victims = {v for v in corpus_ids if _is_dead(v)}
    survivors = corpus_ids - victims
    assert victims, "fixture must contain a victim batch"

    comp = knn_nsw_delete(spark, SF).collect()
    comp_set = {(r["query_id"], r["neighbor_id"]) for r in comp}
    base_rows = nsw_frame(corpus).collect()
    base_set = {(r["query_id"], r["neighbor_id"]) for r in base_rows}
    reb_set = {
        (r["query_id"], r["neighbor_id"])
        for r in nsw_frame(
            corpus.filter(~_nsw_del_pred(F.col("vec_id")))
        ).collect()
    }

    # 1. tombstone-free
    assert not any(_is_dead(q) or _is_dead(n) for q, n in comp_set)

    # 2. coverage + contiguous ranks + repaired degree
    by_q: dict = {}
    for r in comp:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == survivors
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    aff = {q for q, n in base_set if not _is_dead(q) and _is_dead(n)}
    deg = Counter(q for q, _n in comp_set)
    assert min(deg[q] for q in aff) == NSW_K

    # 3. bounded divergence vs the from-scratch survivor rebuild
    assert len(comp_set & reb_set) / len(reb_set) >= 0.85

    # 4. untouched survivors keep base rows verbatim
    untouched = {
        (q, n) for q, n in base_set if not _is_dead(q) and q not in aff
    }
    assert untouched <= comp_set

    # 5. reachability parity (small slack band for fixture refresh)
    u_comp = _reach_unreachable(comp_set, survivors)
    u_base = _reach_unreachable(base_set, corpus_ids)
    assert u_comp / len(survivors) <= u_base / len(corpus_ids) + 0.05


def test_hnsw_delete_layer_structure(spark):
    """knn_hnsw_delete (the layered compaction): a victim is erased
    from EVERY layer (the global-tombstone rule), each layer's
    post-compaction adjacency covers exactly its surviving nested md5
    population, and no layer's edge reaches a tombstone. The per-layer
    values are driver-gated (the oracle re-runs the identical
    per-layer chain)."""
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        HNSW_LEVELS,
        knn_hnsw_delete,
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

    rows = knn_hnsw_delete(spark, SF).collect()
    by_layer: dict = {}
    for r in rows:
        by_layer.setdefault(r["layer"], set()).add(r["query_id"])
        assert not _is_dead(r["query_id"]) and not _is_dead(
            r["neighbor_id"]
        ), r
    assert set(by_layer) == set(range(HNSW_LEVELS))
    for lvl in range(HNSW_LEVELS):
        pop = {
            v for v in corpus_ids if level(v) >= lvl and not _is_dead(v)
        }
        assert by_layer[lvl] == pop, lvl
    # some victim exists at layer >= 1, so the upper-layer erasure is
    # actually exercised (md5 position 9 is independent of levels)
    upper_victims = {
        v for v in corpus_ids if _is_dead(v) and level(v) >= 1
    }
    assert upper_victims, "fixture must tombstone an upper-layer node"


def test_reembed_update_semantics(spark):
    """knn_nsw_reembed (the UPDATE leg): the standing index must MOVE
    re-embedded vectors, not duplicate or stale-serve them. Measured on
    the fixture (495 corpus nodes, 37 in the md5 position-10 batch):
    full coverage, every batch node's neighborhood CHANGED (the
    dimension rotation relocates it), edge overlap 0.886 vs a
    from-scratch rebuild on the refreshed corpus, and batch-node edge
    recall 0.259 >= the rebuild's own 0.219 on the same nodes (the
    walk-supplied candidates beat bucket-bounded NN-descent — the
    insert tier's pattern)."""
    import numpy as np
    import pyarrow.parquet as pq

    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        _ROT1_SPARK,
        _nsw_upd_pred,
        NSW_K,
        knn_nsw_reembed,
    )

    emb = load_table(spark, SF, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    corpus_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}

    def is_upd(v: int) -> bool:
        return hashlib.md5(str(v).encode()).hexdigest()[9] == "f"

    batch = {v for v in corpus_ids if is_upd(v)}
    assert batch, "fixture must contain a re-embed batch"
    out = knn_nsw_reembed(spark, SF).collect()
    upd_set = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert {q for q, _n in upd_set} == corpus_ids  # full coverage

    refreshed = corpus.select(
        "vec_id",
        F.when(_nsw_upd_pred(F.col("vec_id")), F.expr(_ROT1_SPARK))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    reb = {
        (r["query_id"], r["neighbor_id"])
        for r in nsw_frame(refreshed).collect()
    }
    base = {
        (r["query_id"], r["neighbor_id"]) for r in nsw_frame(corpus).collect()
    }
    assert len(upd_set & reb) / len(reb) >= 0.82

    pre: dict = {}
    post: dict = {}
    for q, n in base:
        pre.setdefault(q, set()).add(n)
    for q, n in upd_set:
        post.setdefault(q, set()).add(n)
    assert all(post[v] != pre[v] for v in batch), "stale neighborhoods"

    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    mask = ids >= N_QUERIES
    ids_c = ids[mask]
    x = np.stack(t["embedding"].to_numpy()).astype(np.float64)[mask]
    for i, v in enumerate(ids_c):
        if is_upd(int(v)):
            x[i] = np.concatenate([x[i][1:], x[i][:1]])
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

    assert edge_recall(upd_set, batch) >= edge_recall(reb, batch) - 0.05


def test_layered_reembed_composition(spark):
    """The LAYERED update needs no new machinery: a node's level is
    id-derived (md5 chars 1-2), so re-embedding never moves it across
    layers — layered update == the flat delete∘insert composition run
    per layer. Exercise it once on the (small) layer-1 population:
    coverage == surviving+updated layer-1 nodes, no stale
    neighborhoods among the batch, endpoints stay inside the layer."""
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        _ROT1_SPARK,
        _hnsw_level_pred,
        _nsw_upd_pred,
        HNSW_BUCKETINGS,
        HNSW_ROUNDS,
        nsw_delete_frame,
        nsw_incremental_frame,
    )

    emb = load_table(spark, SF, "embeddings")
    lvl = 1
    compacted = nsw_delete_frame(
        emb,
        bucketings=HNSW_BUCKETINGS[lvl],
        node_pred=_hnsw_level_pred(lvl),
        rounds=HNSW_ROUNDS[lvl],
        dead_pred=_nsw_upd_pred,
    ).localCheckpoint(eager=True)
    refreshed = emb.select(
        "vec_id",
        F.when(
            _nsw_upd_pred(F.col("vec_id")) & (F.col("vec_id") >= N_QUERIES),
            F.expr(_ROT1_SPARK),
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    out = nsw_incremental_frame(
        refreshed,
        bucketings=HNSW_BUCKETINGS[lvl],
        node_pred=_hnsw_level_pred(lvl),
        rounds=HNSW_ROUNDS[lvl],
        prebuilt_base=compacted,
        new_pred=_nsw_upd_pred,
    ).collect()
    pop = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") >= N_QUERIES)
        .filter(_hnsw_level_pred(lvl)).select("vec_id").collect()
    }

    def is_upd(v: int) -> bool:
        return hashlib.md5(str(v).encode()).hexdigest()[9] == "f"

    batch = {v for v in pop if is_upd(v)}
    assert batch, "layer-1 must contain re-embed nodes"
    upd_set = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert {q for q, _n in upd_set} == pop
    assert {n for _q, n in upd_set} <= pop  # layer-closed endpoints
    base = {
        (r["query_id"], r["neighbor_id"])
        for r in nsw_frame(
            emb.filter(F.col("vec_id") >= N_QUERIES)
            .filter(_hnsw_level_pred(lvl)),
            bucketings=HNSW_BUCKETINGS[lvl],
            rounds=HNSW_ROUNDS[lvl],
        ).collect()
    }
    pre: dict = {}
    post: dict = {}
    for q, n in base:
        pre.setdefault(q, set()).add(n)
    for q, n in upd_set:
        post.setdefault(q, set()).add(n)
    assert all(post[v] != pre[v] for v in batch), "stale layer update"
