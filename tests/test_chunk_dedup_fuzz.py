"""Seeded fuzz differentials for the r7 operators against literal
Python reference implementations (the automaton/closed-form doctrine):
chunk-dedup keep-first vs a dict-based first-occurrence scan, and
triangle counting vs an itertools all-triples brute force — tiny random
instances where the quadratic reference is affordable."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [7, 41])
def test_chunk_dedup_fuzz_vs_python_scan(spark, seed):
    from neomarket_clickhouse_indexer_spark.queries.documents import (
        CHUNK_W,
        chunk_dedup_frame,
    )

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(6)]  # tiny alphabet -> many dup chunks
    docs = []
    for doc_id in range(40):
        n_words = int(rng.randint(1, 4 * CHUNK_W + 3))
        docs.append(
            (doc_id, " ".join(vocab[rng.randint(0, len(vocab))] for _ in range(n_words)))
        )

    # literal reference: scan docs in (doc_id, chunk_idx) order, keep the
    # first occurrence of each chunk string
    seen: set[str] = set()
    want = {}
    for doc_id, text in docs:
        words = text.split(" ")
        chunks = [
            " ".join(words[i : i + CHUNK_W])
            for i in range(0, len(words), CHUNK_W)
        ]
        kept = []
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        want[doc_id] = (len(chunks), len(kept), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.text_rewritten)
        for r in chunk_dedup_frame(df).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [11, 83])
def test_triangles_fuzz_vs_bruteforce(spark, seed, tmp_path):
    from neomarket_clickhouse_indexer_spark.queries.graph_q import (
        TRI_MIN_SUPPORT,
        TRI_TOP,
        parts_coorder_triangles,
    )

    rng = np.random.RandomState(seed)
    # random small orders over 12 parts; repetition makes many edges clear
    # the support prune
    rows = []
    for oid in range(60):
        parts = rng.choice(12, size=rng.randint(2, 5), replace=False)
        rows += [(oid, int(p)) for p in parts]

    # literal reference: support-counted undirected edges, then all
    # triples (the id-canonical brute force, one more time in Python)
    sup: dict[tuple[int, int], int] = {}
    by_order: dict[int, set[int]] = {}
    for o, p in rows:
        by_order.setdefault(o, set()).add(p)
    for members in by_order.values():
        for a, b in itertools.combinations(sorted(members), 2):
            sup[(a, b)] = sup.get((a, b), 0) + 1
    edges = {e for e, s in sup.items() if s >= TRI_MIN_SUPPORT}
    tri_cnt: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(12), 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for n in (a, b, c):
                tri_cnt[n] = tri_cnt.get(n, 0) + 1
    ranked = sorted(tri_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TRI_TOP]
    want = {
        n: (rank + 1, cnt) for rank, (n, cnt) in enumerate(ranked)
    }

    df = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = {
        r.part_key: (r.rank, r.tri_cnt)
        for r in parts_coorder_triangles(spark, str(tmp_path)).collect()
    }
    assert got == want
