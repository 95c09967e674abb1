"""Planted checks for fixed-round synchronous label propagation: a
hand-solvable two-community graph (barbell) and a literal Python
reference of the synchronous argmax/min-tiebreak update."""

from __future__ import annotations

import collections

import numpy as np
import pytest


def _lpa_python(edges, rounds):
    nbrs = collections.defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    lab = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n in nbrs:
            cnt = collections.Counter(lab[m] for m in nbrs[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    return lab


def _run_spark_lpa(spark, edges):
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.graph_q import (
        LPA_ROUNDS,
        lpa_frame,
    )

    df = spark.createDataFrame(edges, "u bigint, v bigint").persist()
    out = {
        r.community: (r.n_nodes, r.min_member, r.internal_edges)
        for r in lpa_frame(df, 8).collect()
    }
    df.unpersist()
    return out, LPA_ROUNDS


def test_lpa_barbell_two_communities(spark):
    # two 4-cliques joined by one bridge edge: LPA must keep them as two
    # communities labeled by each clique's min node
    k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = k1 + k2 + [(3, 10)]
    got, rounds = _run_spark_lpa(spark, edges)
    want_lab = _lpa_python(edges, rounds)
    comm = collections.defaultdict(list)
    for n, l in want_lab.items():
        comm[l].append(n)
    want = {
        l: (len(ns), min(ns)) for l, ns in comm.items()
    }
    assert {l: (g[0], g[1]) for l, g in got.items()} == want
    assert len(got) == 2  # the bridge does not merge the cliques
    # internal-edge counts: edges whose endpoints share a final label
    for l, g in got.items():
        members = set(comm[l])
        internal = sum(1 for u, v in edges if u in members and v in members)
        assert g[2] == internal


@pytest.mark.parametrize("seed", [3, 88])
def test_lpa_fuzz_vs_literal(spark, seed):
    rng = np.random.RandomState(seed)
    edges = set()
    while len(edges) < 60:
        u, v = int(rng.randint(0, 30)), int(rng.randint(0, 30))
        if u != v:
            edges.add((min(u, v), max(u, v)))
    edges = sorted(edges)
    got, rounds = _run_spark_lpa(spark, edges)
    lab = _lpa_python(edges, rounds)
    comm = collections.defaultdict(list)
    for n, l in lab.items():
        comm[l].append(n)
    assert {l: (g[0], g[1]) for l, g in got.items()} == {
        l: (len(ns), min(ns)) for l, ns in comm.items()
    }
