"""Prefix-filter completeness property: for ANY corpus, docs_setsim_join's
prefix-filtered pipeline must emit exactly the pairs a brute-force all-pairs
Jaccard scan finds — the filter is an optimization, never a recall trade.
Adversarial shapes the sf fixtures can't produce: many identical docs (every
prefix bucket hot), singleton-token docs, size-ratio pairs straddling the
length filter, token sets nested subset-style."""

from __future__ import annotations

from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neomarket_clickhouse_indexer_spark.queries.documents import (
    SETSIM_TAU_DEN,
    SETSIM_TAU_NUM,
    setsim_pairs,
)

TAU = Fraction(SETSIM_TAU_NUM, SETSIM_TAU_DEN)

# small token alphabet → forced collisions and hot df buckets
_token = st.sampled_from([f"t{i}" for i in range(12)])
_doc = st.lists(_token, min_size=1, max_size=10)
_corpus = st.lists(_doc, min_size=2, max_size=12)


def _brute_force(corpus: list[list[str]]):
    sets = [set(d) for d in corpus]
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if Fraction(inter, union) >= TAU:
                out.add((i, j, inter, union))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_prefix_filter_is_lossless(spark, corpus):
    rows = [(i, " ".join(doc)) for i, doc in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.inter_n, r.union_n)
        for r in setsim_pairs(docs).collect()
    }
    assert got == _brute_force(corpus)


@pytest.mark.parametrize(
    "corpus",
    [
        # all-identical corpus: every pair qualifies, hottest possible bucket
        [["a", "b", "c"]] * 6,
        # singleton docs: prefix == whole doc
        [["a"], ["a"], ["b"]],
        # nested subsets around the threshold: {a..d} vs {a..e} = 4/5 == tau
        [["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]],
        # just below threshold: 3/5 < tau → no pair
        [["a", "b", "c"], ["a", "b", "c", "d", "e"]],
    ],
)
def test_known_edges(spark, corpus):
    rows = [(i, " ".join(doc)) for i, doc in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.inter_n, r.union_n)
        for r in setsim_pairs(docs).collect()
    }
    assert got == _brute_force(corpus)
