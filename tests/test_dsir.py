"""DSIR-style selection sanity: the hashed-bigram importance score must
actually PREFER target-domain-like documents — a selection gate whose
top-K is indistinguishable from random would pass the differential
(both engines agree on garbage) without evidencing the mechanism.
Properties pinned at sf0.001:

1. exactly DSIR_SELECT_K docs selected (the value-threshold cut with
   the doc_id tiebreak is exact, no over/under-selection at ties);
2. the mean score of target-lang ('en') docs exceeds the mean score of
   non-target docs (the distributions differ and the score points the
   right way);
3. the selected set is enriched in target-lang docs vs the corpus rate.
"""

from __future__ import annotations

from neomarket_clickhouse_indexer_spark.queries.pipeline import (
    DSIR_SELECT_K,
    DSIR_TARGET_LANG,
    docs_dsir_selection,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF0001 = "/root/testdata/sf0.001"


def test_selection_prefers_target_domain(spark):
    out = docs_dsir_selection(spark, SF0001).collect()
    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, SF0001, "documents")
        .select("doc_id", "lang").collect()
    }
    assert sum(r["selected"] for r in out) == DSIR_SELECT_K

    tgt = [r["score"] for r in out if langs[r["doc_id"]] == DSIR_TARGET_LANG]
    rest = [r["score"] for r in out if langs[r["doc_id"]] != DSIR_TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)

    sel_tgt = sum(
        1 for r in out
        if r["selected"] and langs[r["doc_id"]] == DSIR_TARGET_LANG
    )
    corpus_rate = len(tgt) / len(out)
    assert sel_tgt / DSIR_SELECT_K > corpus_rate
