"""BPE merge-training properties: the greedy left-to-right non-overlap
fold (docs_bpe_merges) pinned against a literal Python automaton on the
edge cases the closed fold must get right (odd/even runs, merged-symbol
reuse, pair created by an earlier merge in the same word)."""

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.pipeline import (
    _bpe_merge_fold,
)


def _py_greedy(syms, a, b):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


CASES = [
    (["a", "a", "a", "a"], "a", "a"),  # even run -> [aa, aa]
    (["a", "a", "a"], "a", "a"),  # odd run -> [aa, a]
    (["a", "a", "a", "a", "a"], "a", "a"),  # 5-run -> [aa, aa, a]
    (["x", "a", "b", "a", "b"], "a", "b"),  # chain -> [x, ab, ab]
    (["a", "b", "b"], "a", "b"),  # no cascade -> [ab, b]
    (["ab", "b", "b"], "ab", "b"),  # merged-left reuse -> [abb, b]
    (["a"], "a", "a"),  # single symbol untouched
    (["b", "a"], "a", "b"),  # wrong order untouched
]


@pytest.mark.parametrize("syms,a,b", CASES)
def test_fold_matches_literal_automaton(spark, syms, a, b):
    df = spark.createDataFrame([(syms,)], "syms: array<string>")
    got = df.select(
        F.aggregate(
            "syms", F.array().cast("array<string>"), _bpe_merge_fold(a, b)
        ).alias("m")
    ).collect()[0]["m"]
    assert got == _py_greedy(syms, a, b), (syms, a, b)


def test_encode_totals_equal_training_final_state(spark):
    """Corpus-wide invariant closing the tokenizer loop: the per-doc BPE
    token counts emitted by docs_bpe_encode (re-encoding from the rule
    list) must sum to the trainer's final corpus_syms_after (training
    chain's last word states) — encode(rules) == train-final."""
    from neomarket_clickhouse_indexer_spark.queries.pipeline import (
        docs_bpe_encode,
        docs_bpe_merges,
    )

    sf = "/root/testdata/sf0.001"
    trained = docs_bpe_merges(spark, sf).collect()
    final_syms = max(trained, key=lambda r: r["iteration"])["corpus_syms_after"]
    enc = docs_bpe_encode(spark, sf).agg(
        F.sum("n_bpe_tokens").alias("t"), F.sum("n_chars").alias("c")
    ).collect()[0]
    assert enc["t"] == final_syms
    assert enc["c"] >= enc["t"]  # merges only ever shrink symbol counts


def test_fold_only_ever_removes_symbols(spark):
    # realized merges = before - after, always >= 0 and <= floor(runs)
    df = spark.createDataFrame(
        [(["a", "a", "a", "a", "a", "a", "a"],)], "syms: array<string>"
    )
    got = df.select(
        F.aggregate(
            "syms", F.array().cast("array<string>"), _bpe_merge_fold("a", "a")
        ).alias("m")
    ).collect()[0]["m"]
    assert got == ["aa", "aa", "aa", "a"]
