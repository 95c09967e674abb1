"""Hypothesis crosscheck of docs_repetition_signals' per-row HOF pipeline
against a direct Python computation on randomized token streams — catches
mode-count / bigram edge cases (repeated tokens, len<2 docs, all-identical
docs) independently of the DuckDB oracle."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neomarket_clickhouse_indexer_spark.queries.pipeline import (
    _REP_BG_DEN,
    _REP_BG_NUM,
    _REP_DIV_DEN,
    _REP_DIV_NUM,
    _REP_TOK_DEN,
)

WORDS = ["alpha", "beta", "gamma", "beta", "x"]


def _py_signals(tokens: list[str]):
    text = " ".join(tokens)
    toks = text.split(" ")  # matches split semantics incl. empty doc -> ['']
    n = len(toks)
    if n >= 2:
        g2 = [f"{toks[i]} {toks[i + 1]}" for i in range(n - 1)]
    else:
        g2 = [" ".join(toks)]
    top_tok = max(Counter(toks).values())
    top_bg = max(Counter(g2).values())
    reasons = (
        (1 if _REP_TOK_DEN * top_tok > n else 0)
        + (2 if _REP_BG_DEN * top_bg > _REP_BG_NUM * len(g2) else 0)
        + (4 if _REP_DIV_DEN * len(set(toks)) < _REP_DIV_NUM * n else 0)
    )
    return {
        "n_tokens": n,
        "n_distinct_tokens": len(set(toks)),
        "top_token_cnt": top_tok,
        "n_bigrams": len(g2),
        "top_bigram_cnt": top_bg,
        "reasons": reasons,
    }


@pytest.fixture(scope="module")
def rep_fn():
    from neomarket_clickhouse_indexer_spark.queries.pipeline import (
        docs_repetition_signals,
    )

    return docs_repetition_signals


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_repetition_signals_match_python(spark, tmp_path_factory, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("repfuzz")
    texts = [" ".join(t) for t in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from neomarket_clickhouse_indexer_spark.queries.pipeline import (
        docs_repetition_signals,
    )

    got = {
        r["doc_id"]: r.asDict()
        for r in docs_repetition_signals(spark, str(d)).collect()
    }
    for i, toks in enumerate(docs):
        want = _py_signals(toks)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i], want)
