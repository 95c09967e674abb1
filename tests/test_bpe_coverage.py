"""Planted differential for docs_bpe_vocab_coverage: the fixture corpus
shares one charset across the split (true-OOV is legitimately 0 there),
so this plants a held-out-only character and checks the OOV path fires —
Spark vs the recursive-automaton DuckDB oracle on the same parquet, plus
a hand-computed expectation for the planted source."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest


def _held(doc_id: int) -> bool:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[0] in "012"


@pytest.fixture()
def planted_dir(tmp_path):
    train_ids = [i for i in range(200) if not _held(i)][:6]
    held_ids = [i for i in range(200) if _held(i)][:2]
    rows = []
    # training corpus: chars {a,b,c, space}; long repetitive words so 5
    # merge iterations always find a pair
    for j, i in enumerate(train_ids):
        rows.append((i, ["ababab bcbcbc", "cacaca ababab", "bcbcbc cacaca"][j % 3], "en", "srcT"))
    # held-out: one doc reuses training chars, one plants 'q' (never in
    # training -> every 'q' symbol is true-OOV)
    rows.append((held_ids[0], "ababab cacaca", "en", "srcH"))
    rows.append((held_ids[1], "qq ababab", "en", "srcQ"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    path = tmp_path / "documents.parquet"
    df.to_parquet(path)
    return str(tmp_path)


def test_planted_oov_fires_and_matches_oracle(spark, planted_dir):
    from neomarket_clickhouse_indexer_spark.queries.pipeline import (
        DOCS_BPE_VOCAB_COVERAGE_SQL,
        docs_bpe_vocab_coverage,
    )

    got = {
        r.source: r.asDict()
        for r in docs_bpe_vocab_coverage(spark, planted_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    want = con.execute(DOCS_BPE_VOCAB_COVERAGE_SQL).df()
    assert set(got) == set(want["source"])
    for _, w in want.iterrows():
        g = got[w["source"]]
        for col in (
            "n_docs", "n_words", "n_chars", "n_tokens",
            "oov_ppm", "merged_ppm", "bytes_per_token_milli",
        ):
            assert g[col] == w[col], (w["source"], col, g[col], w[col])
    # the planted source's 'qq' word: both q symbols are unseen chars
    assert got["srcQ"]["oov_ppm"] > 0
    assert got["srcH"]["oov_ppm"] == 0
