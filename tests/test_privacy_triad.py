"""Mechanism tests for the privacy triad (docs_k_anonymity) on PLANTED
corpora, run through the DuckDB oracle (pure SQL — no Spark session):
the differential proves Spark == oracle, these prove the oracle computes
the RIGHT thing.

- a group whose sensitive distribution mirrors the corpus has
  t_closeness_ppm == 0 (the skewness metric's zero point);
- a homogeneous group in a mixed corpus has sens_mode_ppm == 1_000_000,
  l_distinct == 1, and strictly positive t_closeness_ppm;
- the generalization ladder assigns level 0 to >=K groups and level 4
  only when even the source total is < K.

The sensitive label is md5-derived, so the planted corpora pick doc_ids
by their actual 'sens:' draw (computed here with hashlib — the same
definition, independently implemented).
"""

from __future__ import annotations

import hashlib

import duckdb

from neomarket_clickhouse_indexer_spark.queries.pipeline import (
    DOCS_K_ANONYMITY_SQL,
    KANON_K,
)


def _sens(doc_id: int) -> int:
    return int(hashlib.md5(f"sens:{doc_id}".encode()).hexdigest()[0], 16) % 8


def _run(rows: list[tuple[int, str, str, int]]):
    """rows: (doc_id, source, lang, n_chars)"""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, 'x', ?, ?, ?)",
        [(d, lang, src, nc) for d, src, lang, nc in rows],
    )
    df = con.execute(DOCS_K_ANONYMITY_SQL).df()
    return {
        (r["source"], r["lang"], r["len_bucket"]): r
        for _, r in df.iterrows()
    }


def _ids_by_sens(want: int, n: int, start: int = 0) -> list[int]:
    out, i = [], start
    while len(out) < n:
        if _sens(i) == want:
            out.append(i)
        i += 1
    return out


def test_mirror_group_has_zero_t_closeness():
    # one group == the whole corpus → its CDF IS the corpus CDF
    rows = [(i, "s", "en", 10) for i in range(40)]
    got = _run(rows)
    assert set(got) == {("s", "en", 0)}
    r = got[("s", "en", 0)]
    assert r["t_closeness_ppm"] == 0
    assert r["anon_level"] == 0 and r["group_size"] == 40


def test_homogeneous_group_flags_all_three_attacks():
    # group A: 8 docs all with sens class 3 (homogeneous, len bucket 0);
    # group B: 32 mixed docs (len bucket 2) diluting the corpus CDF
    a = _ids_by_sens(3, 8)
    b = [i for i in range(10_000, 10_100)][:32]
    rows = [(i, "s", "en", 10) for i in a] + [
        (i, "s", "en", 140) for i in b
    ]
    got = _run(rows)
    ra = got[("s", "en", 0)]
    assert ra["l_distinct"] == 1
    assert ra["sens_mode_ppm"] == 1_000_000
    assert ra["t_closeness_ppm"] > 0
    assert ra["anon_level"] == 0  # 8 >= K: anonymous but skew-leaky


def test_ladder_levels():
    # 2-doc group in a 2-doc (source, lang): climbs to the source level
    # only if the source has >= K docs; else suppress (level 4)
    rows = [(1, "s", "en", 10), (2, "s", "en", 10)]
    got = _run(rows)
    assert got[("s", "en", 0)]["anon_level"] == 4  # source total 2 < K
    rows += [(i, "s", "fr", 500) for i in range(100, 100 + KANON_K)]
    got = _run(rows)
    # the source now holds 2 + K docs → the small group clears at lvl 3
    assert got[("s", "en", 0)]["anon_level"] == 3
    assert got[("s", "fr", 500 // 64)]["anon_level"] == 0
