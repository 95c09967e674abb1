"""Winnowing pins (r12): the driver gate hashes the deterministic
fingerprint table + pairs; THIS file pins the paper's guarantees
(Schleimer, Wilkerson & Aiken, SIGMOD'03):

1. SHARED-SUBSTRING GUARANTEE: two documents sharing a substring of
   length >= w + k - 1 chars share at least one fingerprint HASH.
2. DENSITY: the winnowed set is ~2/(w+1) of the gram positions
   (paper §4's expected density for random hashes).
3. LOCAL WINDOW COVERAGE: every window of w consecutive grams
   contains at least one selected position (the definition).
"""

import hashlib

from neomarket_clickhouse_indexer_spark.queries.documents import (
    WIN_K,
    WIN_W,
    winnow_frame,
)


def _stream_text(tag: str, n: int) -> str:
    out = ""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}-{i}".encode()).hexdigest()
        i += 1
    return out[:n]


def test_guarantee_density_and_coverage(spark):
    shared = _stream_text("shared", WIN_W + WIN_K - 1)  # exactly w+k-1
    doc0 = _stream_text("a", 150) + shared + _stream_text("a2", 150)
    doc1 = _stream_text("b", 50) + shared + _stream_text("b2", 250)
    doc2 = _stream_text("c", len(doc0))  # unrelated
    df = spark.createDataFrame(
        [(0, doc0), (1, doc1), (2, doc2)], "doc_id long, text string"
    )
    rows = winnow_frame(df).collect()
    fps = {}
    for r in rows:
        if r["part"] == "fp":
            fps.setdefault(r["a"], set()).add((r["b"], r["c"]))
    # 1. guarantee: docs 0 and 1 share >= 1 fingerprint hash
    h0 = {gk for _p, gk in fps[0]}
    h1 = {gk for _p, gk in fps[1]}
    h2 = {gk for _p, gk in fps[2]}
    assert h0 & h1, "w+k-1 shared substring must share a fingerprint"
    # the unrelated doc shares nothing (hex-stream grams are unique)
    assert not (h0 & h2) and not (h1 & h2)
    # 2. density ~ 2/(w+1): allow a wide band
    for d, f in fps.items():
        n_grams = (len((doc0, doc1, doc2)[d]) - WIN_K + 1)
        dens = len(f) / n_grams
        assert 1.0 / WIN_W <= dens <= 4.0 / WIN_W, (d, dens)
    # 3. every full window contains a selected position
    for d, f in fps.items():
        pos = sorted(p for p, _gk in f)
        n_grams = (len((doc0, doc1, doc2)[d]) - WIN_K + 1)
        prev = 0
        for p in pos:
            assert p - prev <= WIN_W, (d, prev, p)
            prev = p
        assert n_grams - prev < WIN_W, (d, prev, n_grams)


def test_common_fingerprint_cap_and_short_docs(spark):
    """MOSS's common-fingerprint rule (r12 verdict task 3): a gk whose
    document frequency exceeds WIN_DF_CAP is boilerplate and must not
    produce pairs — plant one hot shared block across WIN_DF_CAP + 4
    docs and assert zero pairs; a rare block across 2 docs still pairs.
    Also pins the short-doc guard: docs under WIN_K chars contribute
    no grams (Spark sequence(1, 0) would otherwise emit [1, 0])."""
    from neomarket_clickhouse_indexer_spark.queries.documents import (
        WIN_DF_CAP,
        WIN_MIN_SHARED,
    )

    # a hot block long enough to guarantee >= WIN_MIN_SHARED shared
    # fingerprints per doc pair (MIN_SHARED windows of w grams each)
    block_len = (WIN_MIN_SHARED + 1) * WIN_W + WIN_K - 1
    hot = _stream_text("hot", block_len)
    rare = _stream_text("rare", block_len)
    rows = []
    n_hot = WIN_DF_CAP + 4
    for d in range(n_hot):
        rows.append((d, _stream_text(f"u{d}", 40) + hot))
    rows.append((1000, _stream_text("x", 40) + rare))
    rows.append((1001, _stream_text("y", 40) + rare))
    rows.append((2000, "ab"))  # shorter than WIN_K: zero grams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_frame(df).collect()
    pairs = {
        (r["a"], r["b"]) for r in out if r["part"] == "pair"
    }
    fp_docs = {r["a"] for r in out if r["part"] == "fp"}
    assert (1000, 1001) in pairs, "rare shared block must still pair"
    hot_pairs = [p for p in pairs if p[0] < n_hot and p[1] < n_hot]
    assert not hot_pairs, f"capped gk must not pair: {hot_pairs[:5]}"
    # fp rows are unaffected by the cap (per-doc selection) ...
    assert set(range(n_hot)) <= fp_docs
    # ... and the sub-WIN_K doc emits nothing at all
    assert 2000 not in fp_docs
