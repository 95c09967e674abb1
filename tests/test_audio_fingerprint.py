"""Audio constellation fingerprint pins (r12, the pHash audio sibling):
the driver gate hashes the deterministic hash table + voted matches;
THIS file pins the matching property — two payloads sharing a long
PCM segment at DIFFERENT absolute positions must match at exactly the
planting offset, and unrelated payloads must not vote past the
threshold at any offset.
"""

import hashlib

from neomarket_clickhouse_indexer_spark.queries.multimodal_q import (
    AFP_MIN_VOTES,
    AFP_WINDOW,
    audio_fingerprint_frame,
)


def _stream(tag: str, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}-{i}".encode()).digest()
        i += 1
    return out[:n]


def test_planted_shared_segment_matches_at_offset(spark):
    shared = _stream("shared", 8 * AFP_WINDOW)  # 8 full windows
    # doc 0: 2 windows of its own, then the shared run
    pay0 = _stream("a", 2 * AFP_WINDOW) + shared
    # doc 1: 5 windows of its own, then the shared run (offset -3)
    pay1 = _stream("b", 5 * AFP_WINDOW) + shared
    # doc 2: unrelated noise of the same length
    pay2 = _stream("c", len(pay1))
    df = spark.createDataFrame(
        [(0, bytearray(pay0)), (1, bytearray(pay1)), (2, bytearray(pay2))],
        "doc_id long, payload binary",
    )
    rows = audio_fingerprint_frame(df).collect()
    matches = {
        (r["a"], r["b"], r["c"]): r["v"]
        for r in rows
        if r["part"] == "match"
    }
    # the shared run aligns doc0's window w with doc1's window w+3:
    # offset = w0 - w1 = -3; 8 shared windows give 7+6+5 = 18 in-run
    # hash pairs, well past the vote threshold
    assert (0, 1, -3) in matches, matches
    assert matches[(0, 1, -3)] >= AFP_MIN_VOTES
    # no unrelated pair reaches the threshold
    assert not any(2 in (a, b) for (a, b, _o) in matches), matches
    # hash rows exist for every doc with >= 1 window pair
    hash_docs = {r["a"] for r in rows if r["part"] == "hash"}
    assert hash_docs == {0, 1, 2}
