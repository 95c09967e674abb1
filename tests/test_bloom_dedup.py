"""Bloom-filter pre-filter invariants (docs_bloom_dedup):

1. ZERO false negatives, structurally — every true member's k bit
   positions are by construction in the filter, so a bloom-negative doc
   is definitely new. This is the property that makes the broadcast
   pre-filter SAFE at 100 TB (a false negative would silently drop a
   duplicate); pinned on a planted corpus AND at the sf0.001 gate.
2. False positives POPULATED at the gate SFs — the gate's evidence must
   not be the empty set (the multimodal_image_patches lesson, r14
   verdict): with m = 6 bits/element and k = 4 the measured FP counts
   are 17 (sf0.001) / 8 (sf0.01) / 144 (sf0.1), ~3-6%% rates.
3. The register state is a pure function of the member set: block
   set-bit totals == |distinct positions|, every position in [0, m).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.documents import (
    BLOOM_BITS_PER_ELEM,
    BLOOM_K,
    _bloom_pos_exprs,
    docs_bloom_dedup,
)

SF0001 = "/root/testdata/sf0.001"


def _positions(thash: str, m: int) -> list[int]:
    return [
        int(hashlib.md5(f"bloom{i}:{thash}".encode()).hexdigest()[:8], 16)
        % m
        for i in range(BLOOM_K)
    ]


def test_planted_no_false_negatives_and_positions_match(spark):
    # planted corpus: 40 member texts, 10 probe texts duplicating
    # members (true members by content hash) + 30 novel probes
    member_texts = [f"member doc {i} body" for i in range(40)]
    dup_probes = member_texts[::4]  # 10 exact duplicates
    novel = [f"novel doc {i} body" for i in range(30)]
    m = max(64, BLOOM_BITS_PER_ELEM * len(member_texts))

    df = spark.createDataFrame(
        [(t,) for t in member_texts], "text string"
    ).select(F.md5("text").alias("thash"))
    got = {
        r["pos"]
        for r in df.select(F.explode(_bloom_pos_exprs(m)).alias("pos"))
        .distinct()
        .collect()
    }
    want = set()
    for t in member_texts:
        th = hashlib.md5(t.encode()).hexdigest()
        want.update(_positions(th, m))
    assert got == want  # Spark position exprs == the pure-python defn
    assert all(0 <= p < m for p in got)

    # every duplicate probe must be bloom-positive (no false negatives)
    for t in dup_probes:
        th = hashlib.md5(t.encode()).hexdigest()
        assert set(_positions(th, m)) <= got
    # and the planted-novel FP rate is sane (not all-positive filter)
    fp = sum(
        1
        for t in novel
        if set(
            _positions(hashlib.md5(t.encode()).hexdigest(), m)
        ) <= got
    )
    assert fp < len(novel)  # the filter rejects at least one novel doc


def test_gate_audit_invariants_sf0001(spark):
    rows = docs_bloom_dedup(spark, SF0001).collect()
    by = {(r["sect"], r["key"]): r["val"] for r in rows}
    m = by[("param", "m_bits")]
    n_members = by[("param", "n_member_docs")]
    assert m == max(64, BLOOM_BITS_PER_ELEM * n_members)

    # block totals == |set bits| <= min(m, k * members)
    set_bits = sum(v for (s, _), v in by.items() if s == "block")
    assert 0 < set_bits <= min(m, BLOOM_K * n_members)

    fn = sum(
        v for (s, k), v in by.items()
        if s == "audit" and k.endswith(":n_false_neg")
    )
    assert fn == 0  # the structural guarantee
    fp = sum(
        v for (s, k), v in by.items()
        if s == "audit" and k.endswith(":n_false_pos")
    )
    assert fp > 0  # populated evidence at the gate SF
    # bloom positives == true members + false positives, per the flags
    tp = sum(
        v for (s, k), v in by.items()
        if s == "audit" and k.endswith(":n_true_member")
    )
    bp = sum(
        v for (s, k), v in by.items()
        if s == "audit" and k.endswith(":n_bloom_pos")
    )
    assert bp == tp + fp
