"""OPQ rotation mechanism pins (knn_opq_adc) — the r11 IVFPQ lesson:
pin the MECHANISM, never a fixture win. (1) the inlined sign literals
match their md5 derivation; (2) the Spark FWHT butterfly equals the
direct H[u][x] = (-1)^popcount(u&x) definition bit-for-bit; (3) the
transform round-trips exactly in integers (H·H = 64·I); (4) the scaled
rotation is orthogonal: rotated pair distances match quantized-original
distances to float tolerance."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    DIM,
    _OPQ_SCALE,
    _OPQ_SIGNS,
    _opq_rotate,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

_H = np.array(
    [
        [1 if bin(u & x).count("1") % 2 == 0 else -1 for x in range(DIM)]
        for u in range(DIM)
    ],
    dtype=np.int64,
)


def _svu(vec) -> np.ndarray:
    return np.array(
        [
            s * math.floor(float(v) * 1_000_000 + 0.5)
            for v, s in zip(vec, _OPQ_SIGNS)
        ],
        dtype=np.int64,
    )


def test_sign_literals_match_md5_derivation():
    want = [
        1
        if hashlib.md5(f"dim-{x}".encode()).hexdigest()[0] in "01234567"
        else -1
        for x in range(1, DIM + 1)
    ]
    assert _OPQ_SIGNS == want
    # both signs actually occur (a constant table would be a no-op flip)
    assert 1 in _OPQ_SIGNS and -1 in _OPQ_SIGNS


def test_butterfly_matches_direct_definition(spark):
    emb = load_table(spark, SF, "embeddings").limit(20)
    rows = {
        r["vec_id"]: r["rotated"]
        for r in _opq_rotate(emb)
        .withColumnRenamed("embedding", "rotated")
        .join(emb, "vec_id")
        .collect()
    }
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert rows
    for vid, rot in rows.items():
        r_direct = _H @ _svu(orig[vid])
        want = [float(x) / float(_OPQ_SCALE * 1_000_000) for x in r_direct]
        assert list(rot) == want  # bit-identical doubles


def test_roundtrip_integer_exact(spark):
    emb = load_table(spark, SF, "embeddings").limit(8).collect()
    for r in emb:
        s = _svu(r["embedding"])
        assert np.array_equal(_H @ (_H @ s), DIM * s)


def test_rotation_preserves_distances(spark):
    emb = load_table(spark, SF, "embeddings").limit(10)
    rot = {
        r["vec_id"]: np.array(r["embedding"])
        for r in _opq_rotate(emb).collect()
    }
    quant = {
        r["vec_id"]: _svu(r["embedding"]).astype(np.float64)
        * np.array(_OPQ_SIGNS, dtype=np.float64)  # undo the sign flip
        / 1e6
        for r in emb.collect()
    }
    ids = sorted(rot)
    assert len(ids) == 10
    for i in ids[:5]:
        for j in ids[5:]:
            d_rot = float(np.sum((rot[i] - rot[j]) ** 2))
            d_q = float(np.sum((quant[i] - quant[j]) ** 2))
            assert abs(d_rot - d_q) <= 1e-6 * max(1.0, d_q)
