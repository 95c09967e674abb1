"""Multimodal plumbing (schemas/batch shapes over binary columns) and
keccak-256 / token-id derivation parity tests."""

from __future__ import annotations

import pytest

from neomarket_clickhouse_indexer_spark.functions.keccak import (
    keccak256,
    keccak256_hex,
    outcome_token_ids,
)
from neomarket_clickhouse_indexer_spark.multimodal import (
    extract_features,
    frame_sample,
    image_stats,
    synthesize_media,
)


# --- keccak (public test vectors; Ethereum variant, NOT FIPS SHA3) ---------


def test_keccak256_known_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block message (> 136-byte rate)
    assert keccak256(b"x" * 500) != keccak256(b"x" * 501)
    assert keccak256_hex(b"abc").startswith("0x4e03657a")


def test_outcome_token_ids_uint256_strings():
    ids = outcome_token_ids("0x" + "aa" * 20, "0x" + "11" * 32, 2)
    assert len(ids) == 2 and ids[0] != ids[1]
    for t in ids:
        v = int(t)  # decimal string of a uint256
        assert 0 < v < 2**256
    # deterministic
    assert ids == outcome_token_ids("0x" + "aa" * 20, "0x" + "11" * 32, 2)


# --- multimodal plumbing ---------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=30).cache()


def test_image_stats_batch_shape(spark, media):
    out = image_stats(media).toPandas()
    n_images = media.filter(media.kind == "image").count()
    assert len(out) == n_images
    assert set(out.columns) == {"media_id", "n_bytes", "mean_byte", "std_byte"}
    assert (out["n_bytes"] > 0).all()


def test_image_stats_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        image_stats(media, real_decode=True).collect()


def test_frame_sample_fanout(spark, media):
    frames = frame_sample(media, every_ms=1000).toPandas()
    videos = media.filter(media.kind == "video").select("media_id", "meta").collect()
    expected = sum(max(1, r["meta"]["duration_ms"] // 1000) for r in videos)
    assert len(frames) == expected
    assert (frames.groupby("media_id")["frame_idx"].min() == 0).all()
    assert frames["frame"].map(len).max() <= 256


def test_extract_features_plugs_into_vector_ops(spark, media):
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.functions import vectors as VX

    feats = extract_features(media)
    pdf = feats.toPandas()
    assert pdf["feature"].map(len).eq(16).all()
    assert (pdf["feature"].map(lambda v: all(0.0 <= x <= 1.0 for x in v))).all()
    # cosine self-similarity == 1 through the shared vector ops
    a = feats.select(F.col("media_id"), F.col("feature").alias("fa"))
    sim = a.select(VX.cosine_rounded(F.col("fa"), F.col("fa"), 6).alias("s")).toPandas()
    assert (sim["s"] == 1.0).all()


def test_neg_risk_id_bit_ops():
    from neomarket_clickhouse_indexer_spark.functions.keccak import (
        index_set_questions,
        neg_risk_market_id,
        neg_risk_question_id,
    )

    q7 = "0x" + "ab" * 31 + "07"
    market = neg_risk_market_id(q7)
    assert market.endswith("00") and market[2:-2] == "ab" * 31
    assert neg_risk_question_id(market, 7) == q7
    assert neg_risk_question_id(market, 0) == market
    assert index_set_questions(0b1011, 4) == [0, 1, 3]
    assert index_set_questions(0, 4) == []
    import pytest as _pt

    with _pt.raises(ValueError):
        neg_risk_question_id(market, 300)
