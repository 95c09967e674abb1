"""The LSH skew guard must actually fire: a hot band bucket (boilerplate
duplicated past BAND_BUCKET_CAP) is dropped from the candidate join while
genuine near-dup pairs in healthy buckets survive. Without the cap one hot
key contributes B(B-1)/2 pairs and the self-join goes quadratic at corpus
scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.documents import (
    BAND_BUCKET_CAP,
    _bands_of,
    _pairs_from_bands,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_hot_bucket_dropped_healthy_pairs_survive(spark):
    boiler = "the same boilerplate text repeated in every scraped page footer"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    n_hot = BAND_BUCKET_CAP + 8
    rows = [(i, boiler) for i in range(n_hot)]
    rows += [(1000, near_a), (1001, near_b)]
    pairs = _pairs_from_bands(_bands_of(_docs(spark, rows))).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # identical boilerplate docs share every band -> bucket size n_hot > cap
    # -> dropped entirely (exact duplicates are DD1's job, not LSH's)
    assert all(a >= 1000 for a, _ in got), got
    # the genuine near-dup pair shares at least one healthy bucket
    assert (1000, 1001) in got, got


def test_cap_inactive_below_threshold(spark):
    boiler = "the same boilerplate text repeated in every scraped page footer"
    rows = [(i, boiler) for i in range(3)]
    pairs = _pairs_from_bands(_bands_of(_docs(spark, rows))).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2)}, got
