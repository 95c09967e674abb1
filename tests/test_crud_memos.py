"""Whole-result CRUD memo-key semantics (r14): layer-0 keys COLLIDE
with flat keys on purpose (one session pays the dominant build once
across knn_nsw_* and knn_hnsw_* gates), distinct dead draws get
distinct keys, and custom append draws are refused under memoization
(the r13 ADVICE-A rule). A key mistake here silently serves one
population's adjacency to another gate, so the identities are pinned."""

from __future__ import annotations

import pytest

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    HNSW_BUCKETINGS,
    HNSW_ROUNDS,
    _hnsw_level_pred,
    _nsw_upd_pred,
    nsw_delete_frame,
    nsw_incremental_frame,
    nsw_reembed_frame,
)
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_layer0_reembed_memo_collides_with_flat(spark):
    emb = load_table(spark, SF, "embeddings")
    flat = nsw_reembed_frame(emb, memo_sf=SF)
    # layer 0 of the layered gate: lit(True) population, identical
    # sizing — must return the SAME memoized frame object
    lvl0 = nsw_reembed_frame(
        emb,
        memo_sf=SF,
        bucketings=HNSW_BUCKETINGS[0],
        node_pred=_hnsw_level_pred(0),
        rounds=HNSW_ROUNDS[0],
        pop_tag="corpus",
    )
    assert lvl0 is flat


def test_delete_memo_separates_dead_draws(spark):
    emb = load_table(spark, SF, "embeddings")
    d_del = nsw_delete_frame(emb, memo_sf=SF)  # dead_tag 'del'
    d_upd = nsw_delete_frame(emb, memo_sf=SF, dead_pred=_nsw_upd_pred)
    assert d_del is not d_upd  # 'upd' draw must not read the 'del' key
    # and each key is itself stable
    assert nsw_delete_frame(emb, memo_sf=SF) is d_del
    assert (
        nsw_delete_frame(emb, memo_sf=SF, dead_pred=_nsw_upd_pred) is d_upd
    )


def test_delete_memo_skips_unknown_dead_pred(spark):
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")

    def custom(col):
        return F.substring(F.md5(col.cast("string")), 3, 1) == "f"

    a = nsw_delete_frame(emb, memo_sf=SF, dead_pred=custom)
    b = nsw_delete_frame(emb, memo_sf=SF, dead_pred=custom)
    assert a is not b  # unknown draw -> no whole-result memo


def test_incremental_memo_refuses_custom_new_pred(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError):
        nsw_incremental_frame(emb, memo_sf=SF, new_pred=_nsw_upd_pred)


def test_node_pred_guard_refuses_corpus_poisoning(spark):
    # r15 (r14 ADVICE-C, mirrored to all three frames): a custom node
    # population under the default 'corpus' pop_tag would silently read
    # or poison the flat gate's whole-result memo — refused up front.
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    custom = (F.col("vec_id") % 2) == 0
    for fn in (nsw_reembed_frame, nsw_incremental_frame, nsw_delete_frame):
        with pytest.raises(ValueError):
            fn(emb, memo_sf=SF, node_pred=custom)


def test_incremental_prebuilt_base_escapes_new_pred_guard(spark):
    # r15 (r14 ADVICE-B): memo_sf + custom new_pred IS allowed when
    # prebuilt_base is supplied — the whole-result memo is already
    # skipped then, so the documented escape hatch must not raise.
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings").limit(64)
    base = emb.limit(0).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.lit(1).cast("long").alias("rank"),
        F.lit(0.0).alias("cosine_sim"),
    )
    out = nsw_incremental_frame(
        emb, memo_sf=SF, prebuilt_base=base, new_pred=_nsw_upd_pred
    )
    assert {"query_id", "neighbor_id", "rank", "cosine_sim"} <= set(
        out.columns
    )
