"""Planted-corpus cases for docs_chunk_dedup_rewrite (C4/RefinedWeb
duplicate-chunk removal with reassembly) and a planted-rank case for
events_quantile_select (exact order-statistic selection), plus the
append==rebuild invariant for knn_ivf_incremental — all driven through a
tmp sf_dir so the tests exercise the real load_table path."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_chunk_dedup_rewrite_planted(spark, tmp_path):
    from neomarket_clickhouse_indexer_spark.queries.documents import (
        CHUNK_W,
        docs_chunk_dedup_rewrite,
    )

    assert CHUNK_W == 8
    a = " ".join(f"a{i}" for i in range(8))  # chunk A
    b = " ".join(f"b{i}" for i in range(8))  # chunk B
    c = " ".join(f"c{i}" for i in range(8))  # chunk C
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{a} {b}"),  # owns A and B
            (2, f"{a} {b}"),  # exact copy -> everything dropped
            (3, f"{a} {c}"),  # A is a dup (doc 1 wins), C survives
            (4, "x0 x1 x2"),  # short doc: one 3-word chunk, unique
        ],
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.text_rewritten)
        for r in docs_chunk_dedup_rewrite(spark, sf).collect()
    }
    assert got[1] == (2, 2, f"{a} {b}")
    assert got[2] == (2, 0, "")  # emptied, but still present in output
    assert got[3] == (2, 1, c)
    assert got[4] == (1, 1, "x0 x1 x2")


def test_chunk_dedup_keep_first_is_position_ordered(spark, tmp_path):
    """The winner is the minimal (doc_id, chunk_idx) — a duplicate later
    INSIDE the same winning document is dropped too."""
    from neomarket_clickhouse_indexer_spark.queries.documents import (
        docs_chunk_dedup_rewrite,
    )

    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    sf = _write_docs(spark, tmp_path, [(7, f"{a} {a} {b}")])
    (row,) = docs_chunk_dedup_rewrite(spark, sf).collect()
    assert (row.n_chunks, row.n_kept) == (3, 2)
    assert row.text_rewritten == f"{a} {b}"


def test_quantile_select_planted_ranks(spark, tmp_path):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        events_quantile_select,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "view", i / 100.0, "{}")
        for i in range(1, 101)  # cents 1..100, n = 100
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.q_pct: (r.n, r.k, r.value_cents)
        for r in events_quantile_select(spark, str(tmp_path)).collect()
    }
    # k = (n-1)*q DIV 100 + 1 over cents 1..100: rank k selects value k
    assert got == {50: (100, 50, 50), 90: (100, 90, 90), 99: (100, 99, 99)}


def test_ivf_incremental_equals_direct_rebuild(spark):
    """append(batch assignment) over the persisted base table must equal
    assigning the WHOLE corpus against the same frozen codebook in one
    pass — Spark-side rebuild differential (the oracle re-proves it in
    DuckDB; this pins the staging/append plumbing specifically)."""
    from neomarket_clickhouse_indexer_spark.functions import vectors as VX
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        N_QUERIES,
        _centroids_of,
        knn_ivf_incremental,
    )
    from neomarket_clickhouse_indexer_spark.sources.tables import load_table
    from pyspark.sql import Window

    sf = "/root/testdata/sf0.001"
    got = {
        r.vec_id: (r.cell, r.cell_sim)
        for r in knn_ivf_incremental(spark, sf).collect()
    }
    emb = load_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    base = corpus.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 4)
    cents = _centroids_of(base)
    scored = (
        corpus.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            F.col("label").cast("long").alias("cell"),
            VX.cosine_rounded(F.col("embedding"), F.col("centroid"), 6).alias(
                "cell_sim"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    want = {
        r.vec_id: (r.cell, r.cell_sim)
        for r in scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .collect()
    }
    assert got == want
    # every cell comes from the base-trained codebook
    base_labels = {r.label for r in base.select("label").distinct().collect()}
    assert {c for c, _ in got.values()} <= base_labels
