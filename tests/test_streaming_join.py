"""Watermarked stream-stream inner join == the equivalent batch join.

views ⋈ purchases within a 1-hour event-time bound, both sides real
file-source streams consumed chunk-by-chunk (maxFilesPerTrigger=1) with
watermarks — the Structured Streaming feature the engine's streaming tier
would use for cross-stream enrichment at scale (state bounded by the
watermark horizon, not history)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_stream_stream_join_equals_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # watermarks require TIMESTAMP (LTZ), not the loader's NTZ — cast is
    # fine here because stream and batch compare within one session
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").cast("timestamp").alias("vts"),
        F.col("event_id").alias("v_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("pts"),
        F.col("event_id").alias("p_id"),
    )

    cond = (
        "v_user = p_user AND pts > vts AND pts <= vts + INTERVAL 1 HOUR"
    )
    batch = views.join(purchases, F.expr(cond)).select("v_id", "p_id")
    expected = {(r.v_id, r.p_id) for r in batch.collect()}
    assert expected, "fixture must produce at least one joined pair"

    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purchases")
    for frame, out in ((views, vdir), (purchases, pdir)):
        mid = frame.approxQuantile(frame.columns[2], [0.5], 0.0)[0]
        frame.filter(F.col(frame.columns[2]) <= mid).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)
        frame.filter(F.col(frame.columns[2]) > mid).coalesce(1).write.mode(
            "append"
        ).parquet(out)

    vs = (
        spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vdir)
        .withWatermark("vts", "1 hour")
    )
    ps = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
        .withWatermark("pts", "1 hour")
    )
    joined = vs.join(ps, F.expr(cond)).select("v_id", "p_id")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName("ssj_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {(r.v_id, r.p_id) for r in spark.table("ssj_out").collect()}
    assert got == expected
