"""Streaming session windows == batch session windows.

The batch sessionization gate (user_sessions) runs session_window as a
batch aggregation; this test drives the SAME native session_window
through a real watermarked Structured Streaming query over a chunked
file source (maxFilesPerTrigger=1, availableNow) — the ST5 streaming
form: session state merges across microbatches and emits only when the
watermark passes a session's close. With a final watermark beyond the
fixture horizon, the emitted sessions must equal the batch answer
exactly (count, bounds, and per-session event counts)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
GAP = "30 minutes"


def _sessions_agg(df):
    return df.groupBy(
        "user_id", F.session_window("ts", GAP).alias("sw")
    ).agg(F.count(F.lit(1)).alias("n_events"))


def test_streaming_sessions_equal_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    batch = _sessions_agg(ev).select(
        "user_id",
        F.col("sw.start").alias("s"),
        F.col("sw.end").alias("e"),
        "n_events",
    )
    expected = {
        (r.user_id, r.s, r.e, r.n_events) for r in batch.collect()
    }
    assert expected, "fixture must produce sessions"

    # three chunks split on event_id (arrival order independent of event
    # time within the watermark-free availableNow replay)
    src = str(tmp_path / "src")
    qs = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    parts = [
        ev.filter(F.col("event_id") <= qs[0]),
        ev.filter((F.col("event_id") > qs[0]) & (F.col("event_id") <= qs[1])),
        ev.filter(F.col("event_id") > qs[1]),
    ]
    parts[0].coalesce(1).write.mode("overwrite").parquet(src)
    for p in parts[1:]:
        p.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "0 seconds")
    )
    sess = _sessions_agg(stream).select(
        "user_id",
        F.col("sw.start").alias("s"),
        F.col("sw.end").alias("e"),
        "n_events",
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    try:
        q = (
            sess.writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.user_id, r.s, r.e, r.n_events)
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert got == expected
