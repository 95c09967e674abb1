"""Streaming session windows == batch session windows.

The batch sessionization gate (user_sessions) runs session_window as a
batch aggregation; these tests drive the SAME native session_window
through a real watermarked Structured Streaming query over a chunked
file source (maxFilesPerTrigger=1, availableNow) — the ST5 streaming
form, from two angles:

1. complete-mode equivalence over the sf0.001 fixture: session state
   merges across microbatches and the final state equals the batch
   answer exactly (count, bounds, per-session event counts). In
   complete mode the watermark neither finalizes nor evicts — this
   checks the merge half of the contract at fixture scale.
2. append-mode finalization over a planted corpus: a later-chunk event
   bridges two earlier bursts into ONE session (cross-microbatch state
   merge), and sessions are emitted only once the watermark passes
   their close — a still-open trailing session is NOT emitted
   (watermark-driven finalization + eviction, the half complete mode
   cannot observe; restores the pre-r6 coverage ADVICE flagged)."""

from __future__ import annotations

import datetime
import glob
import os
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


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_streaming_sessions_append_watermark_finalizes(spark, tmp_path):
    """Append mode: a chunk-2 event at 00:35 bridges user 1's 00:00-00:10
    burst and its 01:00 event into ONE merged session (state merge across
    microbatches); the chunk-3 sentinel at 05:00 advances the watermark
    past that session's close so it is emitted, while the sentinel's own
    still-open session (end 05:30 > watermark 05:00) is NOT."""
    schema = "user_id bigint, ts timestamp"
    chunks = [
        [(1, _ts("2024-01-01 00:00:00")), (1, _ts("2024-01-01 00:10:00"))],
        [(1, _ts("2024-01-01 00:35:00")), (1, _ts("2024-01-01 01:00:00"))],
        [(2, _ts("2024-01-01 05:00:00"))],
    ]
    src = str(tmp_path / "asrc")
    os.makedirs(src)
    # FileStreamSource orders files by mtime (oldest first); force
    # strictly increasing mtimes so batch order == chunk order
    # (timeseries_q streaming staging discipline).
    t_base = 1_700_000_000
    for i, rows in enumerate(chunks):
        stage = str(tmp_path / f"astage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"chunk-{i:03d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t_base + i, t_base + i))
        shutil.rmtree(stage, ignore_errors=True)

    stream = (
        spark.readStream.schema(schema)
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
    try:
        q = (
            sess.writeStream.format("memory")
            .queryName("sess_append_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ackpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.user_id, r.s, r.e, r.n_events)
            for r in spark.sql("SELECT * FROM sess_append_out").collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # the bridged session: 00:00 .. (01:00 + 30m gap) with all 4 events
    assert got == {
        (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:30:00"), 4)
    }, got
