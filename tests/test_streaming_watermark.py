"""Watermarked windowed aggregation (ST2/ST5 upgrade path): event-time
tumbling windows with a late-data watermark — windows finalize (append
mode) only once the watermark passes, and data later than the watermark
is dropped rather than corrupting closed windows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_watermarked_window_agg_drops_late_data(spark, tmp_path):
    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, key string, value double"

    # batch 1: two windows of on-time data, plus a row far in the future
    # that advances the watermark past both
    b1 = [
        (T0 + dt.timedelta(minutes=0, seconds=10), "a", 1.0),
        (T0 + dt.timedelta(minutes=0, seconds=40), "a", 2.0),
        (T0 + dt.timedelta(minutes=1, seconds=10), "a", 4.0),
        (T0 + dt.timedelta(hours=3), "z", 0.5),  # watermark driver
    ]
    # batch 2: a VERY late row for the first (long-closed) window
    b2 = [(T0 + dt.timedelta(seconds=20), "a", 100.0)]

    src = str(tmp_path / "src")

    def run_round():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute").alias("w"), "key")
            .agg(
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double").alias("volume"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # round 1: on-time data + watermark driver → watermark persists in the
    # checkpoint at ~3h − 10min
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    run_round()
    # round 2: the very late row arrives after the watermark passed
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    run_round()

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {
        (r["key"], r["w"]["start"].minute): (r["volume"], r["n"])
        for r in out.collect()
        if r["key"] == "a"
    }
    # window 0 finalized from batch 1 only — the late row in batch 2 (2h55m
    # past the 10-minute watermark) must NOT appear
    assert rows[("a", 0)] == (3.0, 2), rows
    assert rows[("a", 1)] == (4.0, 1), rows
