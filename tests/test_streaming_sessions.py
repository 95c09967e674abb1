"""Streaming sessionization (ST5/ST6 depth): the SAME session_window
expression used by the batch ``user_sessions`` gate, run under readStream
with a watermark — sessions finalize (append mode) once the watermark
passes their end, late events within the watermark merge sessions, and the
streamed result equals the batch computation over the union of batches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

GAP = "30 minutes"


def _sessionize(df):
    return (
        df.groupBy("user", F.session_window("ts", GAP).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double").alias("vol"),
        )
        .select("user", F.col("sw.start").alias("s"), "n", "vol")
    )


def test_streaming_sessions_match_batch(spark, tmp_path):
    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, user string, value double"

    # batch 1: two separate bursts for user a (gap > 30min between them)
    b1 = [
        (T0 + dt.timedelta(minutes=0), "a", 1.0),
        (T0 + dt.timedelta(minutes=10), "a", 2.0),
        (T0 + dt.timedelta(minutes=90), "a", 4.0),
    ]
    # batch 2: an event between the bursts that MERGES them (15:00 is
    # within 30min of both 10:00 and... no — 15:00..90:00 is 75min, so it
    # extends burst 1 only), plus a watermark driver far ahead
    b2 = [
        (T0 + dt.timedelta(minutes=15), "a", 8.0),
        (T0 + dt.timedelta(hours=6), "z", 0.5),
    ]

    src = str(tmp_path / "src")

    def run_round():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            _sessionize(stream.withWatermark("ts", "2 hours"))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    run_round()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    run_round()

    streamed = {
        (r["user"], r["s"]): (r["n"], r["vol"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
        if r["user"] == "a"
    }
    batch = {
        (r["user"], r["s"]): (r["n"], r["vol"])
        for r in _sessionize(
            spark.createDataFrame(b1 + b2, schema)
        ).collect()
        if r["user"] == "a"
    }
    # the streamed append-mode output over both rounds must equal the batch
    # sessionization of all data: burst 1 absorbed the 15:00 event (n=3),
    # burst 2 stays separate (n=1)
    assert streamed == batch, (streamed, batch)
    assert batch[("a", T0)] == (3, 11.0), batch
    assert batch[("a", T0 + dt.timedelta(minutes=90))] == (1, 4.0), batch
