"""Streaming == batch: the incremental candle state after streaming all
events in microbatches must equal the one-shot batch aggregation (ST1-ST4;
idempotence under replay = ST2 reorg tolerance).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.operators.candles import finalize, ohlcv
from neomarket_clickhouse_indexer_spark.sources.tables import load_table
from neomarket_clickhouse_indexer_spark.streaming.incremental import (
    incremental_candles_stream,
    merge_candle_states,
    read_candle_state,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _final(df):
    return (
        finalize(df.drop("bucket_date"))
        .orderBy("key", "bucket")
        .toPandas()
    )


def test_streaming_candles_equal_batch(spark, tmpdir):
    ev = load_table(spark, SF_SMOKE, "events")

    # stage the events as 4 parquet chunks for the file stream source
    src_dir = os.path.join(tmpdir, "src")
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).write.mode(
            "append" if i else "overwrite"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)  # force multiple microbatches
        .parquet(src_dir)
    )
    state_dir = os.path.join(tmpdir, "state")
    q = incremental_candles_stream(
        stream, state_dir, os.path.join(tmpdir, "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    got = _final(read_candle_state(spark, state_dir))
    want = _final(
        ohlcv(ev, key="event_type", ts="ts", price="value", ord_col="event_id")
    )
    assert got.equals(want), "incremental state diverges from batch aggregation"


def test_merge_is_idempotent_under_replay(spark, tmpdir):
    """Replaying the same batch (reorg / at-least-once delivery) must not
    change the merged state: min/max/min_by/max_by absorb duplicates of the
    same partials; volume/trades would double-count — which is exactly why
    the sink overwrites affected partitions instead of appending."""
    ev = load_table(spark, SF_SMOKE, "events")
    partials = ohlcv(ev, key="event_type", ts="ts", price="value", ord_col="event_id")
    once = merge_candle_states(partials.withColumn("bucket_date", F.to_date("bucket")))
    # partition-overwrite semantics: re-folding the same delta over the
    # already-merged state replaces those buckets with identical content
    again = merge_candle_states(once)
    assert _final(once).equals(_final(again))
