"""Stateful streaming operator: final per-key state after streaming all
microbatches must equal the batch computation of the same semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.events import _fifo_input
from neomarket_clickhouse_indexer_spark.streaming.stateful import (
    running_positions_stream,
)

from .conftest import SF_SMOKE


def test_stateful_positions_match_batch(spark, tmp_path):
    inp = _fifo_input(spark, SF_SMOKE).select("key", "ts", "ord", "side", "qty", "price")

    # stage as ordered file chunks: state must accumulate across
    # microbatches; chunking by ord ranges keeps cross-batch time order
    src = str(tmp_path / "src")
    bounds = inp.approxQuantile("ord", [0.33, 0.66], 0.0)
    c0 = inp.filter(F.col("ord") <= bounds[0])
    c1 = inp.filter((F.col("ord") > bounds[0]) & (F.col("ord") <= bounds[1]))
    c2 = inp.filter(F.col("ord") > bounds[1])
    for i, c in enumerate([c0, c1, c2]):
        c.coalesce(1).write.mode("append" if i else "overwrite").parquet(src)

    stream = (
        spark.readStream.schema(inp.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        running_positions_stream(stream, str(tmp_path / "ckpt"))
        .format("memory")
        .queryName("positions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # memory sink in update mode appends each emission; last row per key wins
    final = (
        spark.sql("select * from positions")
        .groupBy("key")
        .agg(
            F.max_by("position", "n").alias("position"),
            F.max_by("realized", "n").alias("realized"),
            F.max("n").alias("n"),
        )
        .toPandas()
        .set_index("key")
        .sort_index()
    )

    # batch recomputation of identical avg-cost semantics
    rows = inp.orderBy("key", "ts", "ord").collect()
    import collections

    st = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # pos, cost, real, n
    for r in rows:
        s = st[r["key"]]
        if r["side"] == 1:
            s[0] += r["qty"]
            s[1] += r["qty"] * r["price"]
        else:
            avg = s[1] / s[0] if s[0] > 1e-12 else 0.0
            take = min(r["qty"], s[0])
            s[2] += take * (r["price"] - avg) + (r["qty"] - take) * r["price"]
            s[1] -= take * avg
            s[0] -= take
        s[3] += 1

    assert len(final) == len(st)
    for key, (pos, _cost, real, n) in st.items():
        row = final.loc[key]
        assert row["n"] == n, key
        assert row["position"] == pytest.approx(pos, abs=1e-9), key
        assert row["realized"] == pytest.approx(real, abs=1e-6), key
