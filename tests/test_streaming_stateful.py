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


def test_streaming_qdigest_accumulates_across_batches(spark):
    """The q-digest streaming state must genuinely accumulate: the final
    per-type n equals the FULL corpus count (a state that only saw the
    last microbatch would hold ~1/3 of it), and the final estimates
    equal a direct batch compression of the same data — the
    pure-function-of-histogram contract across 3 real microbatches."""
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        QD_BITS,
        QD_K,
        QD_PCTS,
        qdigest_compress,
        streaming_qdigest_state,
    )

    sf_dir = "/root/testdata/sf0.001"
    final = {
        (r.event_type, r.q_pct): r
        for r in streaming_qdigest_state(spark, sf_dir).collect()
    }
    # batch recomputation with the same kernel
    import duckdb

    con = duckdb.connect()
    cap = (1 << QD_BITS) - 1
    rows = con.execute(
        f"""SELECT event_type,
                   LEAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), {cap}) AS v
            FROM read_parquet('{sf_dir}/events.parquet')"""
    ).fetchall()
    hists: dict[str, dict[int, int]] = {}
    for et, v in rows:
        hists.setdefault(et, {})[v] = hists.setdefault(et, {}).get(v, 0) + 1
    for et, hist in hists.items():
        n = sum(hist.values())
        t = n // QD_K
        sketch = qdigest_compress(hist, t)
        nodes = sorted(
            (
                off * (1 << (QD_BITS - lv)) + (1 << (QD_BITS - lv)) - 1,
                -(off * (1 << (QD_BITS - lv))),
                c,
            )
            for lv, off, c in sketch
        )
        for q in QD_PCTS:
            target = (n - 1) * q // 100 + 1
            cum = 0
            est = nodes[-1][0]
            for hi, _lo, c in nodes:
                cum += c
                if cum >= target:
                    est = hi
                    break
            row = final[(et, q)]
            assert (row.n, row.t, row.sketch_nodes, row.est_cents,
                    row.target) == (n, t, len(sketch), est, target), (et, q)
