#!/usr/bin/env python3
"""Standalone NSW scale differential (the pagerank/LPA protocol): fresh
session per scale, replicate the sf0.1 embeddings Nx with a per-replica
CIRCULAR DIMENSION SHIFT (deterministic, norm-preserving, and NOT
LSH-invariant — identical copies would stack every bucket Nx and the cap
would turn the run into a cap-truncation test instead of a scale test),
then time nsw_frame with the forest's plane count raised to hold bucket
size roughly constant: n_planes ~ log2(N / target_bucket_size), the
production sizing rule documented on nsw_frame.

Usage: python3 scripts/nsw_scale.py <N> [n_planes]
       python3 scripts/nsw_scale.py <N> --hnsw

--serve times the MAINTAINED-INDEX serve path (r14): standing index
prebuilt and tombstone-compacted (both untimed), then the flat beam
search over the compacted graph with survivor entry points — the claim
is serve wall is O(B*K*H) scheduler-paced work per query, ~FLAT in
corpus size (only the per-hop score joins touch data, and those are
beam-bounded).
Run once per scale IN SEPARATE PROCESSES on a quiet host (min-of-2,
report steady iter1 — the in-session contamination lesson, BENCH.md).

--hnsw times the full LAYERED build + descent serve instead: per-layer
plane counts follow the same constant-bucket rule against each layer's
1/8-sampled population (L1 = n_planes - 3, L2 = n_planes - 6, floored
at 1), so upper-layer cost stays a constant fraction of layer 0's.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    hnsw_search_frame,
    nsw_frame,
    nsw_search_frame,
)
from neomarket_clickhouse_indexer_spark.session import get_spark
from neomarket_clickhouse_indexer_spark.sources.tables import load_table


def main() -> None:
    n = int(sys.argv[1])
    spark = get_spark("nsw_scale", cores=32, shuffle_partitions=64)
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    scaled_path = f"/tmp/nsw_scale_emb_x{n}.parquet"
    if not os.path.exists(scaled_path):
        reps = spark.range(n).withColumnRenamed("id", "rep")
        dim = 64
        shift = (F.col("rep") % dim).cast("int")
        (
            base.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * 10_000_000).alias(
                    "vec_id"
                ),
                F.when(shift == 0, F.col("embedding"))
                .otherwise(
                    F.concat(
                        F.slice(
                            "embedding", shift + 1, F.lit(dim) - shift
                        ),
                        F.slice("embedding", 1, shift),
                    )
                )
                .alias("embedding"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(scaled_path)
        )
    emb = spark.read.parquet(scaled_path)
    n_vecs = emb.count()
    hnsw = len(sys.argv) > 2 and sys.argv[2] == "--hnsw"
    incr = len(sys.argv) > 2 and sys.argv[2] == "--incr"
    dele = len(sys.argv) > 2 and sys.argv[2] == "--del"
    serve = len(sys.argv) > 2 and sys.argv[2] == "--serve"
    # hold bucket size ~32: the scale knob is plane count, not the cap
    n_planes = (
        int(sys.argv[2])
        if len(sys.argv) > 2 and not (hnsw or incr or dele or serve)
        else max(5, math.ceil(math.log2(max(n_vecs, 64) / 32)))
    )
    if serve:
        # maintained-index serve: base build + compaction are the
        # standing artifacts (untimed); time ONLY the beam search —
        # the user-visible query path of knn_nsw_search_maintained
        # NOTE: nsw_frame/nsw_search_frame deliberately NOT re-imported
        # here — a function-local import binding makes the name local to
        # main() and the default build path below then dies with
        # UnboundLocalError before its own (module-level) reference
        from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
            N_QUERIES,
            _nsw_del_pred,
            nsw_delete_frame,
        )

        bucketings = [(k, n_planes) for k in range(4)]
        corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
        print(
            f"x{n}: {n_vecs:,} vectors, forest 4 x {n_planes} planes",
            flush=True,
        )
        base_caches: list = []
        g_base = nsw_frame(
            corpus, _cache_out=base_caches, bucketings=bucketings
        ).localCheckpoint(eager=True)
        for df in base_caches:
            df.unpersist()
        del_caches: list = []
        g_maint = nsw_delete_frame(
            emb, _cache_out=del_caches, bucketings=bucketings,
            prebuilt_base=g_base,
        ).localCheckpoint(eager=True)
        for df in del_caches:
            df.unpersist()
        for it in range(2):
            t0 = time.perf_counter()
            caches: list = []
            out = nsw_search_frame(
                emb,
                _cache_out=caches,
                prebuilt_graph=g_maint,
                node_filter=~_nsw_del_pred(F.col("vec_id")),
            )
            cnt = out.count()
            print(
                f"nsw_serve_maintained x{n} iter{it}: "
                f"{time.perf_counter() - t0:.2f}s ({cnt:,} results)",
                flush=True,
            )
            for df in caches:
                df.unpersist()
        spark.stop()
        return
    if dele:
        # the operational delete: standing index prebuilt (untimed),
        # time ONLY drop+repair — the claim is this cost tracks the
        # 1/16 victim batch's blast radius, never the base size
        from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
            N_QUERIES,
            _nsw_del_pred,
            nsw_delete_frame,
        )

        bucketings = [(k, n_planes) for k in range(4)]
        corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
        n_vict = corpus.filter(_nsw_del_pred(F.col("vec_id"))).count()
        print(
            f"x{n}: {n_vecs:,} vectors, victims {n_vict:,}, forest 4 x "
            f"{n_planes} planes",
            flush=True,
        )
        base_caches: list = []
        base = nsw_frame(
            corpus, _cache_out=base_caches, bucketings=bucketings
        ).localCheckpoint(eager=True)
        for df in base_caches:
            df.unpersist()
        for it in range(2):
            t0 = time.perf_counter()
            caches: list = []
            out = nsw_delete_frame(
                emb, _cache_out=caches, bucketings=bucketings,
                prebuilt_base=base,
            )
            cnt = out.count()
            print(
                f"nsw_compact x{n} iter{it}: "
                f"{time.perf_counter() - t0:.2f}s ({cnt:,} edges)",
                flush=True,
            )
            for df in caches:
                df.unpersist()
        spark.stop()
        return
    if incr:
        # the operational append: base index prebuilt (untimed), time
        # ONLY attach+repair — the O(|batch|) claim is that this cost
        # tracks the 1/16 batch, never the base size
        from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
            N_QUERIES,
            _nsw_new_pred,
            nsw_incremental_frame,
        )

        bucketings = [(k, n_planes) for k in range(4)]
        corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
        n_batch = corpus.filter(_nsw_new_pred(F.col("vec_id"))).count()
        print(
            f"x{n}: {n_vecs:,} vectors, batch {n_batch:,}, forest 4 x "
            f"{n_planes} planes",
            flush=True,
        )
        base_caches: list = []
        base = nsw_frame(
            corpus.filter(~_nsw_new_pred(F.col("vec_id"))),
            _cache_out=base_caches,
            bucketings=bucketings,
        ).localCheckpoint(eager=True)
        for df in base_caches:
            df.unpersist()
        for it in range(2):
            t0 = time.perf_counter()
            caches: list = []
            out = nsw_incremental_frame(
                emb, _cache_out=caches, bucketings=bucketings,
                prebuilt_base=base,
            )
            cnt = out.count()
            print(
                f"nsw_append x{n} iter{it}: "
                f"{time.perf_counter() - t0:.2f}s ({cnt:,} edges)",
                flush=True,
            )
            for df in caches:
                df.unpersist()
        spark.stop()
        return
    if hnsw:
        per_layer = [
            [(k, max(1, n_planes - 3 * lvl)) for k in range(4 if lvl < 2 else 2)]
            for lvl in range(3)
        ]
        print(
            f"x{n}: {n_vecs:,} vectors, layered forests "
            f"{[b[0][1] for b in per_layer]} planes",
            flush=True,
        )
        for it in range(2):
            t0 = time.perf_counter()
            caches: list = []
            out = hnsw_search_frame(
                emb, _cache_out=caches, bucketings=per_layer
            )
            cnt = out.count()
            print(
                f"hnsw_build+serve x{n} iter{it}: "
                f"{time.perf_counter() - t0:.2f}s ({cnt:,} rows)",
                flush=True,
            )
            for df in caches:
                df.unpersist()
        spark.stop()
        return
    bucketings = [(k, n_planes) for k in range(4)]
    print(
        f"x{n}: {n_vecs:,} vectors, forest 4 x {n_planes} planes "
        f"(~{n_vecs / 2**n_planes:.0f}/bucket)",
        flush=True,
    )
    for it in range(2):
        t0 = time.perf_counter()
        caches: list = []
        out = nsw_frame(emb, _cache_out=caches, bucketings=bucketings)
        cnt = out.count()  # the build is eager; count reads checkpoints
        print(
            f"nsw_build x{n} iter{it}: {time.perf_counter() - t0:.2f}s "
            f"({cnt:,} edges)",
            flush=True,
        )
        for df in caches:
            df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
