#!/usr/bin/env python3
"""Planted-skew check: empirical evidence that each skew guard actually
holds wall-time under a deliberately skewed replica — the r6 verdict ask
(scale_check scales uniformly; skew is the failure mode the guards exist
for). For each guarded operator we plant ONE hot key at far above the
median and time the GUARDED production path against the UNGUARDED
variant of the same join on the same data:

  lsh_band_cap        one band bucket with ~2000 identical docs in a 30x
                      corpus (median bucket size 1-3): BAND_BUCKET_CAP
                      drops it before the self-join vs the uncapped
                      quadratic bucket (2000^2/2 pairs x 4 bands).
  cf_customer_cap     one customer holding 3000 supplier edges (fixture
                      max degree 102): CF_CUST_CAP=256 md5-sample vs the
                      uncapped 4.5M-pair single-key explosion.
  semdedup_salt       one k-means cluster holding ~3000 vectors: the x8
                      salted pair join (parallelism = clusters x salts)
                      vs the unsalted single-key pair join.
  rolling_distinct    one event type at ~x400 distinct-user fan-out in a
                      30x stream: the user-coverage interval sweep (O(1)
                      per-task state, per-type running sum bounded by
                      calendar hours) vs the r5 per-type window
                      flattening 24 collect_sets in ONE task per type.

Timings go to BENCH.md's guarded-vs-unguarded table. The unguarded
variants are deliberately bounded (planted keys sized so the quadratic
side finishes) — the point is the RATIO and the straggler shape, not an
OOM demo.

Usage: python3 scripts/skew_check.py [N=30]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.session import get_spark
from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def timed(label: str, df) -> float:
    # two iterations: iter0 pays JIT warm-up; report iter1 (steady state)
    best = None
    for it in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label} iter{it}: {dt:.2f}s", flush=True)
        best = dt
    return best


def check_lsh_band_cap(spark, n: int) -> None:
    from neomarket_clickhouse_indexer_spark.queries.documents import (
        _pairs_from_bands,
    )

    docs = load_table(spark, SF_DIR, "documents")
    path = f"/tmp/skew_check_docs_x{n}.parquet"
    if not os.path.exists(path):
        reps = spark.range(n).withColumnRenamed("id", "rep")
        skewed = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            # ~2000 planted identical docs (all band keys equal -> ONE hot
            # bucket per band); everything else made unique by suffixing
            F.when(
                F.pmod(F.xxhash64("doc_id") + F.col("rep"), F.lit(19)) == 0,
                F.lit("planted hot boilerplate banner text repeated verbatim "
                      "across the corpus exactly as crawls duplicate it"),
            )
            .otherwise(F.concat_ws(" ", F.col("text"), F.col("rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        skewed.repartition(64).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    hot = big.filter(
        F.col("text").startswith("planted hot boilerplate")
    ).count()
    print(f"lsh corpus: {big.count():,} docs, hot-bucket members: {hot:,}")

    bands = _doc_bands_from_frame(spark, big)
    bands.persist().count()
    g = timed("lsh_pairs_guarded", _pairs_from_bands(bands))
    # unguarded: the same self-join WITHOUT the hot-bucket drop
    b2 = bands.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("band_idx").alias("band_idx_b"),
        F.col("band_key").alias("band_key_b"),
    )
    unguarded = (
        bands.join(
            b2,
            (F.col("band_idx") == F.col("band_idx_b"))
            & (F.col("band_key") == F.col("band_key_b"))
            & (F.col("doc_id") < F.col("doc_id_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), F.col("doc_id_b").alias("doc_b"))
        .distinct()
    )
    u = timed("lsh_pairs_unguarded", unguarded)
    print(f"RATIO lsh_band_cap unguarded/guarded: {u / g:.1f}x")
    bands.unpersist()


def _doc_bands_from_frame(spark, docs_frame):
    """_doc_bands takes (spark, sf_dir); rebuild its pipeline over an
    arbitrary frame via a temp view + the same helper chain."""
    from neomarket_clickhouse_indexer_spark.functions import text as TX
    from neomarket_clickhouse_indexer_spark.queries.documents import (
        BAND_SIZE,
        NUM_BANDS,
        NUM_PERM,
    )

    shingled = docs_frame.select(
        "doc_id", TX.shingles(TX.tokens(F.col("text")), 3, distinct=False).alias("sh")
    )
    n_fam = NUM_PERM // TX.PERMS_PER_MD5
    hashed = shingled.select("doc_id", *TX.hash_families(F.col("sh"), n_fam))
    sigs = hashed.select(
        "doc_id",
        *TX.minhash_from_families([F.col(f"hf{b}") for b in range(n_fam)], NUM_PERM),
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
            )
        ).alias(f"band{b}")
        for b in range(NUM_BANDS)
    ]
    sigs = sigs.select("doc_id", *band_cols)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_idx"),
                F.col(f"band{b}").alias("band_key"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"),
    )


def check_cf_customer_cap(spark) -> None:
    from neomarket_clickhouse_indexer_spark.queries.graph_q import (
        _cap_customer_edges,
    )

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # plant ONE aggregator customer holding 10k supplier edges (~100x the
    # fixture max degree of 102): 50M uncapped pair rows on a single key
    hot = spark.range(10_000).select(
        F.lit(-1).cast("long").alias("c"), (F.col("id") + 1_000_000).alias("s")
    )
    skewed = edges.unionByName(hot).persist()
    skewed.count()

    def pair_join(e):
        a = e.select("c", F.col("s").alias("sa"))
        b = e.select("c", F.col("s").alias("sb"))
        return (
            a.join(b, "c")
            .filter(F.col("sa") < F.col("sb"))
            .groupBy("sa", "sb")
            .agg(F.count(F.lit(1)).alias("inter"))
        )

    g = timed("cf_pairs_guarded", pair_join(_cap_customer_edges(skewed)))
    u = timed("cf_pairs_unguarded", pair_join(skewed))
    print(f"RATIO cf_customer_cap unguarded/guarded: {u / g:.1f}x")
    skewed.unpersist()


def check_semdedup_salt(spark, n: int) -> None:
    from neomarket_clickhouse_indexer_spark.functions import vectors as VX
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        _SEM_SALTS,
        SEM_TAU,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    path = f"/tmp/skew_check_emb_x{n}.parquet"
    if not os.path.exists(path):
        reps = spark.range(n).withColumnRenamed("id", "rep")
        (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
                "embedding",
                "label",
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(path)
        )
    big = spark.read.parquet(path)
    # hot cluster: ~6000 of the 60k vectors land in cluster 0 (~18M cosine
    # pairs on ONE join key when unsalted); the rest spread over 240
    # per-replica clusters (population ~240 each)
    assigned = big.select(
        "vec_id",
        "embedding",
        F.when(F.pmod(F.xxhash64("vec_id"), F.lit(10)) == 0, F.lit(0))
        .otherwise(
            F.expr("vec_id DIV 10000000") * 8
            + F.pmod(F.xxhash64("vec_id"), F.lit(8))
            + 1
        )
        .alias("cluster"),
    ).persist()
    sizes = assigned.groupBy("cluster").count()
    hot_n = sizes.filter(F.col("cluster") == 0).collect()[0]["count"]
    print(f"semdedup vectors: {assigned.count():,}, hot cluster: {hot_n:,}")

    def pair_join(salted: bool):
        sa_cols = [
            F.col("cluster").alias("cl_a"),
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            VX.norm(F.col("embedding")).alias("norm_a"),
        ]
        sb_cols = [
            F.col("cluster").alias("cl_b"),
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            VX.norm(F.col("embedding")).alias("norm_b"),
        ]
        if salted:
            sa = assigned.select(
                *sa_cols,
                F.pmod(F.xxhash64("vec_id"), F.lit(_SEM_SALTS)).alias("salt_a"),
            )
            sb = assigned.select(
                *sb_cols,
                F.explode(F.sequence(F.lit(0), F.lit(_SEM_SALTS - 1))).alias(
                    "salt_b"
                ),
            )
            cond = (
                (F.col("cl_a") == F.col("cl_b"))
                & (F.col("salt_a") == F.col("salt_b"))
                & (F.col("vec_a") < F.col("vec_b"))
            )
        else:
            sa = assigned.select(*sa_cols)
            sb = assigned.select(*sb_cols)
            cond = (F.col("cl_a") == F.col("cl_b")) & (
                F.col("vec_a") < F.col("vec_b")
            )
        return (
            sa.join(sb, cond)
            .select(
                F.col("cl_a").alias("cluster"),
                "vec_a",
                "vec_b",
                F.round(
                    VX.dot(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("norm_a") * F.col("norm_b")),
                    6,
                ).alias("sim"),
            )
            .filter(F.col("sim") >= SEM_TAU)
            .groupBy("cluster", "vec_b")
            .agg(F.min("vec_a").alias("dup_of"), F.max("sim").alias("max_sim"))
        )

    # emulate the at-scale regime: a 100-TB corpus side cannot broadcast,
    # so the join must shuffle on the cluster key — WITHOUT this, Spark
    # broadcasts the 31MB side and the hot key parallelizes for free,
    # masking exactly the skew the salt exists to spread (first-run
    # observation: unsalted "won" 0.9x under broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        g = timed("semdedup_salted", pair_join(salted=True))
        u = timed("semdedup_unsalted", pair_join(salted=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    print(f"RATIO semdedup_salt unsalted/salted: {u / g:.1f}x")
    assigned.unpersist()


def check_rolling_distinct(spark, n: int) -> None:
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        rolling_distinct_frame,
    )

    base = load_table(spark, SF_DIR, "events")
    path = f"/tmp/skew_check_events_x{n}.parquet"
    if not os.path.exists(path):
        reps = spark.range(n).withColumnRenamed("id", "rep")
        skewed = base.crossJoin(reps).select(
            (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
            # hot type 'view': ts folded into the fixture's FIRST 48 hours
            # (hour cardinality compressed 15x) AND a unique user per
            # EVENT (~600k distinct users, ~x400 the normal 1500/type) —
            # ~12k distinct users/hour, so the r5 per-type window task
            # flattens ~290k-string frames per anchor row; other types
            # keep the fixture time axis and replica-shifted user space
            F.when(
                F.col("event_type") == "view",
                # NTZ-safe fold: subtract whole 48h blocks (keep NTZ +
                # INTERVAL end-to-end, CLAUDE.md NTZ rule)
                F.expr(
                    "ts - make_interval(0, 0, 0, 0, CAST(((datediff(ts, "
                    "DATE '2024-01-01') * 24 + hour(ts)) DIV 48) * 48 "
                    "AS INT), 0, 0)"
                ),
            )
            .otherwise(F.col("ts"))
            .alias("ts"),
            F.when(
                F.col("event_type") == "view",
                F.col("event_id") + F.col("rep") * 10_000_000 + 1_000_000_000,
            )
            .otherwise(F.col("user_id") + F.col("rep") * 1000)
            .alias("user_id"),
            "event_type",
            "value",
        )
        skewed.repartition(64).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    # load_table already normalized ts to a us timestamp before the write
    ev = big.select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    print(f"rolling events: {big.count():,}")
    g = timed("rolling_distinct_guarded", rolling_distinct_frame(ev))

    # unguarded: the r5 per-type window flatten — ONE task per type holds
    # every 24h frame's flattened sets
    hour_x = (
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
        + F.hour("ts")
    ).cast("long")
    per_hour = (
        ev.select("event_type", hour_x.alias("x"), "user_id")
        .groupBy("event_type", "x")
        .agg(
            F.collect_set("user_id").alias("users"),
            F.countDistinct("user_id").alias("n_distinct_1h"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("x").rangeBetween(-23, 0)
    unguarded = per_hour.select(
        "event_type",
        "x",
        "n_distinct_1h",
        F.size(F.array_distinct(F.flatten(F.collect_list("users").over(w))))
        .cast("long")
        .alias("n_distinct_24h"),
    )
    u = timed("rolling_distinct_window", unguarded)
    print(f"RATIO rolling_distinct window/sweep: {u / g:.1f}x")


def check_triangle_orientation(spark, n: int) -> None:
    """Planted hub part: one part lands in ~2% of all orders, so after
    the support prune it carries edges to most of the catalog (raw
    degree >> sqrt(m)). GUARDED = the production degree-ordered
    orientation (hub out-degree bounded, wedges O(m^1.5)); UNGUARDED =
    wedges enumerated from the raw unoriented adjacency (every node
    fans out deg^2 wedge rows — the hub alone contributes deg_hub^2)."""
    from neomarket_clickhouse_indexer_spark.queries.graph_q import (
        coorder_edges_frame,
        coorder_triangles_frame,
    )

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    path = f"/tmp/skew_check_li_hub_x{n}.parquet"
    if not os.path.exists(path):
        reps = spark.range(n).withColumnRenamed("id", "rep")
        big = li.crossJoin(reps).select(
            (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias(
                "l_orderkey"
            ),
            (F.col("l_partkey") + F.col("rep") * 10_000_000).alias(
                "l_partkey"
            ),
        )
        hub = (
            big.select("l_orderkey").distinct()
            .filter(F.pmod(F.xxhash64("l_orderkey"), F.lit(50)) == 0)
            .select("l_orderkey", F.lit(-1).cast("long").alias("l_partkey"))
        )
        big.unionByName(hub).repartition(64).write.mode("overwrite").parquet(
            path
        )
    big_li = spark.read.parquet(path)
    edges = coorder_edges_frame(big_li).persist()
    m = edges.count()
    hub_deg = edges.filter(
        (F.col("u") == -1) | (F.col("v") == -1)
    ).count()
    print(f"triangle edges: {m:,}, planted hub degree: {hub_deg:,}")

    g = timed("triangles_oriented", coorder_triangles_frame(big_li, 64))
    # unguarded: wedges from the RAW adjacency (both directions), each
    # triangle found 6x then de-duplicated — no degree bound anywhere
    adj = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w1 = adj.select(F.col("u").alias("s"), F.col("v").alias("t1"))
    w2 = adj.select(F.col("u").alias("s"), F.col("v").alias("t2"))
    wedges = (
        w1.join(w2, "s")
        .filter(F.col("t1") < F.col("t2"))
        .select("s", F.col("t1").alias("u"), F.col("t2").alias("v"))
    )
    tri6 = wedges.join(edges, ["u", "v"]).select(
        F.least(F.col("s"), F.col("u"), F.col("v")).alias("a"),
        F.expr(
            "CAST(s AS BIGINT) + u + v - least(s, u, v) - greatest(s, u, v)"
        ).alias("b"),
        F.greatest(F.col("s"), F.col("u"), F.col("v")).alias("c"),
    ).distinct()
    u = timed("triangles_unoriented", tri6)
    print(f"RATIO triangle orientation unoriented/oriented: {u / g:.1f}x")
    edges.unpersist()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark("skew_check", cores=32, shuffle_partitions=64)
    check_rolling_distinct(spark, n)
    check_lsh_band_cap(spark, n)
    check_cf_customer_cap(spark)
    check_semdedup_salt(spark, n)
    check_triangle_orientation(spark, n)
    check_mutual_bucket_cap(spark)


if __name__ == "__main__":
    main()


def check_mutual_bucket_cap(spark) -> None:
    """r7: one flooded LSH bucket in the mutual-kNN candidate graph —
    2000 near-identical vectors land in a single 6-plane bucket (fixture
    bucket sizes ~8): MUTUAL_BUCKET_CAP=64 md5-samples the bucket before
    the pair join (<= 64^2/2 pairs) vs the uncapped 2M-pair single-key
    quadratic."""
    import hashlib

    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        DIM,
        MUTUAL_BUCKET_CAP,
        MUTUAL_K,
        MUTUAL_PLANES,
        _bucket_expr,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # plant 10k copies of one direction (md5-derived, no RNG): all share
    # a bucket and are mutually near-identical — 50M uncapped pairs
    base = [
        1.0 if hashlib.md5(f"flood-{d}".encode()).digest()[0] & 1 else -1.0
        for d in range(DIM)
    ]
    hot = spark.range(10_000).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.array(*[F.lit(v) for v in base]).cast("array<float>").alias(
            "embedding"
        ),
    )
    skewed = emb.unionByName(hot).persist()
    skewed.count()

    def mutual(capped: bool):
        from neomarket_clickhouse_indexer_spark.functions import vectors as VX

        raw = skewed.select(
            "vec_id",
            "embedding",
            _bucket_expr("embedding", n_planes=MUTUAL_PLANES).alias("bucket"),
        )
        if capped:
            wcap = Window.partitionBy("bucket").orderBy(
                F.md5(F.col("vec_id").cast("string")), "vec_id"
            )
            raw = (
                raw.withColumn("r", F.row_number().over(wcap))
                .filter(F.col("r") <= MUTUAL_BUCKET_CAP)
                .drop("r")
            )
        a = raw.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            F.col("bucket").alias("ba"),
        )
        b = raw.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            F.col("bucket").alias("bb"),
        )
        return (
            a.join(
                b,
                (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")),
            )
            .select(
                "vec_a",
                "vec_b",
                VX.cosine_rounded(F.col("emb_a"), F.col("emb_b"), 6).alias(
                    "cosine_sim"
                ),
            )
            .groupBy("vec_a")
            # sum the similarity so Catalyst cannot prune the cosine
            # column — the exact-verify arithmetic IS the quadratic cost
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cosine_sim").alias("s"),
            )
        )

    g = timed("mutual_pairs_guarded", mutual(capped=True))
    u = timed("mutual_pairs_unguarded", mutual(capped=False))
    print(f"RATIO mutual_bucket_cap unguarded/guarded: {u / g:.1f}x")
    skewed.unpersist()
