"""Connected components over near-duplicate pairs → dedup cluster ids.

The last step of large-scale near-dedup: LSH/Jaccard emits PAIRS, but
dedup policy needs CLUSTERS (keep one doc per component). This is an
iterative algorithm Spark has no built-in for — implemented as
min-label propagation:

  labels ← node id
  repeat: label(v) ← min(label(v), min over neighbors' labels)
  until fixpoint

Each round is two joins + an aggregate (all DataFrame ops); convergence in
O(diameter) rounds — near-dup graphs are overwhelmingly tiny star/clique
components, so 2-4 rounds in practice. ``localCheckpoint`` per round cuts
the lineage so plans don't grow exponentially. This is the (b)-class
"iterative algorithm" pattern from the build mandate; the DuckDB oracle
uses a recursive-CTE transitive closure — an entirely different algorithm,
making the differential meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """Pairs (a, b) → (doc_id, cluster_id) where cluster_id = min node id
    of the component. Only nodes appearing in pairs are returned.

    The iteration's shuffle-partition count is scoped to
    defaultParallelism for the duration of the loop (set/restore — the
    streaming_positions_state conf-scoping doctrine): every round runs
    2 actions over node-sized frames, and the plain driver session's 200
    partitions would otherwise spawn ~3x200 near-empty tasks per round
    (the profiled entity-graph cost is pair-build + ~0.6s/round fixed
    action overhead, so the win here is modest — the scope mainly
    protects the larger docs dup graphs). Every frame the caller sees is
    localCheckpoint-materialized INSIDE the scope, so no downstream plan
    depends on the restored conf."""
    spark = pairs.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        return _components_loop(pairs, a, b, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _components_loop(
    pairs: DataFrame, a: str, b: str, max_iter: int
) -> DataFrame:
    # materialize the pair build ONCE before the symmetrizing union —
    # both union branches reference the pairs subtree, so an eager
    # union would execute the (possibly expensive) candidate chain
    # twice (r15; the entity gate's FastSS variant join paid ~2x here)
    p0 = pairs.select(
        F.col(a).alias("u"), F.col(b).alias("v")
    ).localCheckpoint(eager=True)
    edges = (
        p0.unionByName(p0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        hop = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping (r15): follow the label one step — label(u) ←
        # label(label(u)). Labels are always node ids, so the self-join
        # resolves; combined with the neighbor-min hop this converges in
        # O(log diameter) rounds instead of O(diameter) (the entity
        # digit-graph has diameter ~10; star-shaped dup graphs already
        # converge in 2-3 rounds and pay only one extra join INSIDE the
        # same round's plan — no extra action).
        ptr = hop.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            hop.join(ptr, hop.label == ptr.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("plabel"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def components_sql(pairs_sql: str, a: str = "doc_a", b: str = "doc_b") -> str:
    """DuckDB oracle: recursive BFS closure seeded at the LOCAL MINIMA
    (nodes smaller than every neighbor) → min reaching seed per node.
    Correct because a component's global minimum is always a local
    minimum and reaches every node of its (undirected) component, so
    MIN(seed) over reaching seeds is the component minimum. Seeding at
    local minima instead of closing over ALL pairs keeps the reach
    relation at (#local minima per component) x (component size) rows —
    the r15 fix for the entity digit-graph, whose single giant component
    made the all-pairs closure quadratic (2.25M reach rows, 6.3s of a
    15.8s window slot); star-shaped dup graphs have exactly one local
    minimum per component, so their closures shrink to component size.
    Still a closure/BFS — algorithmically independent of the Spark
    side's min-label propagation."""
    # pairs/edges MATERIALIZED: the recursive step references edges, and
    # an inlined CTE chain re-evaluates per recursion level (the r6
    # docs_bpe_merges lesson — cost the entity-clusters oracle 7.5s of a
    # 7.6s gate before this)
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
edges AS MATERIALIZED (
  SELECT {a} AS u, {b} AS v FROM pairs
  UNION
  SELECT {b} AS u, {a} AS v FROM pairs
),
locmin AS MATERIALIZED (
  SELECT u FROM edges GROUP BY u HAVING MIN(v) > u
),
reach(s, v) AS (
  SELECT u AS s, u AS v FROM locmin
  UNION
  SELECT r.s, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT v AS doc_id,
       MIN(s) AS cluster_id
FROM reach
GROUP BY v
"""
