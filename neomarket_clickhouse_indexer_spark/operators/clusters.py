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
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
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
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
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
    """DuckDB oracle: recursive transitive closure → min reachable id per
    node (UNION dedups rows, so the recursion terminates)."""
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
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id,
       LEAST(u, MIN(v)) AS cluster_id
FROM reach
GROUP BY u
"""
