"""Iterative graph analytics over the relational schema.

The reference's leaderboard endpoints rank wallets by aggregate volume
(src/api.ts leaderboard; clickhouse rollups) — one-hop aggregation. This
module adds the multi-hop generalization as a first-class operator
family: damped PageRank-style mass propagation over the bipartite
customer↔supplier procurement graph, run as JOIN-BASED MESSAGE PASSING
(edges ⋈ ranks → groupBy), the shape that scales: each iteration is one
shuffle on the receiving key, rank state is node-sized (never
materialized on the driver), and the edge table is built once and
reused across iterations.

Determinism: all mass arithmetic is integer — initial rank 1000
milli-units per customer, damping 85/100 as an exact rational, each
push floor-divided as ``(r * 85 * w) // (100 * W_out)`` with identical
association in both engines ("floor-PageRank": truncation loses a few
milli-units of mass per hop, deterministically). Magnitude bound:
products stay < 2^63 through sf10 (r ≤ ~1e8 milli-units, w ≤ ~1e9
cents → 8.5e18; beyond that the rank unit drops to micro-per-node,
same contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

_CENTS_LI = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"

PR_BASE = 1000  # initial rank per customer, milli-units
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact rational
PR_TOP = 25


def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped push iterations customer→supplier→customer→supplier;
    returns the top-25 suppliers by final rank (suppkey tiebreak), with
    the iteration-1 rank alongside so the differential pins both hops."""
    # every groupBy below is preceded by an explicit repartition on ITS
    # key at defaultParallelism width: the plain driver session plans
    # exchanges at spark.sql.shuffle.partitions=200 and AQE cannot
    # re-coalesce stages above the cached edge table, so without the cap
    # each message-passing round paid ~200 near-empty tasks (measured
    # 24s -> 5s cold at sf0.01). groupBy over a matching hash
    # partitioning inserts no further exchange.
    P = spark.sparkContext.defaultParallelism
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.expr(_CENTS_LI).alias("cents")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .repartition(P, "o_custkey")
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.sum("cents").alias("w"))
    )
    return pagerank_frame(edges, P)


def pagerank_frame(edges: DataFrame, P: int) -> DataFrame:
    """Two push rounds over any (c, s, w) weighted edge frame — split out
    so scripts/scale_check.py can drive it at N× graph scale."""
    wc = edges.groupBy("c").agg(F.sum("w").alias("wc"))
    vs = edges.groupBy("s").agg(F.sum("w").alias("vs"))
    # e feeds all three message-passing rounds — persist so the
    # lineitem⋈orders edge build runs once, not once per iteration
    # (the same subtree-reuse rule as semdedup's centroid table).
    e = (
        edges.join(F.broadcast(wc), "c")
        .join(F.broadcast(vs), "s")
        .persist()
    )

    push = "({r} * {dn} * w) DIV ({dd} * {out})"

    rs1 = e.repartition(P, "s").groupBy("s").agg(
        (
            F.lit((PR_BASE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN).cast("long")
            + F.sum(
                F.expr(
                    push.format(r=PR_BASE, dn=PR_D_NUM, dd=PR_D_DEN, out="wc")
                )
            )
        ).alias("r1")
    )
    rc2 = (
        e.join(F.broadcast(rs1), "s")
        .repartition(P, "c")
        .groupBy("c")
        .agg(
            (
                F.lit((PR_BASE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN).cast("long")
                + F.sum(
                    F.expr(
                        push.format(r="r1", dn=PR_D_NUM, dd=PR_D_DEN, out="vs")
                    )
                )
            ).alias("r2c")
        )
    )
    rs2 = (
        e.join(F.broadcast(rc2), "c")
        .repartition(P, "s")
        .groupBy("s")
        .agg(
            (
                F.lit((PR_BASE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN).cast("long")
                + F.sum(
                    F.expr(
                        push.format(r="r2c", dn=PR_D_NUM, dd=PR_D_DEN, out="wc")
                    )
                )
            ).alias("r2")
        )
    )
    # TakeOrdered top-25 instead of row_number over an unpartitioned
    # window on the full node-sized rank frame (single-partition sort of
    # every supplier at scale); the rank window runs over ≤25 rows.
    top = rs2.join(rs1, "s").orderBy(F.desc("r2"), F.asc("s")).limit(PR_TOP)
    w_rank = Window.orderBy(F.desc("r2"), F.asc("s"))  # bounded: ≤25 rows
    return (
        top.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .select(F.col("s").alias("supp_key"), "rank", "r1", "r2")
    )


SUPPLIER_PAGERANK_SQL = f"""
WITH edges AS (
  SELECT o.o_custkey AS c, l.l_suppkey AS s,
         CAST(SUM({_CENTS_LI}) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
wc AS (SELECT c, CAST(SUM(w) AS BIGINT) AS wc FROM edges GROUP BY 1),
vs AS (SELECT s, CAST(SUM(w) AS BIGINT) AS vs FROM edges GROUP BY 1),
e AS (
  SELECT edges.c, edges.s, edges.w, wc.wc, vs.vs
  FROM edges JOIN wc ON edges.c = wc.c JOIN vs ON edges.s = vs.s
),
rs1 AS (
  SELECT s,
         CAST({(PR_BASE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN}
              + SUM(({PR_BASE} * {PR_D_NUM} * w) // ({PR_D_DEN} * wc))
           AS BIGINT) AS r1
  FROM e GROUP BY 1
),
rc2 AS (
  SELECT e.c,
         CAST({(PR_BASE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN}
              + SUM((rs1.r1 * {PR_D_NUM} * e.w) // ({PR_D_DEN} * e.vs))
           AS BIGINT) AS r2c
  FROM e JOIN rs1 ON e.s = rs1.s GROUP BY 1
),
rs2 AS (
  SELECT e.s,
         CAST({(PR_BASE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN}
              + SUM((rc2.r2c * {PR_D_NUM} * e.w) // ({PR_D_DEN} * e.wc))
           AS BIGINT) AS r2
  FROM e JOIN rc2 ON e.c = rc2.c GROUP BY 1
),
ranked AS (
  SELECT rs2.s AS supp_key,
         CAST(ROW_NUMBER() OVER (ORDER BY rs2.r2 DESC, rs2.s ASC) AS BIGINT)
           AS rank,
         rs1.r1, rs2.r2
  FROM rs2 JOIN rs1 ON rs2.s = rs1.s
)
SELECT supp_key, rank, r1, r2 FROM ranked WHERE rank <= {PR_TOP}
"""


# --- supplier_similarity_cf: item-item collaborative-filtering
#     similarity over the bipartite procurement graph — "suppliers are
#     similar when the same customers buy from both", the classic
#     recommender building block. Exact Jaccard of customer sets as an
#     integer rational: intersection from ONE self-join of the capped
#     (customer, supplier) edge list grouped by the supplier pair
#     (shared-customer join — each customer contributes its supplier
#     pairs), union = |A| + |B| - inter from broadcast degree tables,
#     jaccard_ppm = inter * 1e6 DIV union. Top-20 pairs by
#     (jaccard desc, pair) so the gate output is stable and small.

# Skew guard (the BAND_BUCKET_CAP pattern, documents.py): a customer
# connected to S suppliers contributes S(S-1)/2 pair rows to the
# self-join, so one hot customer (an exchange/aggregator wallet in the
# reference's domain) turns the join quadratic at corpus scale. Each
# customer keeps at most CF_CUST_CAP suppliers, selected by a
# DETERMINISTIC md5 hash of the edge (a uniform sample of the supplier
# set, not a popularity-biased one), BEFORE degrees are computed — so
# inter ≤ deg invariants hold and jaccard stays a true [0,1] rational
# over the capped graph. Fixture max degree is 102 (sf0.1), so the gate
# differential is unchanged; the cap path is exercised by
# tests/test_graph.py with a planted hot customer. Per-customer work is
# bounded at CAP²/2 ≈ 32k pair rows regardless of skew.
CF_CUST_CAP = 256


def _cap_customer_edges(edges: DataFrame, cap: int = CF_CUST_CAP) -> DataFrame:
    """Keep at most ``cap`` (c, s) edges per customer, chosen by the
    deterministic md5 of the edge (uniform over the supplier set)."""
    w_cap = Window.partitionBy("c").orderBy(
        F.md5(F.concat_ws(":", "c", "s")), F.asc("s")
    )
    return (
        edges.withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )


def _cf_capped_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    return _cap_customer_edges(edges)


def supplier_similarity_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _cf_capped_edges(spark, sf_dir)
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    a = edges.select("c", F.col("s").alias("sa"))
    b = edges.select("c", F.col("s").alias("sb"))
    inter = (
        a.join(b, "c")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    da = deg.select(F.col("s").alias("sa"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("s").alias("sb"), F.col("deg").alias("deg_b"))
    scored = (
        inter.join(F.broadcast(da), "sa")
        .join(F.broadcast(db), "sb")
        .withColumn("uni", F.col("deg_a") + F.col("deg_b") - F.col("inter"))
        .withColumn("jaccard_ppm", F.expr("inter * 1000000 DIV uni"))
    )
    # TakeOrdered top-20 (distributed partial top-k per partition, merged
    # on the driver) instead of a row_number over an unpartitioned window
    # — the latter single-partition-sorts the full up-to-quadratic pair
    # frame. The rank window below runs over the 20-row result only.
    top = scored.orderBy(F.desc("jaccard_ppm"), "sa", "sb").limit(20)
    w = Window.orderBy(F.desc("jaccard_ppm"), "sa", "sb")  # bounded: ≤20 rows
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "sa", "sb", "inter", "uni", "jaccard_ppm")
    )


SUPPLIER_SIMILARITY_CF_SQL = f"""
WITH edges_raw AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c, s FROM (
    SELECT c, s,
           ROW_NUMBER() OVER (
             PARTITION BY c ORDER BY md5(c || ':' || s), s
           ) AS rn
    FROM edges_raw
  ) WHERE rn <= {CF_CUST_CAP}
),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
inter AS (
  SELECT a.s AS sa, b.s AS sb, CAST(COUNT(*) AS BIGINT) AS inter
  FROM edges a JOIN edges b ON a.c = b.c AND a.s < b.s
  GROUP BY 1, 2
),
scored AS (
  SELECT i.sa, i.sb, i.inter,
         da.deg + db.deg - i.inter AS uni,
         i.inter * 1000000 // (da.deg + db.deg - i.inter) AS jaccard_ppm
  FROM inter i
  JOIN deg da ON i.sa = da.s
  JOIN deg db ON i.sb = db.s
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY jaccard_ppm DESC, sa, sb) AS BIGINT)
         AS rank,
       sa, sb, inter, uni, jaccard_ppm
FROM scored
QUALIFY rank <= 20
"""


# --- supplier_reach_bfs: multi-hop reachability (BFS) — the third member
#     of the graph family after mass propagation (pagerank) and label
#     propagation (connected components): exact minimum-hop distance from
#     a seed set over the bipartite customer↔supplier procurement graph,
#     run as LAYERED FRONTIER MESSAGE PASSING — per level, one equi-join
#     frontier→edges plus one anti-join against the visited set. Seeds are
#     the suppliers of the nation of the minimum-suppkey supplier
#     (data-derived, deterministic at any SF, never empty). Levels
#     alternate supplier(0) → customer(1) → supplier(2) → customer(3).
#
#     Scale: state is node-sized (frontier + visited), each level is one
#     shuffle on the receiving node key; the distinct edge table builds
#     once and is persisted across levels (pagerank's subtree-reuse rule).
#     The oracle is a genuinely different algorithm: a recursive-CTE
#     closure with UNION dedup and MIN(d) per node — closure vs layered
#     frontier pin each other (the connected-components differential
#     pattern).

BFS_MAX_HOPS = 3


def supplier_reach_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    P = spark.sparkContext.defaultParallelism
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .repartition(P, "c")
        .persist()
    )
    # seed nation: nation of the min-suppkey supplier — one driver-side
    # scalar (bounded: a single row), the S5 driver-side-catalog doctrine
    seed_nation = supp.orderBy("s_suppkey").limit(1).collect()[0]["s_nationkey"]
    s0 = supp.filter(F.col("s_nationkey") == seed_nation).select(
        F.col("s_suppkey").alias("id")
    )
    return reach_bfs_frame(edges, s0)


def reach_bfs_frame(edges: DataFrame, s0: DataFrame) -> DataFrame:
    """Layered frontier BFS over any (c, s) edge frame from a supplier
    seed frame — factored out so scripts/scale_check.py can drive it at
    N× graph scale."""
    # level 1: customers adjacent to seed suppliers
    c1 = (
        edges.join(s0.withColumnRenamed("id", "s"), "s")
        .select(F.col("c").alias("id"))
        .distinct()
    )
    # level 2: new suppliers adjacent to level-1 customers
    s2 = (
        edges.join(c1.withColumnRenamed("id", "c"), "c")
        .select(F.col("s").alias("id"))
        .distinct()
        .join(s0, "id", "left_anti")
    )
    # level 3: new customers adjacent to level-2 suppliers
    c3 = (
        edges.join(s2.withColumnRenamed("id", "s"), "s")
        .select(F.col("c").alias("id"))
        .distinct()
        .join(c1, "id", "left_anti")
    )
    lvl = lambda df, nt, d: df.select(  # noqa: E731 — tiny shaping helper
        F.lit(nt).alias("node_type"),
        F.col("id").cast("long").alias("node_id"),
        F.lit(d).cast("long").alias("dist"),
    )
    return (
        lvl(s0, "supplier", 0)
        .unionByName(lvl(c1, "customer", 1))
        .unionByName(lvl(s2, "supplier", 2))
        .unionByName(lvl(c3, "customer", 3))
    )


SUPPLIER_REACH_BFS_SQL = f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
seeds AS (
  SELECT s_suppkey AS id FROM supplier
  WHERE s_nationkey = (SELECT s_nationkey FROM supplier
                       ORDER BY s_suppkey LIMIT 1)
),
walk(nt, id, d) AS (
  SELECT 'supplier', id, 0 FROM seeds
  UNION
  SELECT CASE WHEN w.nt = 'supplier' THEN 'customer' ELSE 'supplier' END,
         CASE WHEN w.nt = 'supplier' THEN e.c ELSE e.s END,
         w.d + 1
  FROM walk w JOIN e
    ON (w.nt = 'supplier' AND e.s = w.id)
    OR (w.nt = 'customer' AND e.c = w.id)
  WHERE w.d < {BFS_MAX_HOPS}
)
SELECT nt AS node_type, CAST(id AS BIGINT) AS node_id,
       CAST(MIN(d) AS BIGINT) AS dist
FROM walk
GROUP BY 1, 2
"""


# --- parts_coorder_triangles: TRIANGLE COUNTING on the parts co-order
#     graph (edge = two parts appearing in the same order) — the classic
#     distributed-graph primitive behind clustering-coefficient /
#     community features. The naive triple self-join enumerates every
#     wedge of every hub (sum of deg^2 — quadratic in the hottest key);
#     the Spark path uses DEGREE-ORDERED ORIENTATION instead (Cohen /
#     Suri-Vassilvitskii MapReduce form): orient each undirected edge
#     from its (degree, id)-smaller endpoint, so every node's
#     OUT-degree is bounded by O(sqrt(m)) regardless of its raw degree,
#     wedges come from one equi-self-join of the oriented list on the
#     apex (total wedge work O(m^1.5), the optimal bound), and each
#     triangle is closed exactly once at its unique (degree, id)-minimal
#     apex by one equi-join back to the undirected edge set. Per-node
#     counts explode the triangle's three corners; top-K via
#     orderBy().limit() (never a global window over the node frame).
#     Edge build is bounded too: pairs-within-order is quadratic only in
#     ORDER SIZE (~4-7 lines), never in part popularity.
#
#     Oracle: the literal textbook triple join e(a,b) ⋈ e(b,c) ⋈ e(a,c)
#     with a<b<c on raw ids — a genuinely different enumeration order
#     (id-canonical vs degree-oriented) that must agree triangle-for-
#     triangle. Edge CTE MATERIALIZED (it feeds three join legs).
#     Reference analog: no graph surface in the reference — BONUS
#     beyond-ref, same family as supplier_pagerank/reach_bfs.

TRI_TOP = 20
TRI_MIN_SUPPORT = 2


def parts_coorder_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return coorder_triangles_frame(
        li, spark.sparkContext.defaultParallelism
    )


def coorder_edges_frame(li: DataFrame) -> DataFrame:
    """Support-pruned undirected co-order edge set over any
    (l_orderkey, l_partkey) frame — shared by the triangle and k-core
    gates. MIN-SUPPORT prune (association-rule discipline): an edge must
    co-occur in >= TRI_MIN_SUPPORT orders. Support-1 pairs are
    coincidence, not correlation — and they are ~99.7% of all pairs at
    sf0.1 (1.19M of 1.196M), turning the co-order graph into a dense
    hairball whose wedge space explodes (first un-pruned 30x run:
    402s); the support filter is the same shuffle as the DISTINCT it
    replaces, so pruning is free."""
    lp = li.distinct()
    a = lp.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = lp.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    # coalesce the support-agg's plain-session 200 output partitions
    # before callers persist: the peel/orientation loops re-scan this
    # cached frame every round, and 200 near-empty cached partitions are
    # pure task overhead at gate SFs; 32 (the local core count) keeps
    # full scan parallelism for the 30x scale path (17.6M edges)
    return (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= TRI_MIN_SUPPORT)
        .select("u", "v")
        .coalesce(32)
    )


def coorder_triangles_frame(
    li: DataFrame, P: int, edges: DataFrame | None = None
) -> DataFrame:
    """Core path over any (l_orderkey, l_partkey) frame — factored out so
    scripts/scale_check.py can drive it at N× graph scale. Pass a
    pre-persisted ``edges`` frame to share the build (parts_graph_suite)."""
    # persist(): the undirected edge set feeds degree calc, orientation,
    # AND the closure join (three consumers — the semdedup subtree rule)
    if edges is None:
        edges = coorder_edges_frame(li).persist()
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionByName(edges.select(F.col("v").alias("n")))
        .repartition(P, "n")
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e2 = edges.join(
        deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    lt = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e2.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("t"),
    ).persist()
    w1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = (
        w1.join(w2, "s")
        .filter(F.col("t1") < F.col("t2"))  # id-canonical closure key
        .select("s", F.col("t1").alias("u"), F.col("t2").alias("v"))
    )
    tri = wedges.join(edges, ["u", "v"])  # closure against the undirected set
    per_node = (
        tri.select(F.col("s").alias("node"))
        .unionByName(tri.select(F.col("u").alias("node")))
        .unionByName(tri.select(F.col("v").alias("node")))
        .repartition(P, "node")
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )
    top = per_node.orderBy(F.desc("tri_cnt"), F.asc("node")).limit(TRI_TOP)
    w_rank = Window.orderBy(F.desc("tri_cnt"), F.asc("node"))  # <= 20 rows
    return top.withColumn("rank", F.row_number().over(w_rank).cast("long")).select(
        F.col("node").alias("part_key"),
        "rank",
        F.col("tri_cnt").cast("long").alias("tri_cnt"),
    )


_COORDER_EDGES_CTE = f"""lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a
  JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
)"""

PARTS_COORDER_TRIANGLES_SQL = f"""
WITH {_COORDER_EDGES_CTE},
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
  FROM (
    SELECT a AS node FROM t
    UNION ALL SELECT b FROM t
    UNION ALL SELECT c FROM t
  )
  GROUP BY node
)
SELECT node AS part_key, rank, tri_cnt
FROM (
  SELECT node, tri_cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY tri_cnt DESC, node) AS BIGINT)
           AS rank
  FROM per_node
)
WHERE rank <= {TRI_TOP}
"""


# --- parts_coorder_kcore: K-CORE DECOMPOSITION (fixed-round peel) on the
#     same support-pruned co-order graph — the graph-sparsification
#     primitive behind community detection and influence analysis: the
#     2-core is what remains after iteratively stripping degree-<2 nodes
#     (trees and pendant chains fall away; only nodes on cycles stay).
#     Run as KCORE_ROUNDS fixed peel rounds (3 — both fixtures converge by round 3: sf0.01 peels 1573 -> 1538 -> 1535 = fixpoint) — each round restricts the
#     edge set to surviving endpoints and recomputes degrees (two
#     equi-joins + one hash agg per round, node-sized state, persisted
#     edge table; the pagerank iteration shape). A fixed round count
#     keeps the differential exact WITHOUT a data-dependent fixpoint
#     test: both engines run exactly the same number of rounds (the
#     kmeans/BPE unrolling doctrine), and the round count is sized so
#     the fixture graphs converge (peeling halts when no node falls).
#     Output = survivors with their induced degree after the last round.
#
#     Oracle: the unrolled n1..nL chain as MATERIALIZED CTEs (DuckDB
#     would otherwise inline and re-evaluate the whole upstream chain
#     per level — the r6 docs_bpe_merges lesson).

KCORE_K = 2
KCORE_ROUNDS = 3


def parts_coorder_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    P = spark.sparkContext.defaultParallelism
    return kcore_frame(coorder_edges_frame(li).persist(), P)


def kcore_frame(edges: DataFrame, P: int) -> DataFrame:
    """Fixed-round 2-core peel over a pre-persisted edge frame — shared
    with parts_graph_suite.

    The peel's shuffle-partition count is scoped to P for the loop
    (set/restore, the connected_components doctrine): each round runs
    degree-agg + broadcast-build jobs over dimension-bounded frames, and
    the plain session's 200 partitions cost ~1.8s/round of near-empty
    tasks (profiled 7.1s for 3 rounds at sf0.01). The result is
    localCheckpoint-materialized inside the scope, so no caller plan
    depends on the restored conf."""
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(P))
    try:
        return _kcore_loop(edges, P).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _kcore_loop(edges: DataFrame, P: int) -> DataFrame:
    alive = None  # None = all nodes alive (round 0 runs over the full e)
    cur = edges
    for _ in range(KCORE_ROUNDS):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionByName(cur.select(F.col("v").alias("node")))
            .repartition(P, "node")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # localCheckpoint: alive feeds TWO broadcast builds (u- and
        # v-side) plus the final join — without it the degree agg
        # re-executes per consumer (profiled ~1.8s/round of the peel's
        # cost was exactly this re-execution)
        alive = (
            deg.filter(F.col("d") >= KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
        # alive is NODE-sized (bounded by the parts dimension, not by
        # rows) — broadcast it explicitly: Spark can't size-estimate the
        # aggregated frame and would otherwise plan each restriction as
        # a 200-partition sort-merge join in the plain driver session
        # (the supplier_pagerank lesson). persist each round's
        # restricted edge set: without it the next round's degree agg
        # AND the broadcast build re-execute the whole peel chain
        # (lineage grows exponentially in the round count).
        cur = (
            edges.join(F.broadcast(alive.select(F.col("node").alias("u"))), "u")
            .join(F.broadcast(alive.select(F.col("node").alias("v"))), "v")
            .select("u", "v")
            .persist()
        )
    final_deg = (
        cur.select(F.col("u").alias("node"))
        .unionByName(cur.select(F.col("v").alias("node")))
        .repartition(P, "node")
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return final_deg.join(F.broadcast(alive), "node").select(
        F.col("node").alias("part_key"),
        F.col("d").cast("long").alias("core_deg"),
    )


def _kcore_chain_sql(k: int, rounds: int) -> str:
    parts = [f"WITH {_COORDER_EDGES_CTE},\ne0 AS MATERIALIZED (SELECT u, v FROM e)"]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
n{r} AS MATERIALIZED (
  SELECT node FROM (
    SELECT u AS node FROM e{r - 1} UNION ALL SELECT v FROM e{r - 1}
  ) GROUP BY node HAVING COUNT(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT e0.u, e0.v
  FROM e0
  JOIN n{r} a ON e0.u = a.node
  JOIN n{r} b ON e0.v = b.node
)"""
        )
    parts.append(
        f"""
SELECT node AS part_key, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT u AS node FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
JOIN n{rounds} USING (node)
GROUP BY node"""
    )
    return "".join(parts)


PARTS_COORDER_KCORE_SQL = _kcore_chain_sql(KCORE_K, KCORE_ROUNDS)


# --- parts_graph_suite: fused GRAPH-ANALYTICS audit gate (the r7
#     evidence-rotation pattern of events_series_suite): EXECUTES the
#     degree-ordered triangle count and the fixed-round 2-core peel
#     from ONE persisted support-pruned co-order edge table (each alone
#     builds and persists the same edges — the fused-gate subtree rule),
#     emitting labeled (family, k, metric, value) rows so both r7 graph
#     families get an in-window CORRECTNESS row in one slot. Values are
#     STRINGs of exact BIGINTs.


def parts_graph_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    P = spark.sparkContext.defaultParallelism
    edges = coorder_edges_frame(li).persist()
    tri = coorder_triangles_frame(li, P, edges=edges).selectExpr(
        "'triangles' AS family",
        "CAST(part_key AS STRING) AS k",
        "stack(2, 'rank', CAST(rank AS STRING),"
        " 'tri_cnt', CAST(tri_cnt AS STRING)) AS (metric, value)",
    )
    core = kcore_frame(edges, P).selectExpr(
        "'kcore' AS family",
        "CAST(part_key AS STRING) AS k",
        "stack(1, 'core_deg', CAST(core_deg AS STRING)) AS (metric, value)",
    )
    # r8 growth: LPA communities executed verbatim off the SAME persisted
    # pruned edge table (its first in-window row)
    lpa = lpa_frame(edges, P).selectExpr(
        "'lpa' AS family",
        "CAST(community AS STRING) AS k",
        "stack(3, 'n_nodes', CAST(n_nodes AS STRING),"
        " 'min_member', CAST(min_member AS STRING),"
        " 'internal_edges', CAST(internal_edges AS STRING))"
        " AS (metric, value)",
    )
    return tri.unionByName(core).unionByName(lpa)


def _graph_suite_sql() -> str:
    return f"""
SELECT 'triangles' AS family, CAST(t.part_key AS VARCHAR) AS k, m.metric,
       CASE m.metric WHEN 'rank' THEN CAST(t.rank AS VARCHAR)
                     ELSE CAST(t.tri_cnt AS VARCHAR) END AS value
FROM ({PARTS_COORDER_TRIANGLES_SQL}) t,
     (SELECT unnest(['rank','tri_cnt']) AS metric) m
UNION ALL
SELECT 'kcore' AS family, CAST(c.part_key AS VARCHAR) AS k,
       'core_deg' AS metric, CAST(c.core_deg AS VARCHAR) AS value
FROM ({PARTS_COORDER_KCORE_SQL}) c
UNION ALL
SELECT 'lpa' AS family, CAST(l.community AS VARCHAR) AS k, m.metric,
       CASE m.metric WHEN 'n_nodes' THEN CAST(l.n_nodes AS VARCHAR)
                     WHEN 'min_member' THEN CAST(l.min_member AS VARCHAR)
                     ELSE CAST(l.internal_edges AS VARCHAR) END AS value
FROM ({{LPA}}) l,
     (SELECT unnest(['n_nodes','min_member','internal_edges'])
        AS metric) m
"""


# bound at module END (interpolates the LPA oracle defined below)


# --- parts_coorder_communities: COMMUNITY DETECTION by fixed-round
#     SYNCHRONOUS label propagation (Raghavan LPA made deterministic:
#     every node simultaneously adopts the label carried by MOST of its
#     neighbors, ties broken by MIN label; LPA_ROUNDS fixed rounds, so
#     the output is well-defined even where free-running LPA oscillates
#     — the kmeans/BPE/k-core fixed-iteration unrolling doctrine). Runs
#     over the same support-pruned co-order edge table as the triangle/
#     k-core gates. Emits per community: size, min member, and the
#     internal-edge count (the density signal). All integer, all
#     deterministic. At 100 TB: per round ONE shuffle join of the
#     directed edge list against the node-sized label frame + one
#     argmax aggregation (max_by over (cnt, -label) — A4); labels are
#     localCheckpoint'd per round (lineage clamp, the k-core lesson).
#     Oracle: the same rounds unrolled as MATERIALIZED CTEs with
#     ROW_NUMBER argmax — a genuinely different argmax derivation.

LPA_ROUNDS = 3


def parts_coorder_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    P = spark.sparkContext.defaultParallelism
    return lpa_frame(coorder_edges_frame(li).persist(), P)


def lpa_frame(edges: DataFrame, P: int) -> DataFrame:
    """Fixed-round synchronous LPA over a pre-persisted edge frame —
    shuffle partitions scoped to P for the loop (the kcore_frame
    set/restore discipline), result localCheckpoint-materialized."""
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(P))
    try:
        return _lpa_loop(edges, P).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _lpa_loop(edges: DataFrame, P: int) -> DataFrame:
    dirs = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionByName(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        .repartition(P, "nbr")
        .persist()
    )
    labels = (
        dirs.select(F.col("node")).distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint(eager=True)
    )
    for _ in range(LPA_ROUNDS):
        cnt = (
            dirs.join(
                labels.select(F.col("node").alias("nbr"), "lab"), "nbr"
            )
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # synchronous update: argmax neighbor label, ties -> MIN label
        labels = (
            cnt.groupBy("node")
            .agg(
                F.expr("max_by(lab, struct(c, -lab))").alias("lab")
            )
            .localCheckpoint(eager=True)  # clamp lineage per round
        )
    internal = (
        edges.join(
            labels.select(F.col("node").alias("u"), F.col("lab").alias("lu")),
            "u",
        )
        .join(
            labels.select(F.col("node").alias("v"), F.col("lab").alias("lv")),
            "v",
        )
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_member"),
        )
        .join(internal, "community", "left")
        .select(
            F.col("community").cast("long").alias("community"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("min_member").cast("long").alias("min_member"),
            F.coalesce("internal_edges", F.lit(0))
            .cast("long")
            .alias("internal_edges"),
        )
    )


def _lpa_chain_sql(rounds: int) -> str:
    parts = [
        f"""WITH {_COORDER_EDGES_CTE},
d AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e
),
l0 AS MATERIALIZED (
  SELECT DISTINCT node, node AS lab FROM d
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
c{r} AS MATERIALIZED (
  SELECT d.node, l.lab, CAST(COUNT(*) AS BIGINT) AS c
  FROM d JOIN l{r - 1} l ON l.node = d.nbr
  GROUP BY 1, 2
),
l{r} AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT node, lab,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
    FROM c{r}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT l.lab AS community,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(l.node) AS BIGINT) AS min_member,
       CAST(COALESCE(MAX(i.internal_edges), 0) AS BIGINT) AS internal_edges
FROM l{rounds} l
LEFT JOIN (
  SELECT a.lab AS community, CAST(COUNT(*) AS BIGINT) AS internal_edges
  FROM e
  JOIN l{rounds} a ON a.node = e.u
  JOIN l{rounds} b ON b.node = e.v
  WHERE a.lab = b.lab
  GROUP BY 1
) i ON i.community = l.lab
GROUP BY 1"""
    )
    return "".join(parts)


PARTS_COORDER_COMMUNITIES_SQL = _lpa_chain_sql(LPA_ROUNDS)


# deferred: interpolates the LPA-communities oracle defined above
PARTS_GRAPH_SUITE_SQL = _graph_suite_sql().replace(
    "{LPA}", PARTS_COORDER_COMMUNITIES_SQL
)
