"""Relational query surface over the star schema.

Each query is (spark_fn, oracle_sql) — the Spark side is declarative
DataFrame API (Catalyst: pushdown, pruning, broadcast), the oracle is
independent DuckDB SQL for the differential gate. Operator ids (§2 of
SURVEY.md) are noted per query.

Scale notes common to all: dimension tables (region/nation/customer/
supplier/part) are broadcast — no shuffle of the fact side for enrichment
joins (reference's CH hash-join with in-memory dims, src/api.ts:403-425).
Aggregations rely on Spark's map-side partial agg; top-k compiles to
TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .util import dsum, ranked_topk, sql_dsum

# --- pricing_summary: TPC-H Q1 shape. A1 hash agg, A2, P1/P2 projection+filter,
#     exact decimal sums (§2.4; reference src/api.ts:348-364 leaderboard agg shape).


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 4))
        .withColumn(
            "avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 4)
        )
    )
    return out


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity", "sum_qty")},
       {sql_dsum("l_extendedprice", "sum_base_price")},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       COUNT(*) AS count_order,
       ROUND(sum_qty / COUNT(*), 4) AS avg_qty,
       ROUND(sum_base_price / COUNT(*), 4) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- shipping_priority: TPC-H Q3 shape. J1 fact-dim joins + agg + T1 top-k.


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    # orders is a fact table — join it normally (AQE picks the strategy);
    # only the filtered customer dim is an explicit broadcast.
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    return out


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, o_orderdate,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- regional_supplier_volume: TPC-H Q5 shape. J1 multi-way broadcast joins.


def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    return out


REGIONAL_SUPPLIER_VOLUME_SQL = f"""
SELECT r_name, n_name,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name
"""


# --- late_order_priority: TPC-H Q4 shape. Left-semi (EXISTS) join + A1.


def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


LATE_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


# --- customers_without_urgent_orders: J8 anti-join (reference skip-set
#     semantics, src/ledger-engine.ts:972-1095) + A1. The skip side is
#     the URGENT-priority order set: every customer in this testdata
#     has >= 1 order (a plain "without orders" anti-join compares empty
#     sets at every SF — r14 verdict item 2), while ~13% lack an urgent
#     one, so the anti-join is populated at sf0.001/0.01/0.1
#     (18/203/1986 survivors, measured).


def customers_without_urgent_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal"), "total_acctbal"),
        )
    )


CUSTOMERS_WITHOUT_URGENT_ORDERS_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       {sql_dsum("c_acctbal", "total_acctbal")}
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""


# --- returns_conditional: A2 sumIf/countIf (reference src/api.ts:1249-1250,
#     src/build-rollup-1d.ts:76-78), P4 IN-list filter.


def returns_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N", "R")
    )
    is_f = F.col("l_linestatus") == "F"
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(is_f, 1)).alias("n_finished"),
        F.count(F.when(~is_f, 1)).alias("n_open"),
        dsum(F.when(is_f, F.col("l_quantity")).otherwise(F.lit(0.0)), "qty_finished"),
        dsum(
            F.when(is_f, F.col("l_extendedprice") * (1 - F.col("l_discount"))).otherwise(
                F.lit(0.0)
            ),
            "rev_finished",
        ),
    )


RETURNS_CONDITIONAL_SQL = f"""
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE l_linestatus <> 'F') AS n_open,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END", "qty_finished")},
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", "rev_finished")}
FROM lineitem
WHERE l_returnflag IN ('A', 'N', 'R')
GROUP BY l_returnflag
"""


# --- part_price_fallback: J9 existence-fallback join with coalesce
#     (reference src/api.ts:787-827 per-token fallback ladder).


def part_price_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sold = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice"), "sold_value"),
        dsum(F.col("l_quantity"), "sold_qty"),
    )
    return (
        part.join(sold, part.p_partkey == sold.l_partkey, "left")
        .select(
            "p_partkey",
            F.round(
                F.coalesce(
                    F.col("sold_value") / F.col("sold_qty"), F.col("p_retailprice")
                ),
                4,
            ).alias("eff_price"),
            (F.col("sold_qty").isNull()).alias("is_fallback"),
        )
    )


PART_PRICE_FALLBACK_SQL = f"""
WITH sold AS (
  SELECT l_partkey,
         {sql_dsum("l_extendedprice", "sold_value")},
         {sql_dsum("l_quantity", "sold_qty")}
  FROM lineitem GROUP BY l_partkey
)
SELECT p_partkey,
       ROUND(COALESCE(sold_value / sold_qty, p_retailprice), 4) AS eff_price,
       (sold_qty IS NULL) AS is_fallback
FROM part LEFT JOIN sold ON p_partkey = l_partkey
"""


# --- segment_top_customers: W4 ranking window per group.


def segment_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "c_custkey", "c_acctbal")
    )


SEGMENT_TOP_CUSTOMERS_SQL = """
SELECT c_mktsegment, rank, c_custkey, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rank
  FROM customer
)
WHERE rank <= 3
"""


# --- lineitem_page: T2 LIMIT/OFFSET pagination as a deterministic
#     row_number slice (reference src/api.ts:916-918,1174-1175).


def lineitem_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data — the
    # full 6-column key is, giving a total deterministic order (T3).
    # Page 3 (rows 101-150) via offset+limit → ONE TakeOrderedAndProject
    # (distributed partial top-k with skip), the Spark analog of the
    # reference's keyset cursor (src/ledger-engine.ts:519-572) — never a
    # global row_number over the whole fact table (round-1 verdict #2).
    order = [
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice",
    ]
    return ranked_topk(li, order, 50, rank_alias="rn", rank_offset=100).select(
        "rn", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


LINEITEM_PAGE_SQL = """
SELECT rn, l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey,
                            l_suppkey, l_quantity, l_extendedprice) AS rn, *
  FROM lineitem
)
WHERE rn > 100 AND rn <= 150
"""


# --- orders_monthly: date_trunc time bucketing (§2.8 date/time family).


def orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_value"),
        )
    )


ORDERS_MONTHLY_SQL = f"""
SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_value")}
FROM orders
GROUP BY 1, 2
"""


# --- party_volume_union: U1 union-relabel (reference wallet_trades view,
#     clickhouse/init/001_create_tables.sql:352-377) + W4 top-k per role.


def party_volume_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # ONE fact pass, not two: the union of (supplier-role rows off a raw
    # lineitem scan) and (customer-role rows off a lineitem⋈orders join)
    # scanned lineitem twice. Every lineitem row joins exactly one order
    # (inner FK join), so posexplode-ing each joined row into its two role
    # rows yields the IDENTICAL (role, party_key, amount) multiset while
    # scanning the fact table once (guide §2.3/2.4 — the oracle keeps the
    # UNION ALL form, so the differential proves the reshape).
    both = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("supplier").alias("role"),
                        F.col("l_suppkey").cast("long").alias("party_key"),
                    ),
                    F.struct(
                        F.lit("customer").alias("role"),
                        F.col("o_custkey").cast("long").alias("party_key"),
                    ),
                )
            ).alias("s"),
            F.col("l_extendedprice").alias("amount"),
        )
        .select("s.role", "s.party_key", "amount")
    )
    # role cardinality is 2 — a partitionBy("role") rank funnels every party
    # of a role through one task (round-1 verdict #5). Per-role TakeOrdered
    # branches keep the top-5 selection distributed; each branch's rank
    # window runs over ≤5 rows. The aggregated frame is checkpointed so the
    # two branches share ONE scan+join+agg instead of recomputing it.
    agg = (
        both.groupBy("role", "party_key")
        .agg(dsum(F.col("amount"), "volume"))
        .localCheckpoint(eager=True)
    )
    order = [F.desc("volume"), F.asc("party_key")]
    per_role = [
        ranked_topk(agg.filter(F.col("role") == role), order, 5)
        for role in ("supplier", "customer")
    ]
    return (
        per_role[0].unionByName(per_role[1])
        .select("role", "rank", "party_key", "volume")
    )


PARTY_VOLUME_UNION_SQL = f"""
WITH both_sides AS (
  SELECT 'supplier' AS role, CAST(l_suppkey AS BIGINT) AS party_key, l_extendedprice AS amount
  FROM lineitem
  UNION ALL
  SELECT 'customer' AS role, CAST(o_custkey AS BIGINT) AS party_key, l_extendedprice AS amount
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
agg AS (
  SELECT role, party_key, {sql_dsum("amount", "volume")}
  FROM both_sides GROUP BY role, party_key
)
SELECT role, rank, party_key, volume
FROM (
  SELECT role, party_key, volume,
         ROW_NUMBER() OVER (PARTITION BY role ORDER BY volume DESC, party_key) AS rank
  FROM agg
)
WHERE rank <= 5
"""


# --- cheapest_supplier_per_part: TPC-H Q2 shape — correlated subquery
#     (min cost per part) that Catalyst decorrelates into a join against a
#     grouped subquery; deterministic tiebreak on suppkey.


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supplier = load_table(spark, sf_dir, "supplier")
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            # scale-10 intermediate: rounding a 4-decimal sum then dividing
            # by small n creates exact .00005 ties where the engines'
            # rounding modes disagree; 10 decimals pushes ties to measure
            # zero before the final round(4)
            dsum(F.col("l_extendedprice") / F.col("l_quantity"),
                 "unit_price_sum", scale=10),
            F.count(F.lit(1)).alias("n"),
        )
        # rank on the raw double quotient (identical across engines — it's
        # a comparison, not a rounding); OUTPUT the exact-decimal components
        # instead of a rounded average: true data ties at .00005 make
        # round-then-compare engine-divergent (Java rounds the shortest
        # decimal repr, DuckDB rounds the binary value)
        .withColumn("avg_unit_price", F.col("unit_price_sum") / F.col("n"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("avg_unit_price"), F.asc("l_suppkey")
    )
    best = (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "unit_price_sum", "n")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select(
            "p_partkey", "p_name", "s_name",
            F.col("unit_price_sum").alias("best_price_sum"),
            F.col("n").alias("best_n"),
        )
    )


CHEAPEST_SUPPLIER_PER_PART_SQL = f"""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         {sql_dsum("l_extendedprice / l_quantity", "unit_price_sum", scale=10)},
         COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
priced AS (
  SELECT l_partkey, l_suppkey, unit_price_sum, n,
         unit_price_sum / n AS avg_unit_price
  FROM offers
),
best AS (
  SELECT l_partkey, l_suppkey, unit_price_sum, n
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
                                 ORDER BY avg_unit_price, l_suppkey) AS rn
    FROM priced
  ) WHERE rn = 1
)
SELECT p_partkey, p_name, s_name,
       unit_price_sum AS best_price_sum, n AS best_n
FROM best
JOIN part ON l_partkey = p_partkey AND p_size <= 10
JOIN supplier ON l_suppkey = s_suppkey
"""


# --- regional_rollup: BONUS beyond the reference (which has no grouping
#     sets — SURVEY §2.4 note): ROLLUP over (region, nation) revenue with
#     explicit grouping level, engine-aligned NULL markers.


def regional_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            dsum(F.col("o_totalprice"), "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("long").alias("level"),
        )
    )


REGIONAL_ROLLUP_SQL = f"""
SELECT r_name, n_name,
       {sql_dsum("o_totalprice", "revenue")},
       COUNT(*) AS n_orders,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS level
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --- supplier_share_having: A9 HAVING with a scalar-subquery threshold
#     (TPC-H Q11 shape; reference HAVING ladders, src/api.ts:348-364
#     leaderboard minimum-volume cut). The share comparison happens in
#     EXACT decimal space on both sides (sum*500 > total) — a double
#     threshold could straddle the cut at ulp level (CLAUDE.md).
#     Plan shape: one partial+final agg over the fact, the grand total is a
#     1-row broadcast crossJoin — no second fact scan per group.


def supplier_share_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .util import DEC

    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rev).alias("v"), F.count(F.lit(1)).alias("n_items")
    )
    # grand total re-aggregated from the per-supplier partials (exact
    # decimal sums are associative) — one fact scan, not two
    total = per_supp.agg(F.sum("v").alias("t"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 500 > F.col("t"))
        .select(
            "l_suppkey",
            F.round(F.col("v"), 4).cast("double").alias("supp_value"),
            "n_items",
        )
    )


SUPPLIER_SHARE_HAVING_SQL = """
SELECT l_suppkey,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 4) AS DOUBLE) AS supp_value,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_suppkey
HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) * 500 >
       (SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) FROM lineitem)
"""


# --- bloom_semijoin_filter: the bloom skip-index analog (P8's other
#     half, next to min/max layout skipping): a DETERMINISTIC Bloom
#     filter (k=3 md5-derived hashes into m=4096 bits) built over the
#     keys that HAVE orders, probed by every customer — the runtime-
#     filter shape Spark injects on shuffle joins, materialized as an
#     auditable operator. Reports exact membership accounting: hits =
#     customers whose k bits are all set; false positives = hits minus
#     true members (a Bloom filter can only overcount, never miss — the
#     same one-sided guarantee family as the CMS gate, and the
#     differential pins the exact value because the hash family is
#     fixed). fp ppm is integer arithmetic. At 100 TB the set-bit table
#     is at most m rows — broadcast — while the probe side streams.

BLOOM_M, BLOOM_K = 4096, 3


def bloom_semijoin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def bits(key_col):
        return [
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bloom{i}:"), key_col.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % BLOOM_M
            for i in range(BLOOM_K)
        ]

    # build over EARLY-window buyers only, so the all-customer probe has
    # real non-members and the false-positive accounting is a populated
    # differential (~45% membership at sf0.01, fp ≈ 6% with these m, k)
    members = orders.filter(
        F.col("o_orderdate") < F.lit("1995-06-01").cast("timestamp")
    )
    set_bits = (
        members.select(F.explode(F.array(*bits(F.col("o_custkey")))).alias("bit"))
        .distinct()
    )
    probe = customer.select(
        "c_custkey", F.posexplode(F.array(*bits(F.col("c_custkey")))).alias("i", "bit")
    )
    hits = (
        probe.join(F.broadcast(set_bits), "bit")
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == BLOOM_K)
        .select("c_custkey")
    )
    actual = members.select(F.col("o_custkey").alias("c_custkey")).distinct()
    n_cust = customer.select(F.count(F.lit(1)).alias("n_customers"))
    n_actual = actual.agg(F.count(F.lit(1)).alias("n_actual"))
    n_hits = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_cust.crossJoin(n_actual)
        .crossJoin(n_hits)
        .select(
            "n_customers",
            "n_actual",
            "n_hits",
            (F.col("n_hits") - F.col("n_actual")).alias("n_false_pos"),
            F.expr("(n_hits - n_actual) * 1000000 div n_customers").alias(
                "fp_ppm"
            ),
        )
    )


_BLOOM_BIT = (
    "CAST(CAST('0x' || substring(md5('bloom' || CAST(i AS VARCHAR) || ':' "
    f"|| CAST(k AS VARCHAR)), 1, 8) AS BIGINT) % {BLOOM_M} AS BIGINT)"
)

BLOOM_SEMIJOIN_FILTER_SQL = f"""
WITH rows_i AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i),
set_bits AS (
  SELECT DISTINCT {_BLOOM_BIT} AS bit
  FROM (SELECT o_custkey AS k FROM orders
        WHERE o_orderdate < TIMESTAMP '1995-06-01') CROSS JOIN rows_i
),
probe AS (
  SELECT k AS c_custkey, {_BLOOM_BIT} AS bit
  FROM (SELECT c_custkey AS k FROM customer) CROSS JOIN rows_i
),
hits AS (
  SELECT c_custkey
  FROM probe JOIN set_bits USING (bit)
  GROUP BY c_custkey
  HAVING COUNT(*) = {BLOOM_K}
),
counts AS (
  SELECT (SELECT COUNT(*) FROM customer) AS n_customers,
         (SELECT COUNT(DISTINCT o_custkey) FROM orders
          WHERE o_orderdate < TIMESTAMP '1995-06-01') AS n_actual,
         (SELECT COUNT(*) FROM hits) AS n_hits
)
SELECT CAST(n_customers AS BIGINT) AS n_customers,
       CAST(n_actual AS BIGINT) AS n_actual,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits - n_actual AS BIGINT) AS n_false_pos,
       CAST((n_hits - n_actual) * 1000000 // n_customers AS BIGINT) AS fp_ppm
FROM counts
"""


# --- nation_top_customers_others: the leaderboard-with-tail dashboard
#     pattern — per nation, the top-3 customers by exact order cents
#     each get a row, and EVERYTHING ELSE collapses into one '__other__'
#     row per nation (so the result is complete: per-nation sums are
#     conserved, pinned by the differential). One window rank + one
#     conditional regroup; the '__other__' aggregation happens on the
#     already-reduced per-customer frame, never on raw orders.

_TOPN_OTHERS = 3


def nation_top_customers_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    per_cust = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("cents"), F.asc("c_custkey")
    )
    ranked = per_cust.withColumn("r", F.row_number().over(w))
    return (
        ranked.withColumn(
            "who",
            F.when(
                F.col("r") <= _TOPN_OTHERS, F.col("c_custkey").cast("string")
            ).otherwise(F.lit("__other__")),
        )
        .groupBy(
            F.col("c_nationkey").alias("nation_key"), "who"
        )
        .agg(
            F.min(F.when(F.col("r") <= _TOPN_OTHERS, F.col("r"))).alias("rank"),
            F.sum("n").alias("n_orders"),
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n_customers"),
        )
    )


NATION_TOP_CUSTOMERS_OTHERS_SQL = f"""
WITH per_cust AS (
  SELECT c.c_nationkey, c.c_custkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY cents DESC, c_custkey ASC) AS r
  FROM per_cust
)
SELECT c_nationkey AS nation_key,
       CASE WHEN r <= {_TOPN_OTHERS} THEN CAST(c_custkey AS VARCHAR)
            ELSE '__other__' END AS who,
       CAST(MIN(CASE WHEN r <= {_TOPN_OTHERS} THEN r END) AS BIGINT) AS rank,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM ranked
GROUP BY 1, 2
"""


# --- brand_type_cube: full CUBE over (brand, type) — the companion of
#     regional_rollup's ROLLUP: all four grouping levels (detail, per
#     brand, per type, grand total) in one pass with the standard
#     grouping_id bitmask (leftmost column = high bit in BOTH engines).
#     Revenue in exact integer cents; the differential pins every
#     subtotal level against the oracle's native CUBE.


def brand_type_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .cube("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("cents").alias("cents"),
            F.grouping_id().cast("long").alias("level"),
        )
    )


BRAND_TYPE_CUBE_SQL = """
SELECT p_brand, p_type,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents,
       CAST(GROUPING(p_brand) * 2 + GROUPING(p_type) AS BIGINT) AS level
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY CUBE (p_brand, p_type)
"""


# --- events_encoding_advisor: COLUMN ENCODING ADVISOR — the physical-
#     design profiler behind ClickHouse's LowCardinality / Delta+RLE /
#     dictionary codec choices (reference analog: the MergeTree DDL in
#     clickhouse/init/001_create_tables.sql picks LowCardinality(String)
#     and codecs per column by exactly these statistics). For each
#     events column, computed in one unpivoted pass:
#       n, n_distinct (exact), total_bytes (varchar octet length),
#       runs = 1 + Σ(value != previous) in (ts, event_id) order WITHIN
#       each day partition (run-length is only meaningful inside a
#       file/part, so runs are counted per day and summed — the same
#       boundary a partitioned parquet layout has)
#     and the advisor verdict: 'rle' when runs*5 <= n, else 'dict' when
#     n_distinct*20 <= n, else 'plain' — exact integer cross-multiplied
#     thresholds (the docs_quality_filter discipline). The unpivot is a
#     stack() projection (no shuffle); runs use a window partitioned by
#     (column, day); everything else is one map-side-combinable agg.
#     Oracle: four per-column UNION ALL branches with LAG-based run
#     counts — a genuinely different formulation of the same profile.

_ENC_RLE_DEN = 5
_ENC_DICT_DEN = 20


def events_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return encoding_advisor_frame(load_table(spark, sf_dir, "events"))


def encoding_advisor_frame(events: DataFrame) -> DataFrame:
    """Core path over any events-shaped frame — factored out for the
    planted run/cardinality tests."""
    ev = events.select(
        "ts",
        "event_id",
        F.to_date("ts").alias("day"),
        F.expr(
            "stack(4, "
            "'event_type', CAST(event_type AS STRING), "
            "'user_id',    CAST(user_id AS STRING), "
            "'cents',      CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS STRING), "
            "'props',      CAST(props AS STRING)) AS (col_name, val)"
        ),
    )
    w = Window.partitionBy("col_name", "day").orderBy("ts", "event_id")
    runs_flagged = ev.withColumn(
        "is_run_start",
        F.when(
            F.lag("val").over(w).isNull() | (F.col("val") != F.lag("val").over(w)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    prof = runs_flagged.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("val").alias("n_distinct"),
        F.sum(F.octet_length("val")).alias("total_bytes"),
        F.sum("is_run_start").alias("runs"),
    )
    return prof.select(
        "col_name",
        F.col("n").cast("long").alias("n"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
        F.col("runs").cast("long").alias("runs"),
        F.expr(
            f"CASE WHEN runs * {_ENC_RLE_DEN} <= n THEN 'rle' "
            f"WHEN n_distinct * {_ENC_DICT_DEN} <= n THEN 'dict' "
            "ELSE 'plain' END"
        ).alias("encoding"),
    )


def _enc_branch_sql(col_name: str, expr: str) -> str:
    return f"""
SELECT '{col_name}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
       CAST(SUM(strlen(val)) AS BIGINT) AS total_bytes,
       CAST(SUM(CASE WHEN prev IS NULL OR val <> prev THEN 1 ELSE 0 END)
            AS BIGINT) AS runs
FROM (
  SELECT val,
         LAG(val) OVER (PARTITION BY day ORDER BY ts, event_id) AS prev,
         day, ts, event_id
  FROM (
    SELECT CAST({expr} AS VARCHAR) AS val,
           CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, ts, event_id
    FROM events
  )
)
"""


EVENTS_ENCODING_ADVISOR_SQL = f"""
WITH prof AS (
{_enc_branch_sql("event_type", "event_type")}
UNION ALL
{_enc_branch_sql("user_id", "user_id")}
UNION ALL
{_enc_branch_sql("cents", "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")}
UNION ALL
{_enc_branch_sql("props", "props")}
)
SELECT col_name, n, n_distinct, total_bytes, runs,
       CASE WHEN runs * {_ENC_RLE_DEN} <= n THEN 'rle'
            WHEN n_distinct * {_ENC_DICT_DEN} <= n THEN 'dict'
            ELSE 'plain' END AS encoding
FROM prof
"""


# --- suppliers_kept_waiting: the TPC-H Q21 SHAPE (suppliers who kept
#     orders waiting) adapted to this schema's date surface (no
#     l_receiptdate/l_commitdate in the fixture: "slow" = shipped more
#     than SLOW_LAG_DAYS after the order date). The hard part Q21 tests
#     is the correlated EXISTS ("another supplier participated in the
#     order") + NOT EXISTS ("no OTHER supplier was also slow")
#     composition. Spark-first rewrite: both quantifiers become per-order
#     AGGREGATES over one pass — n_suppliers >= 2 AND n_slow == 1 AND s
#     is the slow one — no correlated scan, one shuffle on orderkey,
#     then a count per supplier and a broadcast name join (top-k with
#     deterministic (waitcount DESC, s_suppkey) order). Oracle: the
#     LITERAL Q21 formulation — EXISTS / NOT EXISTS correlated
#     subqueries — so the declarative aggregate rewrite is proven
#     equivalent to the quantifier semantics. Reference analog: TPC-H
#     Q21 (public spec); fixture keys follow the driver testdata.

SLOW_LAG_DAYS = 60
WAITING_TOP_K = 25


def suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li.l_orderkey == orders.o_orderkey,
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                > SLOW_LAG_DAYS
            ).alias("slow"),
        )
        # a supplier may ship several lines of one order: quantifiers
        # range over DISTINCT (order, supplier[, slow]) participation
        .distinct()
    )
    # per_os feeds BOTH the per-order agg and the filtered join side —
    # unmaterialized, the scan+join+distinct+agg subtree executes once per
    # consumer (r15 profile). Eager localCheckpoint at the (order, supplier)
    # grain; bounded by the order x supplier participation set.
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("slow").alias("slow")
    ).localCheckpoint(eager=True)
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sup"),
        F.sum(F.col("slow").cast("long")).alias("n_slow"),
    )
    # per_o is ORDER-cardinality — never broadcast it; the equi-join on
    # l_orderkey reuses per_os's hash partitioning (no extra shuffle of
    # the filtered side beyond the agg that produced per_o)
    wait = (
        per_os.filter(F.col("slow"))
        .join(per_o, "l_orderkey")
        .filter((F.col("n_sup") >= 2) & (F.col("n_slow") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        wait.join(F.broadcast(sup), wait.l_suppkey == sup.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("numwait").cast("long").alias("numwait"),
        )
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(WAITING_TOP_K)
    )


SUPPLIERS_KEPT_WAITING_SQL = f"""
WITH lo AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey,
         date_diff('day', o.o_orderdate, l.l_shipdate) > {SLOW_LAG_DAYS}
           AS slow
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
),
p AS MATERIALIZED (
  SELECT l_orderkey, l_suppkey, MAX(slow) AS slow
  FROM lo GROUP BY 1, 2
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM p l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.slow
  -- the literal Q21 quantifiers
  AND EXISTS (SELECT 1 FROM p l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM p l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.slow)
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey
LIMIT {WAITING_TOP_K}
"""


# --- customer_order_distribution: the TPC-H Q13 SHAPE (custdist) — the
#     orders-per-customer histogram INCLUDING zero-order customers (the
#     left-join-then-histogram composition that trips naive inner-join
#     rewrites). Spark: left join + two hash aggs. Oracle: a correlated
#     SCALAR subquery count per customer — a genuinely different
#     derivation of the same histogram. Deterministic: one row per
#     c_count. Reference analog: TPC-H Q13 (public spec).


def customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_c = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_c.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(
            F.col("c_count").cast("long").alias("c_count"),
            F.col("custdist").cast("long").alias("custdist"),
        )
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  -- correlated scalar-subquery derivation (vs Spark's left join + agg)
  SELECT c.c_custkey,
         (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
           AS c_count
  FROM customer c
)
GROUP BY 1
"""


# --- relational_shapes_suite: fused TPC-H-shape audit (r9 rotation,
#     r8 verdict task 3) — EXECUTES three canonical relational shapes
#     verbatim and unpivots each to labeled (family, k, metric, value)
#     rows so one gate pins all three result sets:
#       q5_volume    — regional_supplier_volume (the 6-way broadcast-dim
#                      join + agg; this suite takes its window slot, a
#                      strict-superset swap — the displaced entry stays
#                      oracle-checked in the tail);
#       q21_waiting  — suppliers_kept_waiting (the EXISTS/NOT-EXISTS
#                      quantifier composition rewritten as per-order
#                      aggregates vs the oracle's literal subqueries);
#       q13_custdist — customer_order_distribution (zero-inclusive
#                      orders-per-customer histogram vs the oracle's
#                      correlated scalar-subquery count).
#     Values ride the fused-suite STRING discipline: counts are BIGINT,
#     the lone double (dsum revenue, already exact at 4dp) integerizes
#     via the identical IEEE FLOOR(x*10000+0.5) both engines perform
#     (the props_bucket_agg precedent).


def relational_shapes_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = regional_supplier_volume(spark, sf_dir).selectExpr(
        "'q5_volume' AS family",
        "r_name || '/' || n_name AS k",
        "stack(1, 'revenue_e4', CAST(CAST(FLOOR(revenue * 10000 + 0.5)"
        " AS BIGINT) AS STRING)) AS (metric, value)",
    )
    waitq = suppliers_kept_waiting(spark, sf_dir).selectExpr(
        "'q21_waiting' AS family",
        "CAST(s_suppkey AS STRING) AS k",
        "stack(2, 's_name', s_name,"
        " 'numwait', CAST(numwait AS STRING)) AS (metric, value)",
    )
    custd = customer_order_distribution(spark, sf_dir).selectExpr(
        "'q13_custdist' AS family",
        "CAST(c_count AS STRING) AS k",
        "stack(1, 'custdist', CAST(custdist AS STRING)) AS (metric, value)",
    )
    # r9 growth 2: the CUBE grouping-sets and explicit-value PIVOT
    # reshaping surfaces, executed verbatim (NULL grouping keys render
    # as the sentinel '~' — sorts after all real values, cross-engine)
    from .events import EVENT_TYPES, events_cube_volume, events_daily_type_pivot

    cube = events_cube_volume(spark, sf_dir).selectExpr(
        "'cube' AS family",
        "coalesce(event_type, '~') || '/' ||"
        " coalesce(CAST(day_part AS STRING), '~') AS k",
        "stack(3, 'volume_cents', CAST(volume_cents AS STRING),"
        " 'n', CAST(n AS STRING),"
        " 'level', CAST(level AS STRING)) AS (metric, value)",
    )
    pvt = events_daily_type_pivot(spark, sf_dir).selectExpr(
        "'pivot' AS family",
        "date_format(day, 'yyyy-MM-dd') AS k",
        "stack({}, {}) AS (metric, value)".format(
            len(EVENT_TYPES),
            ", ".join(
                f"'c_{t}', CAST(c_{t} AS STRING)" for t in EVENT_TYPES
            ),
        ),
    )
    return (
        reg.unionByName(waitq)
        .unionByName(custd)
        .unionByName(cube)
        .unionByName(pvt)
    )


RELATIONAL_SHAPES_SUITE_SQL = f"""
SELECT 'q5_volume' AS family, r.r_name || '/' || r.n_name AS k,
       'revenue_e4' AS metric,
       CAST(CAST(FLOOR(r.revenue * 10000 + 0.5) AS BIGINT) AS VARCHAR)
         AS value
FROM ({REGIONAL_SUPPLIER_VOLUME_SQL}) r
UNION ALL
SELECT 'q21_waiting' AS family, CAST(w.s_suppkey AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 's_name' THEN w.s_name
                     ELSE CAST(w.numwait AS VARCHAR) END AS value
FROM ({SUPPLIERS_KEPT_WAITING_SQL}) w,
     (SELECT unnest(['s_name','numwait']) AS metric) m
UNION ALL
SELECT 'q13_custdist' AS family, CAST(c.c_count AS VARCHAR) AS k,
       'custdist' AS metric, CAST(c.custdist AS VARCHAR) AS value
FROM ({CUSTOMER_ORDER_DISTRIBUTION_SQL}) c
UNION ALL
SELECT 'cube' AS family,
       COALESCE(cb.event_type, '~') || '/' ||
       COALESCE(CAST(cb.day_part AS VARCHAR), '~') AS k,
       m.metric,
       CASE m.metric WHEN 'volume_cents' THEN CAST(cb.volume_cents AS VARCHAR)
                     WHEN 'n' THEN CAST(cb.n AS VARCHAR)
                     ELSE CAST(cb.level AS VARCHAR) END AS value
FROM ({{CUBE_SQL}}) cb,
     (SELECT unnest(['volume_cents','n','level']) AS metric) m
UNION ALL
SELECT 'pivot' AS family, strftime(pv.day, '%Y-%m-%d') AS k, m.metric,
       CASE m.metric {{PIVOT_CASES}}
       END AS value
FROM ({{PIVOT_SQL}}) pv,
     (SELECT unnest([{{PIVOT_METRICS}}]) AS metric) m
"""


def _bind_relational_suite_sql() -> str:
    # deferred binding: the cube/pivot SQL lives in events.py (events
    # domain) and relational.py loads first in the registry import order
    from .events import (
        EVENT_TYPES,
        EVENTS_CUBE_VOLUME_SQL,
        EVENTS_DAILY_TYPE_PIVOT_SQL,
    )

    cases = " ".join(
        f"WHEN 'c_{t}' THEN CAST(pv.c_{t} AS VARCHAR)"
        for t in EVENT_TYPES[:-1]
    ) + f" ELSE CAST(pv.c_{EVENT_TYPES[-1]} AS VARCHAR)"
    metrics = ",".join(f"'c_{t}'" for t in EVENT_TYPES)
    return RELATIONAL_SHAPES_SUITE_SQL.replace(
        "{CUBE_SQL}", EVENTS_CUBE_VOLUME_SQL
    ).replace("{PIVOT_SQL}", EVENTS_DAILY_TYPE_PIVOT_SQL).replace(
        "{PIVOT_CASES}", cases
    ).replace("{PIVOT_METRICS}", metrics)
