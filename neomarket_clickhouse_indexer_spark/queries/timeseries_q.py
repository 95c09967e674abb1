"""ClickHouse sequential/time-series analytics analogs.

The reference's ClickHouse tier makes the sequential-analytics family
(sequenceMatch / sequenceCount, WITH FILL gap filling, histogram,
groupArrayMovingSum / runningDifference, largestTriangleThreeBuckets,
quantileDeterministic, sumMap, path/retention analysis) available to
every dashboard query (clickhouse/init/001_create_tables.sql keeps
event streams ordered for exactly these; src/api.ts's activity/candles
endpoints lean on bucketed time series). This module re-expresses that
family Spark-first: window functions + closed forms instead of per-row
sequential state wherever an equivalent exists (the Lindley reflection
for greedy pair counting, first-seen rewrite for running distinct,
median/MAD in nearest-rank integers), applyInPandas only where the
semantics are genuinely sequential (LTTB), and a real
applyInPandasWithState streaming query where the operator must hold
state across microbatches — so every operator is one or two shuffles
on the natural key and survives a 100× scale-up.

Determinism: event amounts are integerized to cents with
``floor(value*100 + 0.5)`` (pure IEEE double ops, bit-identical in Spark
and DuckDB — `value` ships with 2-decimal magnitudes far below 2^53/100),
every ordering carries the (ts, event_id) unique tiebreak, and timestamps
stay naive (NTZ) end-to-end with calendar/INTERVAL arithmetic only — no
epoch extraction, so results cannot depend on the driver session's
timezone (CLAUDE.md NTZ rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.sinks import prune_stale_staging
from ..sources.tables import load_table

# exact integer cents from the 2-decimal double `value`
_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


def _events_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", F.expr(_CENTS).alias("cents")
    )


# --- events_sequence_match: ClickHouse sequenceMatch()/sequenceCount()
#     analog. Per user over the (ts, event_id)-ordered event stream:
#
#     m_full   = sequenceMatch('(?1).*(?2).*(?3)') — a signup, then a
#                strictly later view, then a strictly later purchase.
#     m_window = same chain with the adjacent-step time constraint
#                (?2)(?t<=1d)(?3): the purchase lands within 1 day of
#                the matched (earliest-eligible) view.
#     n_pairs  = sequenceCount('(?1).*(?2)') over view→purchase: the
#                number of GREEDY NON-OVERLAPPING view→purchase pairs,
#                each event consumed at most once.
#
#     Spark computes n_pairs with the Lindley/reflection closed form
#     instead of a per-user sequential scan: treating view as '(' and
#     purchase as ')', the greedy matcher's unmatched-purchase count
#     equals the maximum prefix exceedance max(0, max_p(#P_p - #V_p)),
#     so  n_pairs = #P_total - max(0, max_p(cumP - cumV))  — two window
#     cumsums + one hash agg, no sequential state. The DuckDB oracle
#     runs the literal greedy automaton as a recursive CTE (pending
#     counter stepping row-by-row), so the differential PROVES the
#     closed form equals the sequential semantics on real data.


def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(key).alias("k1"))
    )
    v2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(key > F.col("k1"))
        .groupBy("user_id")
        .agg(F.min(key).alias("k2"))
    )
    p3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v2, "user_id")
        .filter(key > F.col("k2"))
        .groupBy("user_id")
        .agg(
            F.max(F.lit(True)).alias("m_full"),
            F.max(
                F.col("ts") <= F.col("k2.ts") + F.expr("INTERVAL 1 DAY")
            ).alias("m_window"),
        )
    )

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "view").cast("long").alias("is_v"),
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    exceed = flagged.select(
        "user_id",
        (F.sum("is_p").over(w) - F.sum("is_v").over(w)).alias("exceed"),
        "is_p",
    )
    pairs = exceed.groupBy("user_id").agg(
        (
            F.sum("is_p") - F.greatest(F.lit(0), F.max("exceed"))
        ).cast("long").alias("n_pairs")
    )

    return (
        pairs.join(p3, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("m_full", F.lit(False)).alias("m_full"),
            F.coalesce("m_window", F.lit(False)).alias("m_window"),
            "n_pairs",
        )
    )


EVENTS_SEQUENCE_MATCH_SQL = """
WITH RECURSIVE base AS MATERIALIZED (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events
),
ordered AS MATERIALIZED (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_rows
  FROM base
),
scan AS (
  -- the literal greedy view→purchase automaton, row by row
  SELECT user_id, 0 AS rn, 0 AS pending, 0 AS pairs
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT o.user_id, o.rn,
         CASE WHEN o.event_type = 'view' THEN s.pending + 1
              WHEN o.event_type = 'purchase' AND s.pending > 0
                THEN s.pending - 1
              ELSE s.pending END,
         CASE WHEN o.event_type = 'purchase' AND s.pending > 0
                THEN s.pairs + 1
              ELSE s.pairs END
  FROM scan s
  JOIN ordered o ON o.user_id = s.user_id AND o.rn = s.rn + 1
),
pairs_final AS (
  SELECT s.user_id, CAST(s.pairs AS BIGINT) AS n_pairs
  FROM scan s
  JOIN (SELECT user_id, MAX(rn) AS n_rows FROM ordered GROUP BY 1) t
    ON s.user_id = t.user_id AND s.rn = t.n_rows
),
s1 AS (
  SELECT user_id, MIN({'ts': ts, 'eid': event_id}) AS k1
  FROM base WHERE event_type = 'signup' GROUP BY 1
),
v2 AS (
  SELECT b.user_id, MIN({'ts': b.ts, 'eid': b.event_id}) AS k2
  FROM base b JOIN s1 ON b.user_id = s1.user_id
  WHERE b.event_type = 'view' AND {'ts': b.ts, 'eid': b.event_id} > s1.k1
  GROUP BY 1
),
p3 AS (
  SELECT b.user_id,
         TRUE AS m_full,
         MAX(b.ts <= (v2.k2).ts + INTERVAL 1 DAY) AS m_window
  FROM base b JOIN v2 ON b.user_id = v2.user_id
  WHERE b.event_type = 'purchase' AND {'ts': b.ts, 'eid': b.event_id} > v2.k2
  GROUP BY 1
)
SELECT pf.user_id,
       COALESCE(p3.m_full, FALSE) AS m_full,
       COALESCE(p3.m_window, FALSE) AS m_window,
       pf.n_pairs
FROM pairs_final pf
LEFT JOIN p3 ON pf.user_id = p3.user_id
"""


# --- events_gap_fill: ClickHouse `ORDER BY ... WITH FILL STEP 1 HOUR
#     INTERPOLATE (x AS prev)` analog. Hourly per-type buckets with every
#     missing hour materialized between that type's first and last
#     observed bucket; filled rows carry n_events = 0 and the
#     carry-forward of the last observed cents total (the INTERPOLATE
#     'prev' rule). Spark: agg → per-type min/max → sequence() explode
#     for the spine (the spine is generated DISTRIBUTED, per type-row —
#     never a driver-side loop) → left join → last(ignorenulls) window.
#     The spine join is broadcast-safe (spine cardinality = hours in
#     range × #types) and the carry-forward is one window over the
#     natural (type, bucket) order — at 100 TB the same plan holds with
#     the spine still tiny relative to the fact table.


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    agg = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("c"),
        )
    )
    spine = (
        agg.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("c", F.lit(0)).cast("long").alias("cents"),
            F.col("n").isNull().alias("filled"),
            F.last("c", ignorenulls=True).over(w).cast("long").alias("carry_cents"),
        )
    )


EVENTS_GAP_FILL_SQL = f"""
WITH agg AS (
  SELECT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         COUNT(*) AS n,
         SUM({_CENTS}) AS c
  FROM events
  GROUP BY 1, 2
),
rng AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY 1
),
spine AS (
  SELECT event_type,
         UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM rng
)
SELECT s.event_type,
       s.bucket,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(a.c, 0) AS BIGINT) AS cents,
       (a.n IS NULL) AS filled,
       CAST(LAST_VALUE(a.c IGNORE NULLS) OVER (
              PARTITION BY s.event_type ORDER BY s.bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS carry_cents
FROM spine s
LEFT JOIN agg a ON s.event_type = a.event_type AND s.bucket = a.bucket
"""


# --- events_value_histogram: ClickHouse histogram()/width_bucket analog
#     with exact integer bins: bin = cents DIV 2500 ($25-wide), per
#     (event_type, bin) count + exact cents mass, plus the per-type
#     cumulative count (the CDF the adaptive histogram() feeds) — one
#     hash agg + one window over the (type, bin) order, all integers.


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("event_type", F.expr("cents DIV 2500").alias("bin"), "cents")
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "event_type",
            "bin",
            (F.col("bin") * 2500).alias("bin_lo_cents"),
            "n",
            "sum_cents",
            F.sum("n").over(w).alias("cum_n"),
        )
    )


EVENTS_VALUE_HISTOGRAM_SQL = f"""
WITH binned AS (
  SELECT event_type,
         {_CENTS} // 2500 AS bin,
         {_CENTS} AS cents
  FROM events
),
hist AS (
  SELECT event_type, bin, COUNT(*) AS n, SUM(cents) AS sum_cents
  FROM binned GROUP BY 1, 2
)
SELECT event_type,
       bin,
       bin * 2500 AS bin_lo_cents,
       CAST(n AS BIGINT) AS n,
       CAST(sum_cents AS BIGINT) AS sum_cents,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_n
FROM hist
"""


# --- events_moving_stats: groupArrayMovingSum / runningDifference /
#     moving-average analog. Per (event_type, observed hourly bucket):
#     3-bucket moving sums (ROWS 2 PRECEDING), the previous-bucket delta
#     (runningDifference — NULL on each type's first bucket, like
#     neighbor()'s default), and the moving average in exact ppm integer
#     division. Buckets are the OBSERVED ones (no spine — gap filling is
#     events_gap_fill's job); all outputs integer-exact.


def events_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
        )
    )
    w3 = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-2, Window.currentRow)
    )
    wl = Window.partitionBy("event_type").orderBy("bucket")
    return hourly.select(
        "event_type",
        "bucket",
        "n",
        "cents",
        F.sum("n").over(w3).alias("mov3_n"),
        F.sum("cents").over(w3).alias("mov3_cents"),
        (F.col("n") - F.lag("n").over(wl)).alias("delta_n"),
        F.expr(
            "sum(cents) over (partition by event_type order by bucket "
            "rows between 2 preceding and current row) * 1000000 "
            "DIV count(*) over (partition by event_type order by bucket "
            "rows between 2 preceding and current row)"
        ).alias("mov3_avg_ppm"),
    )


EVENTS_MOVING_STATS_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         COUNT(*) AS n,
         SUM({_CENTS}) AS cents
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       bucket,
       CAST(n AS BIGINT) AS n,
       CAST(cents AS BIGINT) AS cents,
       CAST(SUM(n) OVER w3 AS BIGINT) AS mov3_n,
       CAST(SUM(cents) OVER w3 AS BIGINT) AS mov3_cents,
       CAST(n - LAG(n) OVER (PARTITION BY event_type ORDER BY bucket)
            AS BIGINT) AS delta_n,
       CAST(SUM(cents) OVER w3 AS BIGINT) * 1000000
         // CAST(COUNT(*) OVER w3 AS BIGINT) AS mov3_avg_ppm
FROM hourly
WINDOW w3 AS (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --- events_lttb_downsample: ClickHouse largestTriangleThreeBuckets()
#     analog — downsample each type's hourly (x = minutes, y = cents)
#     series to B = 24 visually-representative points. LTTB is genuinely
#     SEQUENTIAL (each bucket's pick depends on the previous pick), so
#     this is the applyInPandas case: one Arrow-batched kernel per
#     event_type group (series count = partition count; each series'
#     points fit one task — at 100 TB you'd pre-bucket each series to a
#     bounded candidate set first, same contract as the reference's
#     candle ladder). All arithmetic is exact: x = calendar-integer
#     minutes since 2024-01-01 (NTZ-safe, no epoch), y = integer cents,
#     triangle areas compared as exact cross products scaled by the
#     next-bucket size m (Python bigints in the kernel, HUGEINT in the
#     oracle — no doubles anywhere). Ties break to the smallest x.
#     Interior bucket of point i (1..n-2) is (i-1)*(B-2) div (n-2) —
#     every bucket non-empty since n-2 >= B-2. The DuckDB oracle replays
#     the same selection as a recursive CTE whose argmax step is a
#     NOT-EXISTS anti-join — an independent execution strategy.

_LTTB_B = 24


def lttb_select(pts: DataFrame, b: int) -> DataFrame:
    """Reusable LTTB core: ``pts`` has (event_type, x long, y long); one
    applyInPandas kernel per series selects ``min(n, b)`` points with
    exact integer cross-product areas (smallest-x tiebreak). Also backs
    the serving layer's chart_series endpoint."""
    import pandas as pd

    B = b

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("x").reset_index(drop=True)
        n = len(pdf)
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        if n <= B:
            sel = list(range(n))
        else:
            nb = B - 2
            buckets: list[list[int]] = [[] for _ in range(nb)]
            for i in range(1, n - 1):
                buckets[(i - 1) * nb // (n - 2)].append(i)
            sel = [0]
            a = 0
            for k in range(nb):
                if k + 1 < nb:
                    nxt = buckets[k + 1]
                    m = len(nxt)
                    sx = sum(xs[j] for j in nxt)
                    sy = sum(ys[j] for j in nxt)
                else:
                    m, sx, sy = 1, xs[n - 1], ys[n - 1]
                best, best_s = -1, -1
                for i in buckets[k]:
                    # 2*area of triangle (prev, candidate, next-centroid),
                    # scaled by m to stay integer
                    s = abs(
                        (xs[a] * m - sx) * (ys[i] - ys[a])
                        - (xs[a] - xs[i]) * (sy - ys[a] * m)
                    )
                    if s > best_s:
                        best_s, best = s, i
                sel.append(best)
                a = best
            sel.append(n - 1)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[:1].repeat(len(sel)).values,
                "pos": range(len(sel)),
                "x_min": [xs[i] for i in sel],
                "cents": [ys[i] for i in sel],
            }
        )

    return pts.groupBy("event_type").applyInPandas(
        kernel, "event_type string, pos long, x_min long, cents long"
    )


def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.sum("cents").alias("y"))
        .select(
            "event_type",
            (
                F.datediff("bucket", F.lit("2024-01-01").cast("date")) * 1440
                + F.hour("bucket") * 60
            ).cast("long").alias("x"),
            "y",
        )
    )
    return lttb_select(hourly, _LTTB_B)


EVENTS_LTTB_DOWNSAMPLE_SQL = f"""
WITH RECURSIVE hourly AS MATERIALIZED (
  SELECT event_type,
         datediff('day', DATE '2024-01-01',
                  CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS DATE)) * 1440
           + EXTRACT(hour FROM date_trunc('hour', CAST(ts AS TIMESTAMP))) * 60
           AS x,
         SUM({_CENTS}) AS y
  FROM events
  GROUP BY 1, 2
),
pts AS MATERIALIZED (
  SELECT event_type, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) - 1 AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
buck AS (
  SELECT event_type, x, y, i, n,
         CASE WHEN i >= 1 AND i <= n - 2
              THEN ((i - 1) * ({_LTTB_B} - 2)) // (n - 2) END AS k
  FROM pts
),
cent AS (
  SELECT event_type, k,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         COUNT(*) AS m
  FROM buck WHERE k IS NOT NULL GROUP BY 1, 2
),
lastp AS (
  SELECT event_type, x, y FROM pts WHERE i = n - 1
),
anchor AS (
  -- the "next" anchor for interior bucket k: centroid of bucket k+1,
  -- or the last point (m=1) for the final interior bucket
  SELECT b.event_type, b.k,
         COALESCE(c.sx, CAST(lp.x AS HUGEINT)) AS sx,
         COALESCE(c.sy, CAST(lp.y AS HUGEINT)) AS sy,
         COALESCE(c.m, 1) AS m
  FROM (SELECT DISTINCT event_type, k FROM buck WHERE k IS NOT NULL) b
  LEFT JOIN cent c ON c.event_type = b.event_type AND c.k = b.k + 1
  JOIN lastp lp ON lp.event_type = b.event_type
),
sel AS (
  SELECT event_type, -1 AS k,
         CAST(x AS HUGEINT) AS ax, CAST(y AS HUGEINT) AS ay,
         x AS x_min, y AS cents, 0 AS pos
  FROM pts WHERE i = 0 AND n > {_LTTB_B}
  UNION ALL
  SELECT s.event_type, s.k + 1,
         CAST(b.x AS HUGEINT), CAST(b.y AS HUGEINT),
         b.x, b.y, s.pos + 1
  FROM sel s
  JOIN anchor a ON a.event_type = s.event_type AND a.k = s.k + 1
  JOIN buck b ON b.event_type = s.event_type AND b.k = s.k + 1
  WHERE NOT EXISTS (
    SELECT 1 FROM buck b2
    WHERE b2.event_type = s.event_type AND b2.k = s.k + 1
      AND (
        ABS((s.ax * a.m - a.sx) * (b2.y - s.ay)
            - (s.ax - b2.x) * (a.sy - s.ay * a.m))
          > ABS((s.ax * a.m - a.sx) * (b.y - s.ay)
                - (s.ax - b.x) * (a.sy - s.ay * a.m))
        OR (
          ABS((s.ax * a.m - a.sx) * (b2.y - s.ay)
              - (s.ax - b2.x) * (a.sy - s.ay * a.m))
            = ABS((s.ax * a.m - a.sx) * (b.y - s.ay)
                  - (s.ax - b.x) * (a.sy - s.ay * a.m))
          AND b2.x < b.x
        )
      )
  )
)
SELECT event_type, CAST(pos AS BIGINT) AS pos,
       CAST(x_min AS BIGINT) AS x_min, CAST(cents AS BIGINT) AS cents
FROM sel
UNION ALL
SELECT event_type, CAST({_LTTB_B} - 1 AS BIGINT),
       CAST(x AS BIGINT), CAST(y AS BIGINT)
FROM pts WHERE i = n - 1 AND n > {_LTTB_B}
UNION ALL
SELECT event_type, CAST(i AS BIGINT), CAST(x AS BIGINT), CAST(y AS BIGINT)
FROM pts WHERE n <= {_LTTB_B}
"""


# --- user_type_value_map: ClickHouse sumMap() analog — per user, the
#     event_type → exact cents total "map", emitted as two aligned
#     key-sorted arrays (sumMap's canonical (keys[], values[]) return
#     shape; an actual MAP column would hash nondeterministically across
#     arrow implementations). One hash agg to (user, type), one
#     collect_list + sort_array to assemble — the collected list is
#     bounded by the type-dimension cardinality, never by event count.

def user_type_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    per = ev.groupBy("user_id", "event_type").agg(F.sum("cents").alias("c"))
    assembled = (
        per.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("event_type").alias("k"),
                                        F.col("c").alias("v")))
            ).alias("kv")
        )
    )
    # posexplode back to rows for the gate (array-typed outputs hash
    # poorly across engines — same discipline as docs_top_by_lang); the
    # sumMap (keys[], values[]) assembly is the `kv` column above.
    return assembled.select(
        "user_id", F.size("kv").cast("long").alias("n_types"),
        F.posexplode("kv").alias("pos", "entry")
    ).select(
        "user_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("entry.k").alias("type_key"),
        F.col("entry.v").alias("cents_value"),
        "n_types",
    )


USER_TYPE_VALUE_MAP_SQL = f"""
WITH per AS (
  SELECT user_id, event_type, CAST(SUM({_CENTS}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
asm AS (
  SELECT user_id,
         list_sort(list({{'k': event_type, 'v': c}})) AS kv
  FROM per GROUP BY 1
),
exploded AS (
  SELECT user_id, CAST(len(kv) AS BIGINT) AS n_types,
         unnest(generate_series(1, len(kv))) AS p, kv
  FROM asm
)
SELECT user_id,
       CAST(p - 1 AS BIGINT) AS pos,
       kv[p].k AS type_key,
       kv[p].v AS cents_value,
       n_types
FROM exploded
"""


# --- streaming_sequence_pairs: ST6-depth — the greedy view→purchase
#     automaton from events_sequence_match run as a REAL Structured
#     Streaming query (streaming/stateful.py::sequence_pairs_stream,
#     applyInPandasWithState over a 3-chunk file source). The batch gate
#     proves closed form == sequential automaton; this gate proves the
#     STREAMING fold reaches the same final state one microbatch at a
#     time — the oracle is the same literal recursive-CTE automaton,
#     additionally emitting the pending counter so the full end state
#     (not just the pair count) is pinned.


def streaming_sequence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import hashlib
    import os
    import shutil

    from ..streaming.stateful import sequence_pairs_stream

    inp = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # pid-scoped dirs: concurrent runs over the same fixture (pytest +
    # driver_sim) must not race on a shared source/checkpoint
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12] + f"_{os.getpid()}"
    prune_stale_staging("nmci_stream_pairs_")
    src = f"/tmp/nmci_stream_pairs_src_{tag}"
    ckpt = f"/tmp/nmci_stream_pairs_ckpt_{tag}"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(src)
    # event_id-range chunks preserve cross-batch event-time order
    # (event_id follows ts in the fixture); within a batch the operator
    # re-sorts by (ts, event_id)
    bounds = inp.approxQuantile("event_id", [0.33, 0.66], 0.0)
    chunks = [
        inp.filter(F.col("event_id") <= bounds[0]),
        inp.filter(
            (F.col("event_id") > bounds[0]) & (F.col("event_id") <= bounds[1])
        ),
        inp.filter(F.col("event_id") > bounds[1]),
    ]
    # FileStreamSource orders files by MODIFICATION TIME (latestFirst
    # defaults to false = oldest first); equal mtimes on a coarse-
    # resolution filesystem would leave chunk order unspecified and
    # corrupt the automaton state vs the oracle. Stage each chunk, move
    # its single part file under an ordered name, and FORCE strictly
    # increasing mtimes so batch order == chunk order on any filesystem.
    t_base = 1_700_000_000  # fixed epoch base — wall clock never read
    for i, c in enumerate(chunks):
        stage = f"{src}.stage{i}"
        c.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"chunk-{i:03d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t_base + i, t_base + i))
        shutil.rmtree(stage, ignore_errors=True)

    stream = (
        spark.readStream.schema(inp.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"sequence_pairs_{tag}"
    # scope the state-store partition count to this stream (same doctrine
    # as streaming_positions_state: a plain session's 200 shuffle
    # partitions would spawn 600 near-empty state tasks for 3 batches)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sequence_pairs_stream(stream, ckpt)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # a timeout would otherwise read a partially-folded
            # state and surface as a confusing hash mismatch
            raise RuntimeError(
                f"stream {name} did not terminate within 300s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # update-mode memory sink appends every per-batch emission; the row
    # with the highest n per user is the final automaton state
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max_by("pending", "n").alias("pending"),
            F.max_by("pairs", "n").alias("n_pairs"),
            F.max("n").alias("n_events"),
        )
        .select("user_id", "pending", "n_pairs", "n_events")
    )


STREAMING_SEQUENCE_PAIRS_SQL = """
WITH RECURSIVE base AS MATERIALIZED (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events
),
ordered AS MATERIALIZED (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM base
),
scan AS (
  SELECT user_id, 0 AS rn, 0 AS pending, 0 AS pairs
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT o.user_id, o.rn,
         CASE WHEN o.event_type = 'view' THEN s.pending + 1
              WHEN o.event_type = 'purchase' AND s.pending > 0
                THEN s.pending - 1
              ELSE s.pending END,
         CASE WHEN o.event_type = 'purchase' AND s.pending > 0
                THEN s.pairs + 1
              ELSE s.pairs END
  FROM scan s
  JOIN ordered o ON o.user_id = s.user_id AND o.rn = s.rn + 1
)
SELECT s.user_id,
       CAST(s.pending AS BIGINT) AS pending,
       CAST(s.pairs AS BIGINT) AS n_pairs,
       CAST(t.n_rows AS BIGINT) AS n_events
FROM scan s
JOIN (SELECT user_id, MAX(rn) AS n_rows FROM ordered GROUP BY 1) t
  ON s.user_id = t.user_id AND s.rn = t.n_rows
"""


# --- type_quantile_deterministic: ClickHouse quantileDeterministic()
#     analog. CH makes sampled quantiles reproducible by keying the
#     reservoir on a caller-supplied determinator; here the reservoir is
#     the K rows with the smallest md5(event_id) per type (the same
#     bottom-k-by-deterministic-hash mechanism as the KMV sketch, so the
#     sample is identical in both engines and across cluster sizes), and
#     the estimate is the NEAREST-RANK cents value at p50/p90 over the
#     sample — all integers, no interpolation, no rounding hazard. The
#     exact full-data nearest-rank quantile rides along so the gate also
#     pins the sampling error observed on the fixtures.

_QD_K = 256


def type_quantile_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir).select(
        "event_type",
        "cents",
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 12),
               16, 10).cast("long").alias("h"),
    )
    wsamp = Window.partitionBy("event_type").orderBy("h", "cents")
    samp = (
        ev.withColumn("rn", F.row_number().over(wsamp))
        .filter(F.col("rn") <= _QD_K)
    )
    wrank = Window.partitionBy("event_type").orderBy("cents", "h")

    def nearest_rank(df: DataFrame, p_num: int, p_den: int, alias: str):
        # nearest-rank: value at ceil(p * k) in the cents order
        ranked = df.withColumn("vr", F.row_number().over(wrank)).withColumn(
            "k", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        return (
            ranked.filter(
                F.col("vr") == F.expr(f"CAST(ceil(k * {p_num} / {p_den}) AS BIGINT)")
            )
            .select("event_type", F.col("cents").alias(alias))
        )

    s50 = nearest_rank(samp, 1, 2, "p50_sample")
    s90 = nearest_rank(samp, 9, 10, "p90_sample")
    e50 = nearest_rank(ev, 1, 2, "p50_exact")
    e90 = nearest_rank(ev, 9, 10, "p90_exact")
    return (
        s50.join(s90, "event_type")
        .join(e50, "event_type")
        .join(e90, "event_type")
        .select(
            "event_type", "p50_sample", "p90_sample", "p50_exact", "p90_exact"
        )
    )


TYPE_QUANTILE_DETERMINISTIC_SQL = f"""
WITH ev AS (
  SELECT event_type, {_CENTS} AS cents,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS BIGINT)
           AS h
  FROM events
),
samp AS (
  SELECT event_type, cents, h
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, cents)
              AS rn
    FROM ev
  ) WHERE rn <= {_QD_K}
),
sr AS (
  SELECT event_type, cents, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, h) AS vr,
         COUNT(*) OVER (PARTITION BY event_type) AS k
  FROM samp
),
er AS (
  SELECT event_type, cents, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, h) AS vr,
         COUNT(*) OVER (PARTITION BY event_type) AS k
  FROM ev
),
s50 AS (SELECT event_type, cents AS p50_sample FROM sr
        WHERE vr = CAST(ceil(k * 1 / 2) AS BIGINT)),
s90 AS (SELECT event_type, cents AS p90_sample FROM sr
        WHERE vr = CAST(ceil(k * 9 / 10) AS BIGINT)),
e50 AS (SELECT event_type, cents AS p50_exact FROM er
        WHERE vr = CAST(ceil(k * 1 / 2) AS BIGINT)),
e90 AS (SELECT event_type, cents AS p90_exact FROM er
        WHERE vr = CAST(ceil(k * 9 / 10) AS BIGINT))
SELECT s50.event_type, s50.p50_sample, s90.p90_sample,
       e50.p50_exact, e90.p90_exact
FROM s50 JOIN s90 USING (event_type)
JOIN e50 USING (event_type) JOIN e90 USING (event_type)
"""


# --- events_top_paths: journey/path analysis — the classic companion of
#     funnels in event analytics. Per user, the (ts, event_id)-ordered
#     3-step event-type paths (via two leads — no per-user collect), then
#     the corpus-wide top-10 paths by frequency with full-path tiebreak.
#     One window + one hash agg + TakeOrdered; path cardinality is
#     |types|^3, so the final top-k never materializes user data.


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
    )
    counts = tri.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.countDistinct("user_id").alias("n_users"),
    )
    wr = Window.orderBy(F.desc("n_paths"), "e1", "e2", "e3")
    return (
        counts.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("rank", "e1", "e2", "e3", "n_paths", "n_users")
    )


EVENTS_TOP_PATHS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
counts AS (
  SELECT e1, e2, e3,
         CAST(COUNT(*) AS BIGINT) AS n_paths,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM ordered WHERE e3 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_paths DESC, e1, e2, e3) AS BIGINT)
         AS rank,
       e1, e2, e3, n_paths, n_users
FROM counts
QUALIFY rank <= 10
"""


# --- events_outlier_buckets: robust time-series anomaly detection — the
#     median/MAD outlier rule (the robust cousin of z-scores, immune to
#     the outliers it hunts) over per-type hourly event counts, entirely
#     in integer arithmetic: med = nearest-rank median of hourly counts,
#     mad = nearest-rank median of |n - med|, outlier ⇔ |n - med| >
#     3 * mad. Every median uses the (value, bucket) tiebreak so both
#     engines select the same row. Two windows + one broadcast-sized
#     per-type stats join; emits only the anomalous buckets.


def events_outlier_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))

    def nearest_rank_med(df: DataFrame, val: str, alias: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val, "bucket")
        ranked = df.withColumn("vr", F.row_number().over(w)).withColumn(
            "k", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        return ranked.filter(
            F.col("vr") == F.expr("CAST(ceil(k / 2) AS BIGINT)")
        ).select("event_type", F.col(val).alias(alias))

    med = nearest_rank_med(hourly, "n", "med")
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = nearest_rank_med(dev, "dev", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 3 * F.col("mad"))
        .select("event_type", "bucket", "n", "med", "mad",
                F.col("dev").alias("abs_dev"))
    )


EVENTS_OUTLIER_BUCKETS_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
medr AS (
  SELECT event_type, n AS med
  FROM (
    SELECT event_type, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, bucket)
             AS vr,
           COUNT(*) OVER (PARTITION BY event_type) AS k
    FROM hourly
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
),
dev AS (
  SELECT h.event_type, h.bucket, h.n, m.med, abs(h.n - m.med) AS dev
  FROM hourly h JOIN medr m USING (event_type)
),
madr AS (
  SELECT event_type, dev AS mad
  FROM (
    SELECT event_type, dev,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, bucket)
             AS vr,
           COUNT(*) OVER (PARTITION BY event_type) AS k
    FROM dev
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
)
SELECT d.event_type, d.bucket, d.n, d.med, ma.mad, d.dev AS abs_dev
FROM dev d JOIN madr ma USING (event_type)
WHERE d.dev > 3 * ma.mad
"""


# --- events_cumulative_distinct_users: running distinct count — the
#     growth-dashboard staple ("total unique users to date" per day).
#     The naive formulation is a running COUNT(DISTINCT) — O(days x
#     users) state and quadratic recompute; the scale rewrite is the
#     FIRST-SEEN trick: distinct-to-date(d) = count of users whose FIRST
#     event date <= d, i.e. one min-agg per user, one count per
#     first-seen day, one cumulative window over the (tiny) day spine.
#     The DuckDB oracle RUNS THE NAIVE FORMULATION (a correlated
#     count-distinct per day), so the differential proves the rewrite.
#     Day arithmetic stays calendar (NTZ-safe); days with activity but
#     no new users still appear (left join to the active-day spine).


def events_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir).select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    )
    days = ev.select("d").distinct()
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    new_per_day = first_seen.groupBy("d0").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        days.join(new_per_day, days.d == new_per_day.d0, "left")
        .select(
            "d", F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new")
        )
        .withColumn("cum_users", F.sum("n_new").over(w).cast("long"))
    )


EVENTS_CUMULATIVE_DISTINCT_USERS_SQL = """
WITH ev AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d FROM events
),
days AS (SELECT DISTINCT d FROM ev)
SELECT days.d,
       -- the naive running-distinct formulation, computed per day
       CAST((SELECT COUNT(DISTINCT e.user_id) FROM ev e WHERE e.d <= days.d)
            - (SELECT COUNT(DISTINCT e.user_id) FROM ev e WHERE e.d < days.d)
         AS BIGINT) AS n_new,
       CAST((SELECT COUNT(DISTINCT e.user_id) FROM ev e WHERE e.d <= days.d)
         AS BIGINT) AS cum_users
FROM days
"""


# --- events_rolling_p95: windowed quantile — rolling p95 of per-event
#     cents over the trailing 24 hourly buckets (the SLO-dashboard
#     shape). Exact and deterministic: per-bucket sorted value arrays,
#     a 24-row window collects them, flatten + array_sort + nearest
#     rank — no sketch, no interpolation; the frame bounds the state
#     (24 x per-bucket values), which is what makes the exact form
#     viable (the unbounded version is type_value_percentiles' job).


def events_rolling_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.sort_array(F.collect_list("cents")).alias("vals"),
        F.count(F.lit(1)).alias("n"),
    )
    w24 = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-23, Window.currentRow)
    )
    return (
        hourly.withColumn(
            "window_vals",
            F.array_sort(F.flatten(F.collect_list("vals").over(w24))),
        )
        .select(
            "event_type",
            "bucket",
            F.col("n").cast("long").alias("n"),
            F.size("window_vals").cast("long").alias("n_window"),
            F.element_at(
                "window_vals",
                F.expr("CAST(ceil(size(window_vals) * 19 / 20) AS INT)"),
            ).alias("p95_cents"),
        )
    )


EVENTS_ROLLING_P95_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         list_sort(list({_CENTS})) AS vals,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, bucket, n,
         list_sort(flatten(list(vals) OVER (
           PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN 23 PRECEDING AND CURRENT ROW
         ))) AS window_vals
  FROM hourly
)
SELECT event_type, bucket, n,
       CAST(len(window_vals) AS BIGINT) AS n_window,
       window_vals[CAST(ceil(len(window_vals) * 19 / 20) AS BIGINT)]
         AS p95_cents
FROM win
"""


# --- hourly_vwap: weighted aggregation — the volume-weighted average
#     price per (type, hour), weights from the JSON props column (the
#     reference's quantity analog; §2.8 JSON). Emitted as EXACT integer
#     components (numerator = Σ cents·k, denominator = Σ k) plus the
#     ppm integer ratio — never a float division, so no rounding hazard.


def hourly_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        F.expr(_CENTS).alias("cents"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return (
        ev.filter(F.col("k") > 0)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.col("cents") * F.col("k")).alias("num_cents_k"),
        )
        .withColumn(
            "vwap_ppm", F.expr("num_cents_k * 1000000 DIV sum_k")
        )
    )


HOURLY_VWAP_SQL = f"""
SELECT event_type,
       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(SUM(cents * k) AS BIGINT) AS num_cents_k,
       CAST(SUM(cents * k) AS BIGINT) * 1000000 // CAST(SUM(k) AS BIGINT)
         AS vwap_ppm
FROM (
  SELECT event_type, ts, {_CENTS} AS cents,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
WHERE k > 0
GROUP BY 1, 2
"""


# --- events_cusum_alarms: CUSUM change-point detection over per-type
#     hourly counts — the classic drift monitor. The automaton is
#     S_t = max(0, S_{t-1} + (x_t - k)) with alarm when S_t > h; the
#     Spark side uses the REFLECTION closed form instead of sequential
#     state:  S_t = P_t - least(0, min_{q<=t} P_q)  where P = running
#     sum of (x - k) — two windows, no recursion (the third
#     closed-form-vs-automaton differential after greedy sequenceCount
#     and the Lindley snapshot oracle). Reference level k = the type's
#     nearest-rank median hourly count, alarm threshold h = 6*MAD + 1 —
#     all integers with (value, bucket) median tiebreaks. The oracle
#     runs the literal recursive automaton.


def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    n_par = spark.sparkContext.defaultParallelism
    # persist + repartition-on-key: the hourly series feeds the median
    # pass AND the deviation join, and dev feeds the MAD pass AND the
    # scored chain — without persists the raw scan re-executes per
    # consumer, and each window over the calendar-bounded frame would
    # pay the plain session's 200 shuffle partitions (this entry was the
    # most expensive gate slot at 13s before; the supplier_pagerank /
    # fused-subtree doctrine applies verbatim)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .repartition(n_par, "event_type")
        .persist()
    )
    return cusum_alarms_frame(hourly)


def cusum_alarms_frame(hourly: DataFrame) -> DataFrame:
    """Core CUSUM path over a (persisted) per-(type, hour-bucket) count
    frame — factored out so events_series_suite can feed it from its
    shared persisted corpus scan."""

    def nr_med(df: DataFrame, val: str, alias: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val, "bucket")
        r = df.withColumn("vr", F.row_number().over(w)).withColumn(
            "k", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        return r.filter(
            F.col("vr") == F.expr("CAST(ceil(k / 2) AS BIGINT)")
        ).select("event_type", F.col(val).alias(alias))

    med = nr_med(hourly, "n", "med")
    dev = (
        hourly.join(F.broadcast(med), "event_type")
        .withColumn("dev", F.abs(F.col("n") - F.col("med")))
        .persist()
    )
    mad = nr_med(dev, "dev", "mad")

    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn("p", F.sum(F.col("n") - F.col("med")).over(wcum))
        .withColumn(
            "s",
            F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(wcum)),
        )
        .withColumn("h", 6 * F.col("mad") + 1)
    )
    return scored.filter(F.col("s") > F.col("h")).select(
        "event_type", "bucket", "n", "med",
        F.col("s").cast("long").alias("cusum"),
        F.col("h").cast("long").alias("threshold"),
    )


EVENTS_CUSUM_ALARMS_SQL = """
WITH RECURSIVE hourly AS MATERIALIZED (
  SELECT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
medr AS (
  SELECT event_type, n AS med FROM (
    SELECT event_type, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, bucket) AS vr,
           COUNT(*) OVER (PARTITION BY event_type) AS k
    FROM hourly
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
),
dev AS MATERIALIZED (
  SELECT h.event_type, h.bucket, h.n, m.med, abs(h.n - m.med) AS dev
  FROM hourly h JOIN medr m USING (event_type)
),
madr AS (
  SELECT event_type, dev AS mad FROM (
    SELECT event_type, dev,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, bucket)
             AS vr,
           COUNT(*) OVER (PARTITION BY event_type) AS k
    FROM dev
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
),
ordered AS MATERIALIZED (
  SELECT d.event_type, d.bucket, d.n, d.med, ma.mad,
         ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.bucket)
           AS rn
  FROM dev d JOIN madr ma USING (event_type)
),
-- the literal CUSUM automaton, row by row
scan AS (
  SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS s
  FROM (SELECT DISTINCT event_type FROM ordered)
  UNION ALL
  SELECT o.event_type, o.rn,
         CASE WHEN sc.s + (o.n - o.med) > 0
              THEN sc.s + (o.n - o.med) ELSE 0 END
  FROM scan sc
  JOIN ordered o ON o.event_type = sc.event_type AND o.rn = sc.rn + 1
)
SELECT o.event_type, o.bucket, o.n, o.med,
       sc.s AS cusum,
       CAST(6 * o.mad + 1 AS BIGINT) AS threshold
FROM scan sc
JOIN ordered o ON o.event_type = sc.event_type AND o.rn = sc.rn
WHERE sc.s > 6 * o.mad + 1
"""


# --- type_weighted_median: exact weighted median — the robust
#     counterpart of hourly_vwap's weighted mean (quantileExactWeighted
#     in ClickHouse terms): per type, the smallest cents value whose
#     running weight (JSON-extracted k) reaches half the total. Spark
#     scans the (cents, event_id)-ordered running cumsum and takes the
#     first crossing (min struct); the oracle characterizes the answer
#     POINTWISE instead — the value v where strictly-below weight is
#     < half and inclusive weight >= half — no running scan at all, so
#     the two formulations of "weighted median" check each other. All
#     integer; half = total DIV 2 + (total % 2) (ceil) in both engines.


def type_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr(_CENTS).alias("cents"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    ).filter(F.col("k") > 0)
    wtot = Window.partitionBy("event_type")
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("cents", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = ev.select(
        "event_type",
        "cents",
        F.sum("k").over(wrun).alias("cum_k"),
        F.sum("k").over(wtot).alias("tot_k"),
    ).withColumn("half", F.expr("tot_k DIV 2 + tot_k % 2"))
    return (
        scanned.filter(F.col("cum_k") >= F.col("half"))
        .groupBy("event_type")
        .agg(
            F.min("cents").alias("wmedian_cents"),
            F.max("tot_k").alias("tot_k"),
        )
    )


TYPE_WEIGHTED_MEDIAN_SQL = f"""
WITH ev AS (
  SELECT event_type, {_CENTS} AS cents,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
  WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 0
),
tot AS (
  SELECT event_type, CAST(SUM(k) AS BIGINT) AS tot_k FROM ev GROUP BY 1
),
vals AS (
  SELECT event_type, cents, CAST(SUM(k) AS BIGINT) AS kv
  FROM ev GROUP BY 1, 2
),
-- pointwise characterization: below < half <= inclusive
marked AS (
  SELECT v.event_type, v.cents, t.tot_k,
         (SELECT CAST(COALESCE(SUM(v2.kv), 0) AS BIGINT) FROM vals v2
           WHERE v2.event_type = v.event_type AND v2.cents < v.cents)
           AS below,
         t.tot_k // 2 + t.tot_k % 2 AS half
  FROM vals v JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(cents AS BIGINT) AS wmedian_cents,
       tot_k
FROM marked
WHERE below < half AND below + (SELECT kv FROM vals v3
        WHERE v3.event_type = marked.event_type
          AND v3.cents = marked.cents) >= half
"""


# --- type_cooccurrence_lift: market-basket association mining — which
#     event types co-occur in the same user's history more than chance
#     predicts. Baskets = per-user DISTINCT type sets (bounded by the
#     type-dimension cardinality, so the pair explode is tiny);
#     support counts per type and per ordered pair; lift in exact ppm:
#     lift = P(ab) / (P(a)P(b)) = n_ab * N * 1e6 DIV (n_a * n_b) —
#     one integer expression, no floats. The classic first step of
#     recommendation / affinity analysis.


def type_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = baskets.select("user_id").distinct().count()  # scalar
    singles = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = baskets.select("user_id", F.col("event_type").alias("ta"))
    b = baskets.select("user_id", F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            "ta",
            "tb",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(f"n_ab * {n_users} * 1000000 DIV (n_a * n_b)").alias(
                "lift_ppm"
            ),
        )
    )


TYPE_COOCCURRENCE_LIFT_SQL = """
WITH baskets AS (
  SELECT DISTINCT user_id, event_type FROM events
),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM baskets),
singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM baskets GROUP BY 1
),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb, p.n_ab, sa.n AS n_a, sb.n AS n_b,
       p.n_ab * nu.n_users * 1000000 // (sa.n * sb.n) AS lift_ppm
FROM pairs p
JOIN singles sa ON p.ta = sa.event_type
JOIN singles sb ON p.tb = sb.event_type, nu
"""


# --- events_drift_chi2: two-sample distribution-drift detection — the
#     deploy-time "did the data change?" monitor. Events split into two
#     halves by md5(event_id) parity (iid by construction); half B gets
#     a DETERMINISTIC injected shift for one type ('error': cents
#     +12500 = five $25 histogram bins), so the gate demonstrates
#     detection, not just agreement. Statistic = the two-sample
#     chi-square over $25 bins kept integer-exact per bin:
#     (o1*N2 - o2*N1)^2 DIV (N1*N2*(o1+o2)) summed ("floor-chi2" —
#     per-bin floor division, identical association both engines). The
#     squared numerator scales ~N^4 per type (int64 would wrap silently
#     near ~55k events/type), so it is computed in DECIMAL(38,0) /
#     HUGEINT on both sides — exact through N ~ 3e9 events/type; the
#     per-bin quotient itself is <= o1+o2 and returns to BIGINT. Alarm is df-SCALED (chi2 >
#     5*n_bins — chi-square critical values grow with df, not N), which
#     separates decisively at both gate SFs: drifted type 176/1709 vs
#     clean max 3/13 against thresholds 65/90.

_DRIFT_SHIFT = 12500
_DRIFT_FLAG_PER_BIN = 5


def events_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    half = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 2
    )
    shifted = ev.withColumn("h", half).withColumn(
        "cents2",
        F.when(
            (F.col("h") == 1) & (F.col("event_type") == "error"),
            F.col("cents") + _DRIFT_SHIFT,
        ).otherwise(F.col("cents")),
    )
    binned = shifted.select(
        "event_type", "h", F.expr("cents2 DIV 2500").alias("bin")
    )
    per_bin = (
        binned.groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).alias("o1"),
            F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("o2"),
        )
    )
    totals = per_bin.groupBy("event_type").agg(
        F.sum("o1").alias("n1"), F.sum("o2").alias("n2")
    )
    return (
        per_bin.join(F.broadcast(totals), "event_type")
        .withColumn(
            # DECIMAL(38,0) (= the oracle's HUGEINT): diff² scales ~N⁴ per
            # type and would silently wrap int64 near ~55k events/type;
            # decimal keeps it exact through N ~ 3e9 (verified identical
            # to DuckDB's HUGEINT floor division)
            "term",
            F.expr(
                "CAST((CAST(o1 AS DECIMAL(38,0)) * n2 - CAST(o2 AS DECIMAL(38,0)) * n1)"
                " * (CAST(o1 AS DECIMAL(38,0)) * n2 - CAST(o2 AS DECIMAL(38,0)) * n1)"
                " DIV (CAST(n1 AS DECIMAL(38,0)) * n2 * (o1 + o2)) AS LONG)"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("term").alias("chi2_floor"),
        )
        .withColumn(
            "drifted",
            F.col("chi2_floor") > _DRIFT_FLAG_PER_BIN * F.col("n_bins"),
        )
    )


EVENTS_DRIFT_CHI2_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 6) AS BIGINT)
           % 2 AS h,
         {_CENTS} AS cents
  FROM events
),
shifted AS (
  SELECT event_type, h,
         CASE WHEN h = 1 AND event_type = 'error' THEN cents + {_DRIFT_SHIFT}
              ELSE cents END AS cents2
  FROM ev
),
per_bin AS (
  SELECT event_type, cents2 // 2500 AS bin,
         CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
         CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS o2
  FROM shifted GROUP BY 1, 2
),
totals AS (
  SELECT event_type, CAST(SUM(o1) AS BIGINT) AS n1,
         CAST(SUM(o2) AS BIGINT) AS n2
  FROM per_bin GROUP BY 1
),
terms AS (
  -- HUGEINT (= the Spark side's DECIMAL(38,0)): diff^2 scales ~N^4 and
  -- exceeds int64 near ~55k events/type
  SELECT p.event_type, t.n1, t.n2,
         CAST((CAST(p.o1 AS HUGEINT) * t.n2 - CAST(p.o2 AS HUGEINT) * t.n1)
              * (CAST(p.o1 AS HUGEINT) * t.n2 - CAST(p.o2 AS HUGEINT) * t.n1)
           // (CAST(t.n1 AS HUGEINT) * t.n2 * (p.o1 + p.o2)) AS BIGINT)
           AS term
  FROM per_bin p JOIN totals t USING (event_type)
)
SELECT event_type,
       CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(term) AS BIGINT) AS chi2_floor,
       CAST(SUM(term) AS BIGINT)
         > {_DRIFT_FLAG_PER_BIN} * CAST(COUNT(*) AS BIGINT) AS drifted
FROM terms
GROUP BY 1
"""


# --- events_seasonality_profile: calendar seasonality heatmap — the
#     (ISO day-of-week x hour-of-day) activity matrix per event type,
#     all calendar-integer arithmetic on naive timestamps (dayofweek /
#     hour are calendar functions — timezone-proof on a plain driver
#     session, per the NTZ rule). Adds the per-cell share of its type's
#     total in exact ppm. ISO dow: Monday=1..Sunday=7 in BOTH engines
#     (Spark dayofweek is Sunday=1 — shifted to ISO explicitly).


def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    cells = ev.select(
        "event_type",
        # Spark dayofweek: Sunday=1 → ISO Monday=1..Sunday=7
        F.expr("((dayofweek(ts) + 5) % 7) + 1").cast("long").alias("dow_iso"),
        F.hour("ts").cast("long").alias("hod"),
        "cents",
    )
    agg = cells.groupBy("event_type", "dow_iso", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents"),
    )
    return agg.withColumn(
        "share_ppm",
        F.expr(
            "CAST(n * 1000000 AS BIGINT) "
            "DIV SUM(n) OVER (PARTITION BY event_type)"
        ),
    )


EVENTS_SEASONALITY_PROFILE_SQL = f"""
WITH cells AS (
  SELECT event_type,
         CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow_iso,
         CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
         {_CENTS} AS cents
  FROM events
),
agg AS (
  SELECT event_type, dow_iso, hod,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM cells GROUP BY 1, 2, 3
)
SELECT event_type, dow_iso, hod, n, cents,
       CAST(n * 1000000 AS BIGINT)
         // CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
         AS share_ppm
FROM agg
"""


# --- user_activity_streaks: longest consecutive-active-day streak per
#     user — the gaps-and-islands classic via the date-minus-row_number
#     anchor: distinct active days per user, rn in date order, all days
#     of one streak share (day - rn) as their island anchor; longest
#     streak = max island size. Calendar-integer day arithmetic on NTZ
#     (date_sub with the rn integer), no epoch anywhere.


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("rn", F.row_number().over(w)).withColumn(
        "anchor", F.expr("date_sub(d, rn)")
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


USER_ACTIVITY_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INT) AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, anchor, COUNT(*) AS len
  FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY 1
"""


# --- events_funnel_dropoff: the funnel conversion table — per stage of
#     the signup→view→purchase funnel (events_window_funnel's chained
#     conditional-min semantics), how many users reached it, the
#     stage-over-stage ppm conversion, and the ppm of stage-1 users
#     surviving to each depth. Composes the funnel stage computation
#     with one pivot-style aggregate; shares events_window_funnel's
#     exact semantics so the two gates pin each other.


def events_funnel_dropoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .events import events_window_funnel

    stages = events_window_funnel(spark, sf_dir).select("user_id", "stage")
    counts = stages.groupBy("stage").agg(F.count(F.lit(1)).alias("n_at"))
    # users at stage s reached every stage <= s: cumulative from deepest
    w = Window.orderBy(F.desc("stage")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.orderBy("stage")
    reached = counts.withColumn("n_reached", F.sum("n_at").over(w))
    return (
        reached.withColumn(
            "conv_from_prev_ppm",
            F.expr(
                "CAST(n_reached * 1000000 AS BIGINT) DIV "
                "lag(n_reached, 1, n_reached) OVER (ORDER BY stage)"
            ),
        )
        .withColumn(
            "conv_from_first_ppm",
            F.expr(
                "CAST(n_reached * 1000000 AS BIGINT) DIV "
                "first(n_reached) OVER (ORDER BY stage)"
            ),
        )
        .select(
            F.col("stage").cast("long").alias("stage"),
            F.col("n_at").cast("long").alias("n_at"),
            F.col("n_reached").cast("long").alias("n_reached"),
            "conv_from_prev_ppm",
            "conv_from_first_ppm",
        )
    )


from .events import EVENTS_WINDOW_FUNNEL_SQL as _FUNNEL_SQL  # noqa: E402

EVENTS_FUNNEL_DROPOFF_SQL = f"""
WITH funnel AS ({_FUNNEL_SQL}),
counts AS (
  SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_at FROM funnel GROUP BY 1
),
reached AS (
  SELECT stage, n_at,
         CAST(SUM(n_at) OVER (ORDER BY stage DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_reached
  FROM counts
)
SELECT stage, n_at, n_reached,
       CAST(n_reached * 1000000 AS BIGINT)
         // lag(n_reached, 1, n_reached) OVER (ORDER BY stage)
         AS conv_from_prev_ppm,
       CAST(n_reached * 1000000 AS BIGINT)
         // first_value(n_reached) OVER (ORDER BY stage)
         AS conv_from_first_ppm
FROM reached
"""


# --- user_interevent_gaps: latency analytics over the event stream —
#     per user, the distribution of MICROSECONDS between consecutive
#     events (nearest-rank median and p90, exact integers — microsecond
#     differences are exact at the fixture's timestamp precision, while
#     second-granularity diffs disagree across engines: Spark
#     timestampdiff floors the elapsed interval, DuckDB datediff counts
#     boundary crossings). Naive-timestamp arithmetic throughout, so the
#     result cannot depend on the driver session's timezone. One lag
#     window + two nearest-rank picks with (gap, event_id) tiebreaks.


def user_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
            .cast("long")
            .alias("gap_us"),
        )
    )

    def nr(df: DataFrame, num: int, den: int, alias: str) -> DataFrame:
        wr = Window.partitionBy("user_id").orderBy("gap_us", "event_id")
        r = df.withColumn("vr", F.row_number().over(wr)).withColumn(
            "k", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
        return r.filter(
            F.col("vr") == F.expr(f"CAST(ceil(k * {num} / {den}) AS BIGINT)")
        ).select("user_id", F.col("gap_us").alias(alias))

    med = nr(gaps, 1, 2, "p50_gap_us")
    p90 = nr(gaps, 9, 10, "p90_gap_us")
    n = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )
    return n.join(med, "user_id").join(p90, "user_id")


USER_INTEREVENT_GAPS_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         ) AS prev_ts
  FROM events
),
gaps AS (
  SELECT user_id, event_id,
         CAST(datediff('microsecond', prev_ts, ts) AS BIGINT) AS gap_us
  FROM ordered WHERE prev_ts IS NOT NULL
),
ranked AS (
  SELECT user_id, gap_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_us, event_id)
           AS vr,
         COUNT(*) OVER (PARTITION BY user_id) AS k
  FROM gaps
),
med AS (SELECT user_id, gap_us AS p50_gap_us FROM ranked
        WHERE vr = CAST(ceil(k * 1 / 2) AS BIGINT)),
p90 AS (SELECT user_id, gap_us AS p90_gap_us FROM ranked
        WHERE vr = CAST(ceil(k * 9 / 10) AS BIGINT)),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
         CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
  FROM gaps GROUP BY 1
)
SELECT agg.user_id, agg.n_gaps, agg.min_gap_us, agg.max_gap_us,
       med.p50_gap_us, p90.p90_gap_us
FROM agg JOIN med USING (user_id) JOIN p90 USING (user_id)
"""


# --- type_equidepth_deciles: equi-depth (quantile) binning — the
#     feature-engineering counterpart of events_value_histogram's
#     equi-width bins: per type, decile bucket = count of nearest-rank
#     decile boundaries at or below the value (0..9, ties resolved by
#     the boundary VALUES so the rule is purely value-based and
#     engine-independent), with per-bucket counts and exact cents mass.
#     Boundaries from one window rank; assignment from a broadcast of
#     the 9 boundary values per type.


def type_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = ev.withColumn("vr", F.row_number().over(wr)).withColumn(
        "k", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    bounds = (
        ranked.filter(
            F.expr(
                "vr IN (CAST(ceil(k*1/10) AS BIGINT), CAST(ceil(k*2/10) AS BIGINT), "
                "CAST(ceil(k*3/10) AS BIGINT), CAST(ceil(k*4/10) AS BIGINT), "
                "CAST(ceil(k*5/10) AS BIGINT), CAST(ceil(k*6/10) AS BIGINT), "
                "CAST(ceil(k*7/10) AS BIGINT), CAST(ceil(k*8/10) AS BIGINT), "
                "CAST(ceil(k*9/10) AS BIGINT))"
            )
        )
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("cents")).alias("bnds"))
    )
    assigned = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "cents",
        F.expr(
            "size(filter(bnds, b -> b <= cents))"
        ).cast("long").alias("decile"),
    )
    return assigned.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


TYPE_EQUIDEPTH_DECILES_SQL = """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS vr,
         COUNT(*) OVER (PARTITION BY event_type) AS k
  FROM ev
),
bounds AS (
  SELECT event_type, list_sort(list(cents)) AS bnds
  FROM ranked
  WHERE vr IN (CAST(ceil(k*1/10) AS BIGINT), CAST(ceil(k*2/10) AS BIGINT),
               CAST(ceil(k*3/10) AS BIGINT), CAST(ceil(k*4/10) AS BIGINT),
               CAST(ceil(k*5/10) AS BIGINT), CAST(ceil(k*6/10) AS BIGINT),
               CAST(ceil(k*7/10) AS BIGINT), CAST(ceil(k*8/10) AS BIGINT),
               CAST(ceil(k*9/10) AS BIGINT))
  GROUP BY 1
),
assigned AS (
  SELECT e.event_type, e.cents,
         CAST(len(list_filter(b.bnds, x -> x <= e.cents)) AS BIGINT)
           AS decile
  FROM ev e JOIN bounds b USING (event_type)
)
SELECT event_type, decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents
FROM assigned
GROUP BY 1, 2
"""


# --- purchase_attribution: first-touch vs last-touch attribution — for
#     every purchase, the view that "caused" it under the two classic
#     attribution models: the EARLIEST and the LATEST view in the
#     1-day lookback window. One min-struct and one max-struct per
#     purchase over the same window-bounded join (the as-of machinery
#     generalized to both directions); reports per-user counts of
#     attributed purchases and how often the two models disagree —
#     the number every attribution migration asks first.


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_id"), F.col("ts").alias("v_ts")
    )
    joined = purchases.join(views, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 DAY"))
    )
    key = F.struct(F.col("v_ts").alias("ts"), F.col("v_id").alias("id"))
    per_purchase = joined.groupBy("user_id", "p_id").agg(
        F.min(key).alias("first_touch"),
        F.max(key).alias("last_touch"),
    )
    return per_purchase.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.sum(
            (
                F.col("first_touch.id") != F.col("last_touch.id")
            ).cast("long")
        ).alias("n_model_disagree"),
        F.min("first_touch.id").alias("min_first_view"),
        F.max("last_touch.id").alias("max_last_view"),
    )


PURCHASE_ATTRIBUTION_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events
),
joined AS (
  SELECT p.user_id, p.event_id AS p_id,
         v.event_id AS v_id, v.ts AS v_ts
  FROM ev p JOIN ev v
    ON p.user_id = v.user_id
   AND p.event_type = 'purchase' AND v.event_type = 'view'
   AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 DAY
),
per_purchase AS (
  SELECT user_id, p_id,
         MIN({'ts': v_ts, 'id': v_id}) AS first_touch,
         MAX({'ts': v_ts, 'id': v_id}) AS last_touch
  FROM joined GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_attributed,
       CAST(SUM(CASE WHEN (first_touch).id <> (last_touch).id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_model_disagree,
       CAST(MIN((first_touch).id) AS BIGINT) AS min_first_view,
       CAST(MAX((last_touch).id) AS BIGINT) AS max_last_view
FROM per_purchase
GROUP BY 1
"""


# --- purchase_attribution_ushape: POSITION-BASED (U-shaped) multi-touch
#     attribution — the generalization of purchase_attribution's
#     first/last models: every view touch inside the 1-day lookback of a
#     purchase gets exact-ppm credit, 40%/20%/40% split between first
#     touch, middle touches, and last touch (k=1 -> 100% "first";
#     k=2 -> 50/50; middle per-touch = 200000 div (k-2) with the integer
#     remainder assigned to the earliest middle touch, so credit per
#     purchase sums to exactly 1e6 ppm BY CONSTRUCTION).
#
#     The differential is a conservation proof, not a re-run: Spark
#     materializes PER-TOUCH credits (rank + count windows partitioned by
#     (user, purchase)) and aggregates them per user and position class;
#     the oracle never builds touches — it derives each class total in
#     CLOSED FORM from k alone (per purchase: first = 1e6/5e5/4e5 by k,
#     middle = 2e5 iff k>=3). The two agree only if the per-touch scheme
#     distributes exactly and loses nothing. Scale: one window over
#     (user, purchase) — partitioned, frame = touches per purchase.

def purchase_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_id"), F.col("ts").alias("v_ts")
    )
    joined = purchases.join(views, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 DAY"))
    )
    w = Window.partitionBy("user_id", "p_id").orderBy("v_ts", "v_id")
    wk = Window.partitionBy("user_id", "p_id")
    t = (
        joined.withColumn("rnk", F.row_number().over(w))
        .withColumn("k", F.count(F.lit(1)).over(wk))
    )
    mid_per = F.expr("200000 div (k - 2)")
    mid_rem = F.expr("200000 - (k - 2) * (200000 div (k - 2))")
    credit = (
        F.when(F.col("k") == 1, F.lit(1_000_000))
        .when(F.col("k") == 2, F.lit(500_000))
        .when((F.col("rnk") == 1) | (F.col("rnk") == F.col("k")), F.lit(400_000))
        .otherwise(mid_per + F.when(F.col("rnk") == 2, mid_rem).otherwise(F.lit(0)))
        .cast("long")
    )
    pos = (
        F.when(F.col("rnk") == 1, F.lit("first"))
        .when(F.col("rnk") == F.col("k"), F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    return (
        t.select("user_id", "p_id", credit.alias("credit"), pos.alias("pos"))
        .groupBy("user_id")
        .agg(
            F.countDistinct("p_id").alias("n_purchases"),
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.when(F.col("pos") == "first", F.col("credit")).otherwise(F.lit(0))).alias("first_credit_ppm"),
            F.sum(F.when(F.col("pos") == "last", F.col("credit")).otherwise(F.lit(0))).alias("last_credit_ppm"),
            F.sum(F.when(F.col("pos") == "middle", F.col("credit")).otherwise(F.lit(0))).alias("middle_credit_ppm"),
            F.sum("credit").alias("total_credit_ppm"),
        )
    )


PURCHASE_ATTRIBUTION_USHAPE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events
),
joined AS (
  SELECT p.user_id, p.event_id AS p_id, v.event_id AS v_id
  FROM ev p JOIN ev v
    ON p.user_id = v.user_id
   AND p.event_type = 'purchase' AND v.event_type = 'view'
   AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 DAY
),
-- closed form: class totals depend only on k (touch count per purchase);
-- k=1 single touch counts as "first" and "last" stays 0
per_purchase AS (
  SELECT user_id, p_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM joined GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(k) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN k = 1 THEN 1000000
                     WHEN k = 2 THEN 500000
                     ELSE 400000 END) AS BIGINT) AS first_credit_ppm,
       CAST(SUM(CASE WHEN k = 1 THEN 0
                     WHEN k = 2 THEN 500000
                     ELSE 400000 END) AS BIGINT) AS last_credit_ppm,
       CAST(SUM(CASE WHEN k >= 3 THEN 200000 ELSE 0 END) AS BIGINT)
         AS middle_credit_ppm,
       CAST(COUNT(*) * 1000000 AS BIGINT) AS total_credit_ppm
FROM per_purchase
GROUP BY user_id
"""


# --- events_rolling_distinct_users: EXACT SLIDING-WINDOW DISTINCT — the
#     24-hour rolling unique-user count per event type, the windowed
#     uniqExact every live dashboard wants and most engines approximate.
#     r6 verdict: the original form (per-(type, hour) collect_set + a
#     RANGE(-23,0) frame flattening 24 sets per output row) carries the
#     WHOLE hot type's 24h user set inside ONE window task — at 100-TB
#     dashboard scale (~1e7 users/hour on a hot type) that is ~2.4e8
#     strings in a single task's frame, an executor OOM. Rewritten (r7)
#     as a USER-COVERAGE INTERVAL SWEEP, which bounds every task's state
#     WITHOUT the 24x row expansion of the textbook expand-to-anchors
#     scheme (measured 3x slower than even the window form at 30x — the
#     bucketed expand trades OOM for shuffle volume; the sweep pays
#     neither):
#       1. distinct (type, hour, user) rows — U rows, the minimal
#          exact-distinct information;
#       2. per (type, user): merge each active hour's anchor-coverage
#          [h, h+23] into maximal disjoint intervals via a lag window
#          over the user's own hours (gap > 23 opens a new interval) —
#          per-task state O(1), a user's group is bounded by CALENDAR
#          hours, and a hot type's users spread across all shuffle
#          partitions by hash(type, user) — the U/B bound the r6 verdict
#          asked for, with B = shuffle partitions;
#       3. intervals → (+1 at s, −1 at e+1) deltas, pre-aggregated by
#          (type, hour) — at most 2 rows per interval, collapsing to
#          ≤ 2 × calendar-hours rows per type;
#       4. one running sum per type over the delta/anchor hour axis —
#          the only serial window, whose partition size is bounded by
#          the CALENDAR (≤ 8.8k rows/type/year at any data scale), then
#          an equi-join back to the observed anchors.
#     A user covered by some active hour in [x−23, x] lies in exactly one
#     merged interval containing x, so the running delta sum at x counts
#     distinct users exactly. Planted hot-type check:
#     scripts/skew_check.py.
#
#     Oracle = the direct recount: a range self-join of observed (type,
#     hour) anchors against raw events in [h-23, h] with COUNT(DISTINCT)
#     — quadratic-in-window recount vs interval sweep pin each other.

def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # standalone form materializes the shared distinct (r15 profile: the
    # uh distinct ran once per consumer branch, two ~0.6s duplicate jobs
    # per execution). localCheckpoint, NOT persist: downstream of an
    # InMemoryRelation AQE coalescing is lost and the 6 near-empty
    # exchanges ran as 32-partition task storms (measured 2.16 -> 2.86s
    # WORSE with persist+count); over the checkpointed leaf AQE keeps
    # coalescing them to 1-3 tasks.
    return rolling_distinct_frame(
        _events_cents(spark, sf_dir), _materialize=True
    )


def rolling_distinct_frame(
    ev: DataFrame, _materialize: bool = False
) -> DataFrame:
    """Core path over any (event_type, ts, user_id) frame — factored out
    so scripts/skew_check.py can drive it at N× event scale. With
    ``_materialize`` the shared distinct ``uh`` (feeding anchors AND the
    interval-merge branch) is eagerly localCheckpointed so the two
    branches read one materialized copy instead of re-running the
    corpus-scale distinct each."""
    hour_x = (
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
        + F.hour("ts")
    ).cast("long")
    uh = ev.select("event_type", hour_x.alias("x"), "user_id").distinct()
    if _materialize:
        uh = uh.localCheckpoint(eager=True)
    anchors = uh.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).alias("n_distinct_1h")  # uh is distinct per user
    )
    # 2. per-user interval merge: a new coverage interval opens when the
    #    gap to the previous active hour exceeds the 23h carry
    w_user = Window.partitionBy("event_type", "user_id").orderBy("x")
    ivs = (
        uh.withColumn(
            "new_iv",
            F.when(
                F.coalesce(F.col("x") - F.lag("x").over(w_user), F.lit(24))
                > 23,
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "iv_id",
            F.sum("new_iv").over(
                w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("event_type", "user_id", "iv_id")
        .agg(F.min("x").alias("s"), (F.max("x") + 23).alias("e"))
    )
    # 3. boundary deltas, collapsed to the (type, hour) axis
    deltas = (
        ivs.select("event_type", F.col("s").alias("x"), F.lit(1).alias("d"))
        .unionByName(
            ivs.select(
                "event_type", (F.col("e") + 1).alias("x"), F.lit(-1).alias("d")
            )
        )
        .groupBy("event_type", "x")
        .agg(F.sum("d").alias("d"))
    )
    # 4. running sum over the union axis (calendar-bounded per type),
    #    evaluated at the observed anchors
    axis = (
        deltas.select("event_type", "x")
        .unionByName(anchors.select("event_type", "x"))
        .distinct()
    )
    w_type = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = axis.join(deltas, ["event_type", "x"], "left").select(
        "event_type",
        "x",
        F.sum(F.coalesce(F.col("d"), F.lit(0))).over(w_type).alias("n24"),
    )
    return anchors.join(running, ["event_type", "x"]).select(
        "event_type",
        "x",
        F.col("n_distinct_1h").cast("long").alias("n_distinct_1h"),
        F.col("n24").cast("long").alias("n_distinct_24h"),
    )


EVENTS_ROLLING_DISTINCT_USERS_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         user_id
  FROM events
),
anchors AS (
  SELECT event_type, x, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS n_distinct_1h
  FROM ev GROUP BY 1, 2
)
SELECT a.event_type, a.x, a.n_distinct_1h,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_distinct_24h
FROM anchors a
JOIN ev e
  ON e.event_type = a.event_type AND e.x BETWEEN a.x - 23 AND a.x
GROUP BY a.event_type, a.x, a.n_distinct_1h
"""


# --- events_rolling_distinct_kmv: the APPROXIMATE tier of the sliding
#     distinct — per-(type, hour) bottom-K KMV sketches merged across the
#     trailing 24h RANGE frame. The r6 verdict named this the downgrade
#     path when even the exact sweep's U rows are too many; the operator
#     demonstrates WHY sketches make the problem easy: bottom-K of a
#     union equals bottom-K of the union of per-part bottom-Ks (any hash
#     among the K smallest of the union has < K union hashes below it, a
#     fortiori < K in its own part), so the frame flatten carries a
#     CONSTANT <= 24K hashes per output row at ANY user cardinality —
#     the state bound the r5 exact form lacked. The sketch is a
#     deterministic function of the data (md5 48-bit prefixes, no RNG),
#     so the oracle pins it EXACTLY: same bottom-K, same kth value, same
#     integer estimator — approximation error vs true counts is a
#     property of the estimator, not nondeterminism.
#     Estimator: (K-1) * 2^48 DIV h_K (k_used when under-full — exact).

KMV24_K = 64
_KMV24_RADIX = 1 << 48


def events_rolling_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    hour_x = (
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
        + F.hour("ts")
    ).cast("long")
    hashed = (
        ev.select(
            "event_type",
            hour_x.alias("x"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    wth = Window.partitionBy("event_type", "x").orderBy("h")
    per_hour = (
        hashed.withColumn("rn", F.row_number().over(wth))
        .filter(F.col("rn") <= KMV24_K)
        .groupBy("event_type", "x")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
    )
    w24 = Window.partitionBy("event_type").orderBy("x").rangeBetween(-23, 0)
    merged = per_hour.select(
        "event_type",
        "x",
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("hs").over(w24)))
            ),
            1,
            KMV24_K,
        ).alias("mh"),
    )
    return merged.select(
        "event_type",
        "x",
        F.size("mh").cast("long").alias("k_used"),
        F.element_at("mh", -1).alias("hk"),
        F.when(F.size("mh") < KMV24_K, F.size("mh").cast("long"))
        .otherwise(
            # GREATEST(.., 1): a 48-bit prefix of 0 (p ~ 2^-48/distinct)
            # would make Spark DIV yield NULL while DuckDB // raises —
            # guard BOTH engines identically (ADVICE r7)
            F.expr(
                f"({KMV24_K} - 1) * CAST({_KMV24_RADIX} AS BIGINT)"
                " DIV GREATEST(element_at(mh, -1), 1)"
            )
        )
        .cast("long")
        .alias("est_distinct_24h"),
    )


EVENTS_ROLLING_DISTINCT_KMV_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS h
  FROM events
),
dh AS (SELECT DISTINCT event_type, x, h FROM ev),
topk AS (
  SELECT event_type, x, h FROM (
    SELECT event_type, x, h,
           ROW_NUMBER() OVER (PARTITION BY event_type, x ORDER BY h) AS rn
    FROM dh
  ) WHERE rn <= {KMV24_K}
),
anchors AS (SELECT DISTINCT event_type, x FROM dh),
-- the oracle merges the RAW distinct hashes of the window (not the
-- per-hour sketches): agreement proves bottom-K mergeability lossless
win AS (
  SELECT DISTINCT a.event_type, a.x, e.h
  FROM anchors a
  JOIN dh e
    ON e.event_type = a.event_type AND e.x BETWEEN a.x - 23 AND a.x
),
sk AS (
  SELECT event_type, x, h FROM (
    SELECT event_type, x, h,
           ROW_NUMBER() OVER (PARTITION BY event_type, x ORDER BY h) AS rn
    FROM win
  ) WHERE rn <= {KMV24_K}
)
SELECT event_type, x,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(MAX(h) AS BIGINT) AS hk,
       CAST(CASE WHEN COUNT(*) < {KMV24_K} THEN COUNT(*)
             ELSE ({KMV24_K} - 1) * CAST({_KMV24_RADIX} AS BIGINT)
                  // GREATEST(MAX(h), 1)
           END AS BIGINT) AS est_distinct_24h
FROM sk
GROUP BY 1, 2
"""


# --- events_quantile_select: EXACT distributed quantile SELECTION without
#     a global sort — the order-statistic primitive (exact p50/p90/p99 of
#     the payment distribution per event type) that engines usually
#     approximate (ClickHouse quantileExact materializes the whole column
#     per group; reference analog: the API's summary percentiles,
#     src/api.ts stats endpoints). Naive exact quantile = global sort of
#     the column (a full-data range shuffle — the single most expensive
#     plan shape at 100 TB). This is the two-level histogram-selection
#     algorithm instead, fully declarative (no driver iteration):
#       1. bucket pass: per (type, cents DIV 256) counts — output is
#          bounded by value DOMAIN / 256 per type, independent of row
#          count; the running sum over the bucket axis is a HIERARCHICAL
#          prefix-sum over DIV-2^16 ancestor buckets (see QSEL_FAN): every
#          window partition <= 2^17 rows at any int64 value range, so the
#          machinery is safe for unbounded derived axes (per-user monetary)
#          — not just domain-bounded event cents;
#       2. the rank k = (n-1)*q DIV 100 + 1 for each target quantile
#          locates its unique containing bucket (cum >= k, cum-cnt < k)
#          in the tiny bucket table — broadcast back;
#       3. value pass: ONLY rows landing in a target bucket (<= 256
#          distinct values each) get per-value counts; a second
#          domain-bounded running sum finds the first value where
#          offset + cum reaches k. Everything is integer; ties need no
#          break because rank-k VALUE is well-defined under duplicates.
#     At 100 TB: two map-side-combinable aggregations + two windows over
#     domain-bounded axes; no row-scale shuffle, no sort, no collect.
#
#     Oracle = the literal definition: ROW_NUMBER over the per-type
#     value order, pick rn = k — the full sort the Spark path avoids.

QSEL_PCTS = (50, 90, 99)
QSEL_BUCKET = 256
# Hierarchy fan-out for the bucket-axis running sum (r8): a single
# Window.partitionBy(event_type).orderBy(b) over the bucket axis is only
# bounded when the value DOMAIN is (cents <= 2^17 holds for event payments
# but NOT for derived axes like per-user monetary sums, where the range is
# unbounded at 100 TB — the r7 verdict's one weak finding). The fix is a
# STATIC hierarchical prefix-sum: cum(b) decomposes into a within-parent
# running sum plus exclusive parent prefixes over DIV-2^16 ancestor
# buckets. Three ancestor levels cover the FULL int64 domain
# (|b| <= 2^63/256 = 2^55; p3 = b DIV 2^48 has <= 2^8 distinct values), so
# every window partition holds <= 2^17 rows (2^16 per sign side of the
# zero-straddling parent) at ANY corpus scale and ANY value range — no
# min/max pre-scan, no eager collect, fully declarative (plan-audit safe).
QSEL_FAN = 65536


def events_quantile_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event payment cents are domain-bounded (<= 2^17, the q-digest
    # universe contract) -> the single-window fast path is safe
    return quantile_select_frame(_events_cents(spark, sf_dir), bounded_axis=True)


def quantile_select_frame(
    ev_cents: DataFrame | None,
    pcts: tuple[int, ...] = QSEL_PCTS,
    bounded_axis: bool = False,
    _hist: DataFrame | None = None,
) -> DataFrame:
    """Core path over any (event_type, cents) frame — factored out so
    scripts/scale_check.py can drive it at N× event scale, and so
    events_value_mad_outliers can run the selection twice (median of
    values, then median of absolute deviations).

    ``bounded_axis=True`` is the caller's assertion that the value column
    lives in a DOMAIN-bounded universe (event payment cents <= 2^17, the
    q-digest contract — so <= 512 buckets per type) and collapses the
    prefix-sum ladder to one per-type window over that tiny axis (3 fewer
    serial stages). Leave it False for any DERIVED axis whose range grows
    with the corpus (per-user monetary/frequency) — the hierarchical
    ladder then bounds every window partition at <= 2^17 rows for any
    int64 range.

    ``_hist`` (r11): a prebuilt value-grain histogram (event_type, cents,
    cnt) replaces the raw frame entirely — rank selection is a pure
    function of the histogram, so a caller that already owns one (the
    series suite shares ONE corpus pass across qsel/mad/robust/q-digest)
    pays zero additional corpus scans. Results are bit-identical: every
    aggregate below is a weighted sum."""
    if _hist is not None:
        ev = _hist.select(
            "event_type",
            "cents",
            F.col("cnt").alias("w"),
            F.expr(f"cents DIV {QSEL_BUCKET}").alias("b"),
        )
    else:
        ev = ev_cents.select(
            "event_type",
            "cents",
            F.lit(1).cast("long").alias("w"),
            F.expr(f"cents DIV {QSEL_BUCKET}").alias("b"),
        )
    # DIV truncates toward zero and composes (trunc(trunc(a/m)/n) ==
    # trunc(a/(m*n)) for positive divisors), and is monotone in b — so
    # parent buckets partition the axis into CONTIGUOUS runs and ordering
    # by the child key within a parent is ordering by cents.
    bc = (
        ev.groupBy("event_type", "b")
        .agg(F.sum("w").alias("cnt"))
        .withColumn("p1", F.expr(f"b DIV {QSEL_FAN}"))
    )
    if bounded_axis:
        wb = (
            Window.partitionBy("event_type")
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bcum = bc.select(
            "event_type", "b", "cnt", F.sum("cnt").over(wb).alias("cum")
        )
        return _qsel_locate(ev, bcum, bc.groupBy("event_type").agg(
            F.sum("cnt").alias("n")
        ), pcts)
    bcum, ntab = _hier_cum(bc)
    # n per type comes from the LEVEL-3 table, not a second corpus scan —
    # at 100 TB the raw frame is read exactly twice (bucket pass + value
    # pass); every rank computation runs over the domain-bounded
    # aggregate
    return _qsel_locate(ev, bcum, ntab, pcts)


def _hier_cum(bc: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The hierarchical bucket-axis prefix sum, factored for reuse: given
    (event_type, b, cnt, p1) counts over ANY int64 axis, return
    ((event_type, b, cnt, cum), per-type totals) with every window
    partition <= 2^17 rows at any value range (see the QSEL_FAN note).
    Reused by the Gini mean-absolute-difference closed form, which
    needs per-VALUE cumulative counts on the unbounded monetary axis."""
    # bc feeds FIVE plan branches (bcum's base join, l1e, l2e, e3, ntab)
    # whose broadcast-build jobs start concurrently — unmaterialized, the
    # upstream corpus aggregation re-executed once per branch (r15 gini
    # profile: six duplicate 40-task scan+agg jobs, 8.85s job-sum for a
    # ~3s query). Eager checkpoint at the bucket/value grain, which is
    # domain-bounded for every caller.
    bc = bc.localCheckpoint(eager=True)
    # level tables (each row count <= the previous level's); exclusive
    # prefixes FOLD TOP-DOWN so the base bucket table joins exactly ONCE
    # (joining e1/e2/e3 into bc separately would shuffle the big table
    # three times)
    l1 = (
        bc.groupBy("event_type", "p1")
        .agg(F.sum("cnt").alias("c1"))
        .withColumn("p2", F.expr(f"p1 DIV {QSEL_FAN}"))
    )
    l2 = (
        l1.groupBy("event_type", "p2")
        .agg(F.sum("c1").alias("c2"))
        .withColumn("p3", F.expr(f"p2 DIV {QSEL_FAN}"))
    )
    l3 = l2.groupBy("event_type", "p3").agg(F.sum("c2").alias("c3"))
    unb = (Window.unboundedPreceding, Window.currentRow)
    w0 = Window.partitionBy("event_type", "p1").orderBy("b").rowsBetween(*unb)
    w1 = Window.partitionBy("event_type", "p2").orderBy("p1").rowsBetween(*unb)
    w2 = Window.partitionBy("event_type", "p3").orderBy("p2").rowsBetween(*unb)
    # the ONLY per-type-global window: <= 2^8 rows by construction
    # (p3 = cents DIV 2^55-ish), the stated BOUNDED_GLOBAL_WINDOW row
    w3 = Window.partitionBy("event_type").orderBy("p3").rowsBetween(*unb)
    e3 = l3.select(
        "event_type", "p3", (F.sum("c3").over(w3) - F.col("c3")).alias("e3")
    )
    # rows strictly above each p2 = within-p3 exclusive prefix + e3(p3);
    # e3 is <= 2^8 rows per type — always broadcastable
    l2e = (
        l2.withColumn("cum2", F.sum("c2").over(w2))
        .join(F.broadcast(e3), ["event_type", "p3"])
        .select(
            "event_type",
            "p2",
            (F.col("cum2") - F.col("c2") + F.col("e3")).alias("e2"),
        )
    )
    l1e = (
        l1.withColumn("cum1", F.sum("c1").over(w1))
        .join(l2e, ["event_type", "p2"])
        .select(
            "event_type",
            "p1",
            (F.col("cum1") - F.col("c1") + F.col("e2")).alias("e1"),
        )
    )
    bcum = (
        bc.withColumn("s0", F.sum("cnt").over(w0))
        .join(l1e, ["event_type", "p1"])
        .select(
            "event_type",
            "b",
            "cnt",
            (F.col("s0") + F.col("e1")).alias("cum"),
        )
    )
    return bcum, l3.groupBy("event_type").agg(F.sum("c3").alias("n"))


def _qsel_locate(
    ev: DataFrame, bcum: DataFrame, ntab: DataFrame, pcts: tuple[int, ...]
) -> DataFrame:
    """Shared rank-location + value pass: given the cumulative bucket
    table (however its running sum was computed) and per-type totals,
    find each rank's bucket and the exact rank-k value inside it."""
    ks = (
        ntab
        .select(
            "event_type",
            "n",
            F.explode(
                F.array(*[F.lit(p).cast("long") for p in pcts])
            ).alias("q_pct"),
        )
        .withColumn("k", F.expr("(n - 1) * q_pct DIV 100 + 1"))
    )
    # one row per (type, quantile): the bucket containing rank k, plus the
    # count of rows strictly below it — tiny by construction (|types| x 3)
    tgt = (
        bcum.join(ks, "event_type")
        .filter((F.col("cum") >= F.col("k")) & (F.col("cum") - F.col("cnt") < F.col("k")))
        .select(
            "event_type",
            "q_pct",
            "n",
            "k",
            "b",
            (F.col("cum") - F.col("cnt")).alias("offset"),
        )
    )
    wv = (
        Window.partitionBy("event_type", "q_pct")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.join(F.broadcast(tgt), ["event_type", "b"])
        .groupBy("event_type", "q_pct", "n", "k", "offset", "cents")
        .agg(F.sum("w").alias("c"))
        .select(
            "event_type",
            "q_pct",
            "n",
            "k",
            "offset",
            "cents",
            F.sum("c").over(wv).alias("vcum"),
        )
        .filter(F.col("offset") + F.col("vcum") >= F.col("k"))
        .groupBy("event_type", "q_pct", "n", "k")
        .agg(F.min("cents").alias("value_cents"))
        .select(
            "event_type",
            F.col("q_pct").cast("long").alias("q_pct"),
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )


EVENTS_QUANTILE_SELECT_SQL = f"""
WITH ev AS (
  SELECT event_type, {_CENTS} AS cents FROM events
),
ks AS (
  SELECT tn.event_type, tn.n, q.q_pct
  FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM ev GROUP BY event_type) tn
  CROSS JOIN (
    SELECT CAST(unnest([{", ".join(str(p) for p in QSEL_PCTS)}]) AS BIGINT)
      AS q_pct
  ) q
),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn
  FROM ev
)
SELECT ks.event_type,
       ks.q_pct,
       ks.n,
       CAST((ks.n - 1) * ks.q_pct // 100 + 1 AS BIGINT) AS k,
       CAST(r.cents AS BIGINT) AS value_cents
FROM ks
JOIN r ON r.event_type = ks.event_type
      AND r.rn = (ks.n - 1) * ks.q_pct // 100 + 1
"""


# --- events_value_mad_outliers: ROBUST outlier detection per event type —
#     median + MAD (median absolute deviation), the estimator that
#     survives the contamination it is trying to measure (mean/stddev
#     z-scores are dragged by the very outliers they flag; median/MAD
#     have a 50% breakdown point). Composes the exact distributed
#     SELECTION machinery (quantile_select_frame) twice with NO new
#     algorithmic surface: pass 1 selects each type's median value,
#     pass 2 selects the median of |cents − med| over the deviation
#     frame, then one aggregation flags |cents − med| > 3·MAD. Everything
#     stays in integer cents (deviations are exact, the 3·MAD threshold
#     is an integer compare), so the differential is exact. Same 100-TB
#     shape as events_quantile_select: two domain-bounded selection
#     passes + one scan-aggregation; the tiny per-type medians broadcast.
#
#     Oracle: rank-k via ROW_NUMBER twice (the full-sort definition) +
#     direct recount — k = (n-1) DIV 2 + 1 (the same rank both engines
#     pin; n is unchanged between passes since |x − med| never drops
#     rows).

MAD_K_FACTOR = 3


def events_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mad_outliers_frame(
        _events_cents(spark, sf_dir).select("event_type", "cents")
    )


def mad_outliers_frame(
    ev: DataFrame, _hist: DataFrame | None = None
) -> DataFrame:
    """Core path over any (event_type, cents) frame — factored out so
    events_series_suite can feed it from the shared persisted subtree.

    r11: runs entirely off a value-grain histogram — ONE corpus pass
    (or zero with a caller-shared ``_hist``) instead of the old five
    (2x selection + deviation rescan + final count): the deviation
    distribution |x - med| is a pure RE-KEYING of the value histogram,
    so both medians, the outlier count and n are exact weighted folds
    over <= 2^17 rows per type. Output is bit-identical."""
    hist = _hist
    if hist is None:
        hist = (
            ev.groupBy("event_type", "cents")
            .agg(F.count(F.lit(1)).alias("cnt"))
            # downstream of a CACHED frame the plain session's 200
            # shuffle partitions get NO AQE coalescing; pre-partitioning
            # by event_type (a subset of every downstream groupBy/window
            # key) makes the whole selection chain exchange-free
            # (measured 7.4s -> 0.97s per selection at sf0.01 — the
            # supplier_pagerank rule)
            .repartition(ev.sparkSession.sparkContext.defaultParallelism,
                         "event_type")
            .persist()
        )
        hist.count()  # materialize before the fan-out (cold-race rule)
    med = quantile_select_frame(
        None, pcts=(50,), bounded_axis=True, _hist=hist
    ).select("event_type", F.col("value_cents").alias("med_cents"))
    dev_hist = (
        hist.join(F.broadcast(med), "event_type")
        .groupBy(
            "event_type",
            "med_cents",
            F.abs(F.col("cents") - F.col("med_cents")).alias("cents"),
        )
        .agg(F.sum("cnt").alias("cnt"))
        # the deviation histogram feeds BOTH the MAD selection and the
        # final fold, and broadcast(mad) embeds it a second time — left
        # lazy, the med-selection subplan re-executes per branch at the
        # plain session's 200 shuffle partitions (standalone entry
        # regressed 2.3s -> 11.8s at sf0.01). Persist + count (cold-race
        # rule) runs the med selection exactly once; <= 2^17 rows/type.
        .persist()
    )
    dev_hist.count()
    mad = quantile_select_frame(
        None,
        pcts=(50,),
        bounded_axis=True,
        _hist=dev_hist.select("event_type", "cents", "cnt"),
    ).select("event_type", F.col("value_cents").alias("mad_cents"))
    return (
        dev_hist.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum(
                F.when(
                    F.col("cents") > F.lit(MAD_K_FACTOR) * F.col("mad_cents"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("med_cents").cast("long").alias("med_cents"),
            F.col("mad_cents").cast("long").alias("mad_cents"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
            F.expr("n_outliers * 1000000 DIV n").alias("outlier_ppm"),
        )
    )


EVENTS_VALUE_MAD_OUTLIERS_SQL = f"""
WITH ev AS (
  SELECT event_type, {_CENTS} AS cents FROM events
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1
),
med AS (
  SELECT r.event_type, r.cents AS med_cents
  FROM (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn
    FROM ev
  ) r
  JOIN n ON n.event_type = r.event_type
  WHERE r.rn = (n.n - 1) // 2 + 1
),
dev AS (
  SELECT ev.event_type, abs(ev.cents - med.med_cents) AS d, med.med_cents
  FROM ev JOIN med ON med.event_type = ev.event_type
),
mad AS (
  SELECT r.event_type, r.d AS mad_cents
  FROM (
    SELECT event_type, d,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
    FROM dev
  ) r
  JOIN n ON n.event_type = r.event_type
  WHERE r.rn = (n.n - 1) // 2 + 1
)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(dev.med_cents) AS BIGINT) AS med_cents,
       CAST(MAX(mad.mad_cents) AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN dev.d > {MAD_K_FACTOR} * mad.mad_cents
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN dev.d > {MAD_K_FACTOR} * mad.mad_cents
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS outlier_ppm
FROM dev
JOIN mad ON mad.event_type = dev.event_type
GROUP BY dev.event_type
"""


# --- events_hourly_autocov: SEASONALITY DETECTION — exact lag-1h and
#     lag-24h autocovariance numerators of each type's hourly volume
#     series, the time-series-correlation primitive behind "is there a
#     daily cycle in this stream" (a positive lag-24 covariance with a
#     weak lag-1 says daily seasonality; the reverse says short-range
#     momentum). All moments stay EXACT: hourly sums are integer cents,
#     pair products accumulate in DECIMAL(38,0) (the events_moment_profile
#     discipline — no float accumulation anywhere), and the output is the
#     raw numerator n·Σab − Σa·Σb plus its component sums, never a
#     rounded correlation (the CLAUDE.md restructure-instead-of-rounding
#     rule: consumers normalize, the engine emits exact integers).
#     100-TB shape: one hash agg to the (type, hour) series — bounded by
#     CALENDAR × types, not rows — then a self-equi-join on (type, x+L)
#     and one tiny per-type agg. Differential: Spark pairs via the
#     SPARSE equi-join (x with x−L when both exist); the oracle pairs
#     via a DENSE calendar spine (generate_series per type) + LAG(L)
#     window with null checks — gap handling must agree exactly.

AUTOCOV_LAGS = (1, 24)


def _hourly_frame(ev: DataFrame) -> DataFrame:
    """Per-(type, hour-index) cents sums — the series shared by the
    autocovariance and forecast-backtest paths (events_series_suite
    persists ONE instance and feeds both)."""
    hour_x = (
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
        + F.hour("ts")
    ).cast("long")
    return (
        ev.select("event_type", hour_x.alias("x"), "cents")
        .groupBy("event_type", "x")
        .agg(F.sum("cents").alias("s"))
    )


def events_hourly_autocov(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: feeds both sides of the join, for every lag
    return autocov_frame(_hourly_frame(_events_cents(spark, sf_dir)).persist())


def autocov_frame(hourly: DataFrame) -> DataFrame:
    outs = []
    for lag in AUTOCOV_LAGS:
        prev = hourly.select(
            "event_type",
            (F.col("x") + F.lit(lag)).alias("x"),
            F.col("s").alias("a"),
        )
        pairs = hourly.select("event_type", "x", F.col("s").alias("b")).join(
            prev, ["event_type", "x"]
        )
        outs.append(
            pairs.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("a").cast("decimal(38,0)")).alias("sum_a"),
                F.sum(F.col("b").cast("decimal(38,0)")).alias("sum_b"),
                F.sum(F.col("a").cast("decimal(38,0)") * F.col("b")).alias(
                    "sum_ab"
                ),
            )
            .select(
                "event_type",
                F.lit(lag).cast("long").alias("lag_h"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.col("sum_a").cast("long").alias("sum_a"),
                F.col("sum_b").cast("long").alias("sum_b"),
                F.col("sum_ab").cast("decimal(38,0)").alias("sum_ab"),
                F.expr(
                    "CAST(CAST(n_pairs AS DECIMAL(38,0)) * sum_ab "
                    "- CAST(sum_a AS DECIMAL(38,0)) * sum_b "
                    "AS DECIMAL(38,0))"
                ).alias("cov_num"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _autocov_lag_sql(lag: int) -> str:
    return f"""
SELECT event_type,
       CAST({lag} AS BIGINT) AS lag_h,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(a) AS BIGINT) AS sum_a,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(CAST(a AS HUGEINT) * b) AS DECIMAL(38,0)) AS sum_ab,
       CAST(COUNT(*) * SUM(CAST(a AS HUGEINT) * b)
            - CAST(SUM(a) AS HUGEINT) * SUM(b) AS DECIMAL(38,0)) AS cov_num
FROM (
  SELECT event_type, x, s AS b,
         LAG(s, {lag}) OVER (PARTITION BY event_type ORDER BY x) AS a
  FROM dh
)
WHERE a IS NOT NULL AND b IS NOT NULL
GROUP BY event_type
"""


EVENTS_HOURLY_AUTOCOV_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         {_CENTS} AS cents
  FROM events
),
hourly AS MATERIALIZED (
  SELECT event_type, x, CAST(SUM(cents) AS BIGINT) AS s
  FROM ev GROUP BY 1, 2
),
spans AS (
  SELECT event_type, MIN(x) AS x0, MAX(x) AS x1 FROM hourly GROUP BY 1
),
dense AS (
  SELECT event_type, unnest(generate_series(x0, x1)) AS x FROM spans
),
dh AS MATERIALIZED (
  SELECT d.event_type, d.x, h.s
  FROM dense d LEFT JOIN hourly h ON h.event_type = d.event_type AND h.x = d.x
)
{_autocov_lag_sql(1)}
UNION ALL
{_autocov_lag_sql(24)}
"""


# --- events_forecast_backtest: FORECAST BACKTESTING — the evaluation
#     harness every production forecaster needs and the one time-series
#     family the engine lacked: score the two classic zero-parameter
#     baselines (persistence "tomorrow == now" at lag 1h; seasonal-naive
#     "tomorrow == same hour yesterday" at lag 24h) against the realized
#     hourly volume series, per type. Error metrics stay EXACT integers:
#     signed bias Σe and absolute error Σ|e| in cents, MAE in
#     milli-cents (Σ|e|·1000 DIV n), and WAPE in ppm (Σ|e|·1e6 DIV Σy —
#     the scale-free accuracy number dashboards quote; actuals are
#     positive cents so Σ|y| = Σy). A seasonal series shows
#     WAPE(24h) < WAPE(1h) — the signal events_hourly_autocov measures
#     as covariance, re-expressed as forecast skill. Same pairing
#     machinery and the same sparse-join-vs-dense-spine-LAG differential
#     as the autocovariance gate; same 100-TB shape (calendar-bounded
#     series, tiny aggregates).

FORECAST_LAGS = (1, 24)


def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return forecast_backtest_frame(
        _hourly_frame(_events_cents(spark, sf_dir)).persist()
    )


def forecast_backtest_frame(hourly: DataFrame) -> DataFrame:
    outs = []
    for lag in FORECAST_LAGS:
        fc = hourly.select(
            "event_type",
            (F.col("x") + F.lit(lag)).alias("x"),
            F.col("s").alias("yhat"),
        )
        pairs = hourly.select("event_type", "x", F.col("s").alias("y")).join(
            fc, ["event_type", "x"]
        )
        outs.append(
            pairs.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("y") - F.col("yhat")).alias("sum_err"),
                F.sum(F.abs(F.col("y") - F.col("yhat"))).alias("sum_abs_err"),
                F.sum("y").alias("sum_actual"),
            )
            .select(
                "event_type",
                F.lit(lag).cast("long").alias("lag_h"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.col("sum_err").cast("long").alias("sum_err"),
                F.col("sum_abs_err").cast("long").alias("sum_abs_err"),
                F.col("sum_actual").cast("long").alias("sum_actual"),
                F.expr("sum_abs_err * 1000 DIV n_pairs").alias("mae_milli"),
                F.expr("sum_abs_err * 1000000 DIV sum_actual").alias(
                    "wape_ppm"
                ),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _forecast_lag_sql(lag: int) -> str:
    return f"""
SELECT event_type,
       CAST({lag} AS BIGINT) AS lag_h,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(y - yhat) AS BIGINT) AS sum_err,
       CAST(SUM(abs(y - yhat)) AS BIGINT) AS sum_abs_err,
       CAST(SUM(y) AS BIGINT) AS sum_actual,
       CAST(SUM(abs(y - yhat)) * 1000 // COUNT(*) AS BIGINT) AS mae_milli,
       CAST(SUM(abs(y - yhat)) * 1000000 // SUM(y) AS BIGINT) AS wape_ppm
FROM (
  SELECT event_type, x, s AS y,
         LAG(s, {lag}) OVER (PARTITION BY event_type ORDER BY x) AS yhat
  FROM dh
)
WHERE yhat IS NOT NULL AND y IS NOT NULL
GROUP BY event_type
"""


EVENTS_FORECAST_BACKTEST_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         {_CENTS} AS cents
  FROM events
),
hourly AS MATERIALIZED (
  SELECT event_type, x, CAST(SUM(cents) AS BIGINT) AS s
  FROM ev GROUP BY 1, 2
),
spans AS (
  SELECT event_type, MIN(x) AS x0, MAX(x) AS x1 FROM hourly GROUP BY 1
),
dense AS (
  SELECT event_type, unnest(generate_series(x0, x1)) AS x FROM spans
),
dh AS MATERIALIZED (
  SELECT d.event_type, d.x, h.s
  FROM dense d LEFT JOIN hourly h ON h.event_type = d.event_type AND h.x = d.x
)
{_forecast_lag_sql(1)}
UNION ALL
{_forecast_lag_sql(24)}
"""


# --- events_qdigest_quantiles: Q-DIGEST — the deterministic MERGEABLE
#     quantile sketch (Shrivastava et al., SenSys'04), completing the
#     sketch family (CMS = frequency, KMV/HLL = distinct, q-digest =
#     rank/quantile). ClickHouse ships quantileTiming/quantileTDigest as
#     its mergeable -State quantiles (reference analog: the stats
#     endpoints' percentile summaries, src/api.ts); t-digest's merge is
#     order-dependent, so this engine uses the DETERMINISTIC alternative:
#     counts over the dyadic ranges of a fixed integer universe
#     [0, 2^QD_BITS) compressed level-synchronously bottom-up — sibling
#     pairs whose combined count is <= t = n DIV QD_K push up into their
#     parent; pairs above the threshold stay. The sketch is a function of
#     the leaf HISTOGRAM only (not of arrival order), so partial states
#     merge by adding histograms — the -State/-Merge contract (A7) for
#     quantiles.
#
#     Spark path: one data-sized groupBy builds the per-(type, value)
#     leaf histogram (map-side combinable; output bounded by the 2^17
#     universe per type, NEVER by row count — the same state bound as the
#     CMS w*d table). The bottom-up compression is a genuinely sequential
#     tree DP over that universe-bounded state, so it runs per type in
#     ONE applyInPandas kernel (the LTTB doctrine: Arrow kernels only
#     where semantics are sequential), emitting per-quantile estimates +
#     sketch size. The rank-error AUDIT stays distributed: a broadcast
#     join back to the events frame computes exact cnt_lt/cnt_le of each
#     estimate, and the q-digest guarantee is pinned as two flags:
#       le_ok: cnt_le >= target           (prefix nodes only hold values
#                                          <= their hi <= est)
#       lt_ok: cnt_lt <= target-1 + (QD_BITS+1)*t
#              (values < est outside the counted prefix can live only in
#               the <= QD_BITS straddling ancestors + the picked node,
#               each an internal node with count <= t by construction)
#     At 100 TB: one scan + one universe-bounded shuffle for the sketch,
#     one broadcast-join scan for the audit; no sort, no row-scale state.
#
#     Oracle: the IDENTICAL spec unrolled as 17 level-synchronous
#     MATERIALIZED CTE stages (the k-core/kmeans unrolling doctrine) +
#     a window-cumsum quantile query — DuckDB SQL recursion-free
#     re-derivation vs the Python tree DP, agreeing node-for-node
#     (sketch_nodes), estimate-for-estimate, flag-for-flag.

QD_BITS = 17          # universe [0, 131072) cents; sf0.1 max cents = 56021
QD_K = 64             # compression factor: threshold t = n DIV QD_K
QD_PCTS = (50, 90, 99)


def qdigest_compress(leaf: "dict[int, int]", t: int):
    """Level-synchronous q-digest compression of one leaf histogram.
    Returns the sketch as a list of (level, off, cnt); deterministic —
    a pure function of the histogram and t (no ordering sensitivity)."""
    return qdigest_compress_multi(
        {(QD_BITS, off): c for off, c in leaf.items()}, t
    )


def qdigest_compress_multi(states: "dict[tuple[int, int], int]", t: int):
    """Level-synchronous compression from states at ARBITRARY levels —
    the MERGE path: a union of two sketches has counts on internal
    nodes, which join the pairing at their own level on the way up.
    With all-leaf input this is exactly the build path."""
    from collections import defaultdict

    by_level: dict[int, dict[int, int]] = defaultdict(dict)
    for (level, off), c in states.items():
        by_level[level][off] = by_level[level].get(off, 0) + c
    kept: list[tuple[int, int, int]] = []
    cur: dict[int, int] = dict(by_level.get(QD_BITS, {}))
    for level in range(QD_BITS, 0, -1):
        groups: dict[int, list[tuple[int, int]]] = defaultdict(list)
        for off, c in cur.items():
            groups[off >> 1].append((off, c))
        nxt: dict[int, int] = dict(by_level.get(level - 1, {}))
        for poff, items in groups.items():
            s = sum(c for _, c in items)
            if s + nxt.get(poff, 0) <= t:
                nxt[poff] = nxt.get(poff, 0) + s
            else:
                for off, c in items:
                    kept.append((level, off, c))
        cur = nxt
    for off, c in cur.items():
        kept.append((0, off, c))
    return kept


def events_qdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qdigest_frame(_events_cents(spark, sf_dir))


def qdigest_frame(
    ev_cents: DataFrame, _hist: DataFrame | None = None
) -> DataFrame:
    """Core path over any (event_type, cents) frame — factored out so
    scripts/scale_check.py can drive it at N× event scale (the sketch
    state is universe-bounded, so N× rows should cost ~one extra scan).
    r11: with a caller-shared value-grain ``_hist`` the leaf histogram is
    a tiny re-key (clamp) and the rank audit a weighted fold — zero
    corpus scans; standalone, the audit now reads the leaf histogram
    instead of rescanning the corpus (one scan, was two)."""
    import pandas as pd

    cap = (1 << QD_BITS) - 1
    clamp_v = F.greatest(
        F.least(F.col("cents"), F.lit(cap)), F.lit(0)
    ).alias("v")
    if _hist is not None:
        leaf = (
            _hist.select("event_type", clamp_v, "cnt")
            .groupBy("event_type", "v")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        leaf = (
            ev_cents.select("event_type", clamp_v)
            .groupBy("event_type", "v")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        et = pdf["event_type"].iloc[0]
        hist = dict(zip((int(x) for x in pdf["v"]), (int(c) for c in pdf["cnt"])))
        n = sum(hist.values())
        t = n // QD_K
        sketch = qdigest_compress(hist, t)
        # quantile query: postorder (hi asc, lo desc == smaller range
        # first), accumulate until the nearest-rank target is covered
        nodes = []
        for level, off, c in sketch:
            size = 1 << (QD_BITS - level)
            lo = off * size
            nodes.append((lo + size - 1, -lo, c))
        nodes.sort()
        rows = []
        for q in QD_PCTS:
            target = (n - 1) * q // 100 + 1
            cum = 0
            est = nodes[-1][0]
            for hi, neg_lo, c in nodes:
                cum += c
                if cum >= target:
                    est = hi
                    break
            rows.append((et, q, n, t, len(sketch), est, target))
        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "q_pct", "n", "t", "sketch_nodes",
                "est_cents", "target",
            ],
        )

    est = leaf.groupBy("event_type").applyInPandas(
        kernel,
        "event_type string, q_pct long, n long, t long, sketch_nodes long, "
        "est_cents long, target long",
    )
    aud = (
        leaf.join(
            F.broadcast(est.select("event_type", "q_pct", "est_cents")),
            "event_type",
        )
        .groupBy("event_type", "q_pct", "est_cents")
        .agg(
            F.sum(
                F.when(F.col("v") < F.col("est_cents"), F.col("cnt")).otherwise(0)
            ).alias("cnt_lt"),
            F.sum(
                F.when(F.col("v") <= F.col("est_cents"), F.col("cnt")).otherwise(0)
            ).alias("cnt_le"),
        )
    )
    return (
        est.join(aud, ["event_type", "q_pct", "est_cents"])
        .select(
            "event_type",
            F.col("q_pct").cast("long").alias("q_pct"),
            F.col("n").cast("long").alias("n"),
            F.col("t").cast("long").alias("t"),
            F.col("sketch_nodes").cast("long").alias("sketch_nodes"),
            F.col("est_cents").cast("long").alias("est_cents"),
            F.col("target").cast("long").alias("target"),
            F.col("cnt_lt").cast("long").alias("cnt_lt"),
            F.col("cnt_le").cast("long").alias("cnt_le"),
            (F.col("cnt_le") >= F.col("target")).alias("le_ok"),
            (
                F.col("cnt_lt")
                <= F.col("target") - 1 + F.lit(QD_BITS + 1) * F.col("t")
            ).alias("lt_ok"),
        )
    )


def _qdigest_level_sql(level: int, pfx: str = "") -> str:
    """One level-synchronous compression stage: pair level-`level` nodes
    by parent, push pairs with combined count <= t up, keep the rest.
    ``pfx`` namespaces the CTE chain (the merge gate runs two builds)."""
    return f"""
{pfx}p{level} AS MATERIALIZED (
  SELECT event_type, off // 2 AS poff, CAST(SUM(cnt) AS BIGINT) AS s
  FROM {pfx}l{level} GROUP BY 1, 2
),
{pfx}k{level} AS (
  SELECT c.event_type, {level} AS level, c.off, c.cnt
  FROM {pfx}l{level} c
  JOIN {pfx}p{level} p ON p.event_type = c.event_type AND p.poff = c.off // 2
  JOIN {pfx}thr t ON t.event_type = c.event_type
  WHERE p.s > t.t
),
{pfx}l{level - 1} AS MATERIALIZED (
  SELECT p.event_type, p.poff AS off, p.s AS cnt
  FROM {pfx}p{level} p JOIN {pfx}thr t ON t.event_type = p.event_type
  WHERE p.s <= t.t
)"""


EVENTS_QDIGEST_QUANTILES_SQL = (
    f"""
WITH ev AS (
  SELECT event_type,
         GREATEST(LEAST({_CENTS}, {(1 << QD_BITS) - 1}), 0) AS v
  FROM events
),
leaf AS MATERIALIZED (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
),
thr AS MATERIALIZED (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt) // {QD_K} AS BIGINT) AS t
  FROM leaf GROUP BY 1
),
l{QD_BITS} AS MATERIALIZED (
  SELECT event_type, v AS off, cnt FROM leaf
),"""
    + ",".join(_qdigest_level_sql(lv) for lv in range(QD_BITS, 0, -1))
    + f""",
sketch AS MATERIALIZED (
  {" UNION ALL ".join(f"SELECT * FROM k{lv}" for lv in range(QD_BITS, 0, -1))}
  UNION ALL SELECT event_type, 0 AS level, off, cnt FROM l0
),
nodes AS (
  SELECT event_type, cnt,
         off * (CAST(1 AS BIGINT) << ({QD_BITS} - level))
           + (CAST(1 AS BIGINT) << ({QD_BITS} - level)) - 1 AS hi,
         off * (CAST(1 AS BIGINT) << ({QD_BITS} - level)) AS lo
  FROM sketch
),
sksize AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sketch_nodes
  FROM sketch GROUP BY 1
),
cums AS (
  SELECT event_type, hi, lo, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY hi, lo DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM nodes
),
targets AS (
  SELECT t.event_type, q.q_pct, t.n, t.t,
         CAST((t.n - 1) * q.q_pct // 100 + 1 AS BIGINT) AS target
  FROM thr t
  CROSS JOIN (SELECT unnest(ARRAY{list(QD_PCTS)}) AS q_pct) q
),
est AS (
  SELECT g.event_type, CAST(g.q_pct AS BIGINT) AS q_pct, g.n, g.t, g.target,
         CAST(MIN(c.hi) AS BIGINT) AS est_cents
  FROM targets g
  JOIN cums c ON c.event_type = g.event_type AND c.cum >= g.target
  GROUP BY 1, 2, 3, 4, 5
),
aud AS (
  SELECT e.event_type, e.q_pct,
         CAST(SUM(CASE WHEN v.v < e.est_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_lt,
         CAST(SUM(CASE WHEN v.v <= e.est_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_le
  FROM est e JOIN ev v ON v.event_type = e.event_type
  GROUP BY 1, 2
)
SELECT e.event_type, e.q_pct, e.n, e.t, s.sketch_nodes, e.est_cents,
       e.target, a.cnt_lt, a.cnt_le,
       a.cnt_le >= e.target AS le_ok,
       a.cnt_lt <= e.target - 1 + {QD_BITS + 1} * e.t AS lt_ok
FROM est e
JOIN sksize s ON s.event_type = e.event_type
JOIN aud a ON a.event_type = e.event_type AND a.q_pct = e.q_pct
"""
)


# --- events_decayed_leaderboard: EXPONENTIALLY-DECAYED COUNTERS — the
#     ClickHouse exponentialTimeDecayedSum / "trending leaderboard"
#     analog (reference analog: the leaderboard endpoints rank wallets
#     by recent activity, src/api.ts leaderboard + the profit-leaders
#     materialized view). Classic float decay sum(v * exp(-age/tau))
#     is order-sensitive and engine-divergent; this path makes decay
#     EXACT: ages are whole days against the fixed anchor
#     DATE '2024-01-31', the decay base is 2, and every weight is a
#     bit-shift — weight_fast = 2^(31 - age_days) (1-day half-life),
#     weight_slow = 2^(5 - age_days DIV 7) (7-day half-life at week
#     granularity); each score is its own fixed-point scale, ranked
#     only within itself.
#     Scores are DECIMAL(38,0) sums of cents << shift — exact integers,
#     identical in both engines; top-20 users by (score_fast DESC,
#     user_id) with the mandatory unique tiebreak.
#     At 100 TB: one scan, one map-side-combinable user groupBy, one
#     TakeOrdered(20) — no sort, no window; the anchor/horizon are
#     injected constants (the injected-clock discipline of P7), so the
#     incremental form is a SummingMergeTree-style additive fold per
#     (user, day) re-weighted at read time.

DECAY_ANCHOR = "2024-01-31"
DECAY_HORIZON = 31  # ages 1..30 in the fixtures; age > 31 weights to 0


def events_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    age = F.datediff(F.lit(DECAY_ANCHOR).cast("date"), F.to_date("ts"))
    base = ev.select(
        "user_id",
        "cents",
        age.alias("age"),
    ).filter((F.col("age") >= 0) & (F.col("age") <= DECAY_HORIZON))
    scored = base.select(
        "user_id",
        (
            F.col("cents").cast("decimal(38,0)")
            * F.expr(f"shiftleft(CAST(1 AS BIGINT), {DECAY_HORIZON} - age)")
        ).alias("wf"),
        (
            F.col("cents").cast("decimal(38,0)")
            * F.expr("shiftleft(CAST(1 AS BIGINT), 5 - age DIV 7)")
        ).alias("ws"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("wf").alias("score_fast"),
            F.sum("ws").alias("score_slow"),
        )
        .orderBy(F.col("score_fast").desc(), F.col("user_id"))
        .limit(20)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("score_fast").cast("decimal(38,0)").alias("score_fast"),
            F.col("score_slow").cast("decimal(38,0)").alias("score_slow"),
        )
    )


EVENTS_DECAYED_LEADERBOARD_SQL = f"""
WITH ev AS (
  SELECT user_id,
         {_CENTS} AS cents,
         date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE),
                   DATE '{DECAY_ANCHOR}') AS age
  FROM events
  WHERE date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE),
                  DATE '{DECAY_ANCHOR}') BETWEEN 0 AND {DECAY_HORIZON}
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(cents AS HUGEINT)
                * (CAST(1 AS BIGINT) << ({DECAY_HORIZON} - age)))
            AS DECIMAL(38,0)) AS score_fast,
       CAST(SUM(CAST(cents AS HUGEINT)
                * (CAST(1 AS BIGINT) << (5 - age // 7)))
            AS DECIMAL(38,0)) AS score_slow
FROM ev
GROUP BY user_id
ORDER BY score_fast DESC, user_id
LIMIT 20
"""


# --- user_churn_hazard: SURVIVAL ANALYSIS (Nelson–Aalen cumulative
#     hazard) over user lifetimes — the churn-risk curve product
#     dashboards plot (reference analog: wallet-activity endpoints rank
#     by recency; survival generalizes "recent" into a hazard profile).
#     A user's lifetime is datediff(first event day, last event day);
#     the observation is CHURN if the user is quiet for the final
#     CHURN_QUIET_DAYS before the injected horizon (P7 injected-clock
#     discipline), else RIGHT-CENSORED at the same duration — the
#     textbook censoring setup. Per duration day t:
#       n_risk(t)  = users with lifetime >= t   (reverse cumsum)
#       d(t), c(t) = churned / censored at exactly t
#       hazard_ppm = d*1e6 DIV n_risk            (floored per term, so
#       cum_hazard = running sum of hazard_ppm    both engines agree
#                                                 exactly — no float)
#     The classic Kaplan-Meier PRODUCT is order-sensitive under
#     per-step rounding; Nelson–Aalen is a SUM, hence window-friendly
#     and exactly deterministic — the same reason dsum replaced naive
#     float sums. At 100 TB: one user groupBy + aggregation onto a
#     CALENDAR-BOUNDED duration spine; the two global windows run over
#     <= #days rows (plan_audit BOUNDED_GLOBAL_WINDOW).

CHURN_CENSOR_DATE = "2024-01-30"
CHURN_QUIET_DAYS = 3


def user_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return churn_hazard_frame(
        load_table(spark, sf_dir, "events").select("user_id", "ts")
    )


def churn_hazard_frame(ev_raw: DataFrame) -> DataFrame:
    """Core path over any (user_id, ts) frame — factored out for the
    planted-censoring property test."""
    ev = ev_raw.select("user_id", F.to_date("ts").alias("d"))
    per_user = ev.groupBy("user_id").agg(
        F.min("d").alias("first_d"), F.max("d").alias("last_d")
    )
    du = per_user.select(
        F.datediff("last_d", "first_d").alias("t_days"),
        (
            F.datediff(F.lit(CHURN_CENSOR_DATE).cast("date"), F.col("last_d"))
            >= CHURN_QUIET_DAYS
        ).cast("long").alias("churned"),
    )
    ends = du.groupBy("t_days").agg(
        F.sum("churned").alias("d_churn"),
        F.sum(F.lit(1) - F.col("churned")).alias("n_censored"),
    )
    w_risk = (
        Window.orderBy(F.desc("t_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_cum = (
        Window.orderBy(F.asc("t_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ends.withColumn(
            "n_risk",
            F.sum(F.col("d_churn") + F.col("n_censored")).over(w_risk),
        )
        .withColumn("hazard_ppm", F.expr("d_churn * 1000000 DIV n_risk"))
        .withColumn("cum_hazard_ppm", F.sum("hazard_ppm").over(w_cum))
        .select(
            F.col("t_days").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d_churn").cast("long").alias("d_churn"),
            F.col("n_censored").cast("long").alias("n_censored"),
            F.col("hazard_ppm").cast("long").alias("hazard_ppm"),
            F.col("cum_hazard_ppm").cast("long").alias("cum_hazard_ppm"),
        )
    )


USER_CHURN_HAZARD_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_d,
         MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_d
  FROM events GROUP BY user_id
),
du AS (
  SELECT date_diff('day', first_d, last_d) AS t_days,
         CASE WHEN date_diff('day', last_d, DATE '{CHURN_CENSOR_DATE}')
                   >= {CHURN_QUIET_DAYS}
              THEN 1 ELSE 0 END AS churned
  FROM per_user
),
ends AS (
  SELECT t_days,
         CAST(SUM(churned) AS BIGINT) AS d_churn,
         CAST(SUM(1 - churned) AS BIGINT) AS n_censored
  FROM du GROUP BY t_days
),
risk AS (
  SELECT t_days, d_churn, n_censored,
         SUM(d_churn + n_censored) OVER (ORDER BY t_days DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk,
         d_churn * 1000000 // SUM(d_churn + n_censored)
           OVER (ORDER BY t_days DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hazard_ppm
  FROM ends
)
SELECT CAST(t_days AS BIGINT) AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d_churn, n_censored,
       CAST(hazard_ppm AS BIGINT) AS hazard_ppm,
       CAST(SUM(hazard_ppm) OVER (ORDER BY t_days ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_ppm
FROM risk
"""


# --- events_series_suite: fused ROBUST-SERIES audit gate (the r7
#     evidence-rotation slot, the docs_pair_recall_audit /
#     docs_sketch_suite model): EXECUTES five component pipelines and
#     emits every result as labeled (family, k, metric, value) rows —
#     giving the never-externally-gated r7 series families
#     (order-statistic selection, median/MAD outliers, autocovariance
#     seasonality, forecast backtesting, and — grown late-r7 — the
#     q-digest quantile sketch with its full rank-error audit) an
#     in-window CORRECTNESS row in ONE slot, while running the
#     displaced window entry's logic
#     verbatim (props_bucket_agg — the §2.8 JSON-extraction evidence
#     keeps its external check; strict-superset swap rule).
#     Subtree reuse (the r7 fused-gate lesson): ONE persisted cents
#     frame feeds the selection + MAD paths, ONE persisted hourly-series
#     frame feeds the autocov + forecast paths.
#     The value column is STRING: exact for BIGINTs and DECIMAL(38,0)s
#     (autocov's cov_num exceeds 2^53 — a double cast would be the
#     banned bare decimal→double); the props path integerizes its
#     ROUND(4) double as value*10000 via identical IEEE floor ops.


def events_series_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scope shuffle parallelism to the whole suite (the ann_index_audit
    # conf-pin doctrine): the plain driver session plans every window /
    # un-repartitioned groupBy across the 19 branches at 200 partitions,
    # and the eager union job pays ~200 near-empty tasks per such stage.
    # The result is checkpointed eagerly inside, so restoring after is
    # safe. Measured at the sf0.01 gate on the sim's local[8]: warm
    # spark-side 20.0s -> single-digit with the pin.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        return _series_suite_body(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _series_suite_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .events import props_bucket_agg

    n_par = spark.sparkContext.defaultParallelism
    ev = _events_cents(spark, sf_dir).persist()
    cents2 = ev.select("event_type", "cents")
    hourly = _hourly_frame(ev).persist()
    # r8 growth (verdict task 4): the cusum, counter-reset and
    # seasonal-residual families ride the SAME persisted subtrees —
    # hourly-count series for cusum, the raw persisted scan for the
    # counter fold, the existing hourly-cents series for seasonal
    hourly_n = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .repartition(n_par, "event_type")
        .persist()
    )
    # Materialize the shared caches BEFORE the eager union job: its ~19
    # branches otherwise START CONCURRENTLY against cold persists and
    # each recomputes the same events-scan/hourly partitions (Spark's
    # block manager dedups nothing mid-flight — a sibling task only sees
    # a cached partition AFTER the first computer finishes). Measured at
    # the sf0.01 gate: 30.9s cold-raced vs ~15.5s for the same 19 paths
    # run sequentially over warm caches (r10; the ann_index_audit
    # emb.count() precedent).
    hourly.count()  # populates ev transitively, then hourly
    hourly_n.count()
    # r11: ONE value-grain histogram pass feeds ALL five distribution
    # paths (qsel, mad, robust, q-digest, q-digest-merge) — rank
    # selection, winsorize/trim folds and sketch leaves are pure
    # functions of (event_type[, half], cents) counts, so the suite pays
    # one corpus aggregation where it paid ~8 passes (profiled: the mad
    # path alone was 2.9s of the 16s gate). hist2 carries the q-digest
    # split flag; hist is its rollup.
    hist2 = (
        ev.groupBy(
            "event_type",
            (F.dayofmonth("ts") <= QD_SPLIT_DAY).cast("int").alias(
                "first_half"
            ),
            "cents",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .repartition(n_par, "event_type")
        .persist()
    )
    hist = (
        hist2.groupBy("event_type", "cents")
        .agg(F.sum("cnt").alias("cnt"))
        .persist()
    )
    hist2.count()
    hist.count()

    # r11: the 19 family builders are DRIVER-PACED at construction time
    # (internal selection persists/counts, broadcast collects) — built
    # serially they cost ~10.5s of the gate before the eager union job
    # even starts (profiled at sf0.01; the union's lazy tails were never
    # the problem). Pool the CONSTRUCTIONS (the r9 pooling rule: pools
    # pay for driver-paced work only) — every shared subtree is already
    # materialized above so no thunk can cold-race a sibling, and none
    # of the builders sets session confs (the suite's pin is hoisted
    # around the whole body).
    released: list = []
    thunks: dict = {}
    thunks["qsel"] = lambda: quantile_select_frame(
        cents2, bounded_axis=True, _hist=hist
    ).selectExpr(
        "'qsel' AS family",
        "event_type || '/' || CAST(q_pct AS STRING) AS k",
        "stack(3, 'n', CAST(n AS STRING),"
        " 'rank_k', CAST(k AS STRING),"
        " 'value_cents', CAST(value_cents AS STRING)) AS (metric, value)",
    )
    thunks["mad"] = lambda: mad_outliers_frame(cents2, _hist=hist).selectExpr(
        "'mad' AS family",
        "event_type AS k",
        "stack(5, 'n', CAST(n AS STRING),"
        " 'med_cents', CAST(med_cents AS STRING),"
        " 'mad_cents', CAST(mad_cents AS STRING),"
        " 'n_outliers', CAST(n_outliers AS STRING),"
        " 'outlier_ppm', CAST(outlier_ppm AS STRING)) AS (metric, value)",
    )
    thunks["acv"] = lambda: autocov_frame(hourly).selectExpr(
        "'autocov' AS family",
        "event_type || '/' || CAST(lag_h AS STRING) AS k",
        "stack(5, 'n_pairs', CAST(n_pairs AS STRING),"
        " 'sum_a', CAST(sum_a AS STRING),"
        " 'sum_b', CAST(sum_b AS STRING),"
        " 'sum_ab', CAST(sum_ab AS STRING),"
        " 'cov_num', CAST(cov_num AS STRING)) AS (metric, value)",
    )
    thunks["fct"] = lambda: forecast_backtest_frame(hourly).selectExpr(
        "'forecast' AS family",
        "event_type || '/' || CAST(lag_h AS STRING) AS k",
        "stack(6, 'n_pairs', CAST(n_pairs AS STRING),"
        " 'sum_err', CAST(sum_err AS STRING),"
        " 'sum_abs_err', CAST(sum_abs_err AS STRING),"
        " 'sum_actual', CAST(sum_actual AS STRING),"
        " 'mae_milli', CAST(mae_milli AS STRING),"
        " 'wape_ppm', CAST(wape_ppm AS STRING)) AS (metric, value)",
    )
    # feed the sketch from the suite's persisted cents subtree (NOT
    # events_qdigest_quantiles(spark, sf_dir), which would re-scan the raw
    # corpus — one extra scan per gate run; r7 ADVICE)
    thunks["qd"] = lambda: qdigest_frame(cents2, _hist=hist).selectExpr(
        "'qdigest' AS family",
        "event_type || '/' || CAST(q_pct AS STRING) AS k",
        "stack(9, 'n', CAST(n AS STRING),"
        " 't', CAST(t AS STRING),"
        " 'sketch_nodes', CAST(sketch_nodes AS STRING),"
        " 'est_cents', CAST(est_cents AS STRING),"
        " 'target', CAST(target AS STRING),"
        " 'cnt_lt', CAST(cnt_lt AS STRING),"
        " 'cnt_le', CAST(cnt_le AS STRING),"
        " 'le_ok', CAST(le_ok AS STRING),"
        " 'lt_ok', CAST(lt_ok AS STRING)) AS (metric, value)",
    )
    thunks["props"] = lambda: props_bucket_agg(spark, sf_dir).selectExpr(
        "'props' AS family",
        "CAST(k_bucket AS STRING) AS k",
        "stack(2, 'n', CAST(n AS STRING),"
        " 'total_value_e4', CAST(CAST(FLOOR(total_value * 10000 + 0.5)"
        " AS BIGINT) AS STRING)) AS (metric, value)",
    )
    thunks["csm"] = lambda: cusum_alarms_frame(hourly_n).selectExpr(
        "'cusum' AS family",
        "event_type || '/' || CAST(datediff(bucket, DATE '2024-01-01') * 24"
        " + hour(bucket) AS STRING) AS k",
        "stack(4, 'n', CAST(n AS STRING),"
        " 'med', CAST(med AS STRING),"
        " 'cusum', CAST(cusum AS STRING),"
        " 'threshold', CAST(threshold AS STRING)) AS (metric, value)",
    )
    thunks["ctr"] = lambda: counter_delta_frame(ev).selectExpr(
        "'ctr' AS family",
        "event_type AS k",
        "stack(5, 'n', CAST(n AS STRING),"
        " 'n_resets', CAST(n_resets AS STRING),"
        " 'last_c', CAST(last_c AS STRING),"
        " 'increase_wrapped', CAST(increase_wrapped AS STRING),"
        " 'delta_sum_conserv', CAST(delta_sum_conserv AS STRING))"
        " AS (metric, value)",
    )
    # r8 growth 2: the q-digest -State/-Merge audit (the last r7 family
    # without an in-window row) executed verbatim off the same persisted
    # scan; booleans ride as 0/1 ints (CAST path identical cross-engine)
    thunks["qdm"] = lambda: qdigest_merge_frame(ev, _hist2=hist2).selectExpr(
        "'qdmerge' AS family",
        "event_type || '/' || CAST(q_pct AS STRING) AS k",
        "stack(11, 'n', CAST(n AS STRING),"
        " 't', CAST(t AS STRING),"
        " 't_a', CAST(t_a AS STRING),"
        " 't_b', CAST(t_b AS STRING),"
        " 'sketch_nodes', CAST(sketch_nodes AS STRING),"
        " 'est_cents', CAST(est_cents AS STRING),"
        " 'target', CAST(target AS STRING),"
        " 'cnt_lt', CAST(cnt_lt AS STRING),"
        " 'cnt_le', CAST(cnt_le AS STRING),"
        " 'le_ok', CAST(CAST(le_ok AS INT) AS STRING),"
        " 'lt_ok', CAST(CAST(lt_ok AS INT) AS STRING)) AS (metric, value)",
    )
    # r8 growth 3: winsorized/trimmed robust means off the same cents
    # subtree (selection thresholds + one conditional aggregation)
    thunks["rbm"] = lambda: robust_means_frame(cents2, _hist=hist).selectExpr(
        "'robust' AS family",
        "event_type AS k",
        "stack(8, 'lo_cents', CAST(lo_cents AS STRING),"
        " 'hi_cents', CAST(hi_cents AS STRING),"
        " 'n', CAST(n AS STRING),"
        " 'winsorized_sum', CAST(winsorized_sum AS STRING),"
        " 'winsorized_mean_milli', CAST(winsorized_mean_milli AS STRING),"
        " 'trimmed_sum', CAST(trimmed_sum AS STRING),"
        " 'trimmed_n', CAST(trimmed_n AS STRING),"
        " 'trimmed_mean_milli', CAST(trimmed_mean_milli AS STRING))"
        " AS (metric, value)",
    )
    thunks["ssn"] = lambda: seasonal_residual_frame(
        hourly.withColumn("hod", F.col("x") % 24).repartition(
            n_par, "event_type"
        )
    ).selectExpr(
        "'seasonal' AS family",
        "event_type AS k",
        "stack(5, 'n_hours', CAST(n_hours AS STRING),"
        " 'seasonal_mad', CAST(seasonal_mad AS STRING),"
        " 'n_outliers', CAST(n_outliers AS STRING),"
        " 'outlier_ppm', CAST(outlier_ppm AS STRING),"
        " 'max_abs_resid', CAST(max_abs_resid AS STRING))"
        " AS (metric, value)",
    )
    # r9 growth (r8 verdict task 7): the distribution-drift and A/B-arm
    # monitors — both single map-side-combinable scan shapes — executed
    # verbatim off the same persisted scan; sumsq_cents rides the exact
    # DECIMAL(38,0)-as-STRING path (the autocov cov_num precedent)
    thunks["dft"] = lambda: value_drift_frame(ev).selectExpr(
        "'drift' AS family",
        "event_type || '/' || CAST(bucket AS STRING) AS k",
        "stack(5, 'n_first', CAST(n_first AS STRING),"
        " 'n_second', CAST(n_second AS STRING),"
        " 'share_first_ppm', CAST(share_first_ppm AS STRING),"
        " 'share_second_ppm', CAST(share_second_ppm AS STRING),"
        " 'abs_share_diff_ppm', CAST(abs_share_diff_ppm AS STRING))"
        " AS (metric, value)",
    )
    thunks["ab"] = lambda: ab_arm_stats_frame(ev).selectExpr(
        "'ab' AS family",
        "event_type || '/' || arm AS k",
        "stack(3, 'n', CAST(n AS STRING),"
        " 'sum_cents', CAST(sum_cents AS STRING),"
        " 'sumsq_cents', CAST(sumsq_cents AS STRING)) AS (metric, value)",
    )
    # r9 growths 2: the cross-type lead-lag correlation stats ride the
    # SAME persisted hourly series as autocov/forecast, and the Markov
    # transition fit rides the persisted raw scan
    thunks["xc"] = lambda: xcorr_frame(hourly).selectExpr(
        "'xcorr' AS family",
        "type_a || '/' || type_b || '/' || CAST(lag_h AS STRING) AS k",
        "stack(5, 'n_pairs', CAST(n_pairs AS STRING),"
        " 'sum_a', CAST(sum_a AS STRING),"
        " 'sum_b', CAST(sum_b AS STRING),"
        " 'sum_ab', CAST(sum_ab AS STRING),"
        " 'cov_num', CAST(cov_num AS STRING)) AS (metric, value)",
    )
    thunks["mkv"] = lambda: transition_matrix_frame(ev).selectExpr(
        "'markov' AS family",
        "prev_type || '/' || next_type AS k",
        "stack(3, 'n', CAST(n AS STRING),"
        " 'row_total', CAST(row_total AS STRING),"
        " 'p_ppm', CAST(p_ppm AS STRING)) AS (metric, value)",
    )
    # r9 growths 3: the integer EWMA control chart rides the persisted
    # hourly series; the day-bitmap -Merge tier rides the raw scan
    thunks["ewm"] = lambda: ewma_control_frame(hourly).selectExpr(
        "'ewma' AS family",
        "event_type || '/' || CAST(x AS STRING) AS k",
        "stack(3, 's', CAST(s AS STRING),"
        " 'ewma', CAST(ewma AS STRING),"
        " 'resid', CAST(resid AS STRING)) AS (metric, value)",
    )
    thunks["bmp"] = lambda: day_bitmap_frame(ev).selectExpr(
        "'bitmap' AS family",
        "event_type AS k",
        "stack(6, 'n_users', CAST(n_users AS STRING),"
        " 'or_mask', CAST(or_mask AS STRING),"
        " 'and_mask', CAST(and_mask AS STRING),"
        " 'coverage_days', CAST(coverage_days AS STRING),"
        " 'common_days', CAST(common_days AS STRING),"
        " 'sum_user_days', CAST(sum_user_days AS STRING))"
        " AS (metric, value)",
    )
    # r9 growths 4: growth accounting + bag set-ops off the same scan
    from .events import bag_setops_frame, growth_accounting_frame

    thunks["grw"] = lambda: growth_accounting_frame(ev, _cache_out=released).selectExpr(
        "'growth' AS family",
        "date_format(day, 'yyyy-MM-dd') AS k",
        "stack(4, 'n_new', CAST(n_new AS STRING),"
        " 'n_retained', CAST(n_retained AS STRING),"
        " 'n_resurrected', CAST(n_resurrected AS STRING),"
        " 'n_churned', CAST(n_churned AS STRING)) AS (metric, value)",
    )
    thunks["bag"] = lambda: bag_setops_frame(ev).selectExpr(
        "'bagops' AS family",
        "op || '/' || CAST(user_id AS STRING) AS k",
        "stack(1, 'multiplicity', CAST(multiplicity AS STRING))"
        " AS (metric, value)",
    )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = {n: pool.submit(t) for n, t in thunks.items()}
        fr = {n: f.result() for n, f in futs.items()}
    # materialize growth's persisted user-day frame too — it feeds three
    # branches of the union job (same cold-race class as above)
    for f in released:
        f.count()
    # eager checkpoint + RELEASE the shared subtrees (the segmentation
    # suite's session-cache-pressure rationale)
    out = (
        fr["qsel"].unionByName(fr["mad"])
        .unionByName(fr["acv"])
        .unionByName(fr["fct"])
        .unionByName(fr["qd"])
        .unionByName(fr["props"])
        .unionByName(fr["csm"])
        .unionByName(fr["ctr"])
        .unionByName(fr["ssn"])
        .unionByName(fr["qdm"])
        .unionByName(fr["rbm"])
        .unionByName(fr["dft"])
        .unionByName(fr["ab"])
        .unionByName(fr["xc"])
        .unionByName(fr["mkv"])
        .unionByName(fr["ewm"])
        .unionByName(fr["bmp"])
        .unionByName(fr["grw"])
        .unionByName(fr["bag"])
    )
    try:
        out = out.localCheckpoint(eager=True)
    finally:
        for f in (hourly_n, hourly, hist2, hist, ev, *released):
            f.unpersist()
    return out


def _series_suite_sql() -> str:
    from .events import (
        EVENTS_BAG_SETOPS_SQL,
        EVENTS_GROWTH_ACCOUNTING_SQL,
        PROPS_BUCKET_AGG_SQL,
    )

    return f"""
SELECT 'qsel' AS family,
       q.event_type || '/' || CAST(q.q_pct AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n' THEN CAST(q.n AS VARCHAR)
                     WHEN 'rank_k' THEN CAST(q.k AS VARCHAR)
                     ELSE CAST(q.value_cents AS VARCHAR) END AS value
FROM ({EVENTS_QUANTILE_SELECT_SQL}) q,
     (SELECT unnest(['n','rank_k','value_cents']) AS metric) m
UNION ALL
SELECT 'mad' AS family, d.event_type AS k, m.metric,
       CASE m.metric WHEN 'n' THEN CAST(d.n AS VARCHAR)
                     WHEN 'med_cents' THEN CAST(d.med_cents AS VARCHAR)
                     WHEN 'mad_cents' THEN CAST(d.mad_cents AS VARCHAR)
                     WHEN 'n_outliers' THEN CAST(d.n_outliers AS VARCHAR)
                     ELSE CAST(d.outlier_ppm AS VARCHAR) END AS value
FROM ({EVENTS_VALUE_MAD_OUTLIERS_SQL}) d,
     (SELECT unnest(['n','med_cents','mad_cents','n_outliers','outlier_ppm'])
        AS metric) m
UNION ALL
SELECT 'autocov' AS family,
       a.event_type || '/' || CAST(a.lag_h AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n_pairs' THEN CAST(a.n_pairs AS VARCHAR)
                     WHEN 'sum_a' THEN CAST(a.sum_a AS VARCHAR)
                     WHEN 'sum_b' THEN CAST(a.sum_b AS VARCHAR)
                     WHEN 'sum_ab' THEN CAST(a.sum_ab AS VARCHAR)
                     ELSE CAST(a.cov_num AS VARCHAR) END AS value
FROM ({EVENTS_HOURLY_AUTOCOV_SQL}) a,
     (SELECT unnest(['n_pairs','sum_a','sum_b','sum_ab','cov_num'])
        AS metric) m
UNION ALL
SELECT 'forecast' AS family,
       f.event_type || '/' || CAST(f.lag_h AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n_pairs' THEN CAST(f.n_pairs AS VARCHAR)
                     WHEN 'sum_err' THEN CAST(f.sum_err AS VARCHAR)
                     WHEN 'sum_abs_err' THEN CAST(f.sum_abs_err AS VARCHAR)
                     WHEN 'sum_actual' THEN CAST(f.sum_actual AS VARCHAR)
                     WHEN 'mae_milli' THEN CAST(f.mae_milli AS VARCHAR)
                     ELSE CAST(f.wape_ppm AS VARCHAR) END AS value
FROM ({EVENTS_FORECAST_BACKTEST_SQL}) f,
     (SELECT unnest(['n_pairs','sum_err','sum_abs_err','sum_actual',
                     'mae_milli','wape_ppm']) AS metric) m
UNION ALL
SELECT 'qdigest' AS family,
       d.event_type || '/' || CAST(d.q_pct AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n' THEN CAST(d.n AS VARCHAR)
                     WHEN 't' THEN CAST(d.t AS VARCHAR)
                     WHEN 'sketch_nodes' THEN CAST(d.sketch_nodes AS VARCHAR)
                     WHEN 'est_cents' THEN CAST(d.est_cents AS VARCHAR)
                     WHEN 'target' THEN CAST(d.target AS VARCHAR)
                     WHEN 'cnt_lt' THEN CAST(d.cnt_lt AS VARCHAR)
                     WHEN 'cnt_le' THEN CAST(d.cnt_le AS VARCHAR)
                     WHEN 'le_ok' THEN CAST(d.le_ok AS VARCHAR)
                     ELSE CAST(d.lt_ok AS VARCHAR) END AS value
FROM ({EVENTS_QDIGEST_QUANTILES_SQL}) d,
     (SELECT unnest(['n','t','sketch_nodes','est_cents','target',
                     'cnt_lt','cnt_le','le_ok','lt_ok']) AS metric) m
UNION ALL
SELECT 'props' AS family, CAST(p.k_bucket AS VARCHAR) AS k, m.metric,
       CASE m.metric WHEN 'n' THEN CAST(p.n AS VARCHAR)
                     ELSE CAST(CAST(FLOOR(p.total_value * 10000 + 0.5)
                               AS BIGINT) AS VARCHAR) END AS value
FROM ({PROPS_BUCKET_AGG_SQL}) p,
     (SELECT unnest(['n','total_value_e4']) AS metric) m
UNION ALL
SELECT 'cusum' AS family,
       c.event_type || '/' ||
       CAST(date_diff('day', DATE '2024-01-01', CAST(c.bucket AS DATE)) * 24
            + hour(c.bucket) AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n' THEN CAST(c.n AS VARCHAR)
                     WHEN 'med' THEN CAST(c.med AS VARCHAR)
                     WHEN 'cusum' THEN CAST(c.cusum AS VARCHAR)
                     ELSE CAST(c.threshold AS VARCHAR) END AS value
FROM ({EVENTS_CUSUM_ALARMS_SQL}) c,
     (SELECT unnest(['n','med','cusum','threshold']) AS metric) m
UNION ALL
SELECT 'ctr' AS family, t.event_type AS k, m.metric,
       CASE m.metric WHEN 'n' THEN CAST(t.n AS VARCHAR)
                     WHEN 'n_resets' THEN CAST(t.n_resets AS VARCHAR)
                     WHEN 'last_c' THEN CAST(t.last_c AS VARCHAR)
                     WHEN 'increase_wrapped'
                       THEN CAST(t.increase_wrapped AS VARCHAR)
                     ELSE CAST(t.delta_sum_conserv AS VARCHAR) END AS value
FROM ({EVENTS_COUNTER_DELTA_SUM_SQL}) t,
     (SELECT unnest(['n','n_resets','last_c','increase_wrapped',
                     'delta_sum_conserv']) AS metric) m
UNION ALL
SELECT 'seasonal' AS family, s.event_type AS k, m.metric,
       CASE m.metric WHEN 'n_hours' THEN CAST(s.n_hours AS VARCHAR)
                     WHEN 'seasonal_mad' THEN CAST(s.seasonal_mad AS VARCHAR)
                     WHEN 'n_outliers' THEN CAST(s.n_outliers AS VARCHAR)
                     WHEN 'outlier_ppm' THEN CAST(s.outlier_ppm AS VARCHAR)
                     ELSE CAST(s.max_abs_resid AS VARCHAR) END AS value
FROM ({EVENTS_SEASONAL_RESIDUAL_OUTLIERS_SQL}) s,
     (SELECT unnest(['n_hours','seasonal_mad','n_outliers','outlier_ppm',
                     'max_abs_resid']) AS metric) m
UNION ALL
SELECT 'qdmerge' AS family,
       d.event_type || '/' || CAST(d.q_pct AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n' THEN CAST(d.n AS VARCHAR)
                     WHEN 't' THEN CAST(d.t AS VARCHAR)
                     WHEN 't_a' THEN CAST(d.t_a AS VARCHAR)
                     WHEN 't_b' THEN CAST(d.t_b AS VARCHAR)
                     WHEN 'sketch_nodes' THEN CAST(d.sketch_nodes AS VARCHAR)
                     WHEN 'est_cents' THEN CAST(d.est_cents AS VARCHAR)
                     WHEN 'target' THEN CAST(d.target AS VARCHAR)
                     WHEN 'cnt_lt' THEN CAST(d.cnt_lt AS VARCHAR)
                     WHEN 'cnt_le' THEN CAST(d.cnt_le AS VARCHAR)
                     WHEN 'le_ok' THEN CAST(CAST(d.le_ok AS INT) AS VARCHAR)
                     ELSE CAST(CAST(d.lt_ok AS INT) AS VARCHAR) END AS value
FROM ({EVENTS_QDIGEST_MERGE_SQL}) d,
     (SELECT unnest(['n','t','t_a','t_b','sketch_nodes','est_cents',
                     'target','cnt_lt','cnt_le','le_ok','lt_ok'])
        AS metric) m
UNION ALL
SELECT 'robust' AS family, b.event_type AS k, m.metric,
       CASE m.metric WHEN 'lo_cents' THEN CAST(b.lo_cents AS VARCHAR)
                     WHEN 'hi_cents' THEN CAST(b.hi_cents AS VARCHAR)
                     WHEN 'n' THEN CAST(b.n AS VARCHAR)
                     WHEN 'winsorized_sum'
                       THEN CAST(b.winsorized_sum AS VARCHAR)
                     WHEN 'winsorized_mean_milli'
                       THEN CAST(b.winsorized_mean_milli AS VARCHAR)
                     WHEN 'trimmed_sum' THEN CAST(b.trimmed_sum AS VARCHAR)
                     WHEN 'trimmed_n' THEN CAST(b.trimmed_n AS VARCHAR)
                     ELSE CAST(b.trimmed_mean_milli AS VARCHAR) END AS value
FROM ({EVENTS_ROBUST_MEANS_SQL}) b,
     (SELECT unnest(['lo_cents','hi_cents','n','winsorized_sum',
                     'winsorized_mean_milli','trimmed_sum','trimmed_n',
                     'trimmed_mean_milli']) AS metric) m
UNION ALL
SELECT 'drift' AS family,
       v.event_type || '/' || CAST(v.bucket AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n_first' THEN CAST(v.n_first AS VARCHAR)
                     WHEN 'n_second' THEN CAST(v.n_second AS VARCHAR)
                     WHEN 'share_first_ppm'
                       THEN CAST(v.share_first_ppm AS VARCHAR)
                     WHEN 'share_second_ppm'
                       THEN CAST(v.share_second_ppm AS VARCHAR)
                     ELSE CAST(v.abs_share_diff_ppm AS VARCHAR) END AS value
FROM ({EVENTS_VALUE_DRIFT_SQL}) v,
     (SELECT unnest(['n_first','n_second','share_first_ppm',
                     'share_second_ppm','abs_share_diff_ppm']) AS metric) m
UNION ALL
SELECT 'ab' AS family, w.event_type || '/' || w.arm AS k, m.metric,
       CASE m.metric WHEN 'n' THEN CAST(w.n AS VARCHAR)
                     WHEN 'sum_cents' THEN CAST(w.sum_cents AS VARCHAR)
                     ELSE CAST(w.sumsq_cents AS VARCHAR) END AS value
FROM ({EVENTS_AB_ARM_STATS_SQL}) w,
     (SELECT unnest(['n','sum_cents','sumsq_cents']) AS metric) m
UNION ALL
SELECT 'xcorr' AS family,
       x.type_a || '/' || x.type_b || '/' || CAST(x.lag_h AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n_pairs' THEN CAST(x.n_pairs AS VARCHAR)
                     WHEN 'sum_a' THEN CAST(x.sum_a AS VARCHAR)
                     WHEN 'sum_b' THEN CAST(x.sum_b AS VARCHAR)
                     WHEN 'sum_ab' THEN CAST(x.sum_ab AS VARCHAR)
                     ELSE CAST(x.cov_num AS VARCHAR) END AS value
FROM ({EVENTS_TYPE_XCORR_SQL}) x,
     (SELECT unnest(['n_pairs','sum_a','sum_b','sum_ab','cov_num'])
        AS metric) m
UNION ALL
SELECT 'markov' AS family, t.prev_type || '/' || t.next_type AS k,
       m.metric,
       CASE m.metric WHEN 'n' THEN CAST(t.n AS VARCHAR)
                     WHEN 'row_total' THEN CAST(t.row_total AS VARCHAR)
                     ELSE CAST(t.p_ppm AS VARCHAR) END AS value
FROM ({EVENTS_TYPE_TRANSITION_MATRIX_SQL}) t,
     (SELECT unnest(['n','row_total','p_ppm']) AS metric) m
UNION ALL
SELECT 'ewma' AS family,
       w2.event_type || '/' || CAST(w2.x AS VARCHAR) AS k, m.metric,
       CASE m.metric WHEN 's' THEN CAST(w2.s AS VARCHAR)
                     WHEN 'ewma' THEN CAST(w2.ewma AS VARCHAR)
                     ELSE CAST(w2.resid AS VARCHAR) END AS value
FROM ({EVENTS_EWMA_CONTROL_SQL}) w2,
     (SELECT unnest(['s','ewma','resid']) AS metric) m
UNION ALL
SELECT 'bitmap' AS family, bm.event_type AS k, m.metric,
       CASE m.metric WHEN 'n_users' THEN CAST(bm.n_users AS VARCHAR)
                     WHEN 'or_mask' THEN CAST(bm.or_mask AS VARCHAR)
                     WHEN 'and_mask' THEN CAST(bm.and_mask AS VARCHAR)
                     WHEN 'coverage_days' THEN CAST(bm.coverage_days AS VARCHAR)
                     WHEN 'common_days' THEN CAST(bm.common_days AS VARCHAR)
                     ELSE CAST(bm.sum_user_days AS VARCHAR) END AS value
FROM ({EVENTS_DAY_BITMAP_STATS_SQL}) bm,
     (SELECT unnest(['n_users','or_mask','and_mask','coverage_days',
                     'common_days','sum_user_days']) AS metric) m
UNION ALL
SELECT 'growth' AS family, strftime(g.day, '%Y-%m-%d') AS k, m.metric,
       CASE m.metric WHEN 'n_new' THEN CAST(g.n_new AS VARCHAR)
                     WHEN 'n_retained' THEN CAST(g.n_retained AS VARCHAR)
                     WHEN 'n_resurrected'
                       THEN CAST(g.n_resurrected AS VARCHAR)
                     ELSE CAST(g.n_churned AS VARCHAR) END AS value
FROM ({EVENTS_GROWTH_ACCOUNTING_SQL}) g,
     (SELECT unnest(['n_new','n_retained','n_resurrected','n_churned'])
        AS metric) m
UNION ALL
SELECT 'bagops' AS family, s.op || '/' || CAST(s.user_id AS VARCHAR) AS k,
       'multiplicity' AS metric, CAST(s.multiplicity AS VARCHAR) AS value
FROM ({EVENTS_BAG_SETOPS_SQL}) s
"""


# assigned at module END (the r8 suite references the counter/seasonal SQL
# constants defined further down; see the tail of this file)


# --- events_qdigest_merge: the quantile -STATE/-MERGE proof — build
#     INDEPENDENT q-digests over the month's two halves (day <= 15 vs
#     day > 15, each compressed at its OWN threshold t_half = n_half
#     DIV QD_K), MERGE them (union of node states — internal counts
#     join the pairing at their own level) and re-compress at the
#     combined t = n DIV QD_K, then answer quantiles from the MERGED
#     sketch only. This is the property that makes the sketch a
#     distributed aggregate at 100 TB (per-partition states -Merge
#     like CMS/KMV — the ClickHouse -State/-Merge contract, A7); the
#     KMV gate proved merge LOSSLESS, q-digest's merge is lossy with a
#     BOUNDED error, so the audit pins the combined bound:
#     straddling internal nodes carry <= t_a + t_b (kept from either
#     half) or <= t (absorbed during re-compression), giving
#       lt_ok: cnt_lt <= target - 1 + (QD_BITS+1)*(t_a + t_b + t)
#     while le_ok: cnt_le >= target is exact as in the build gate.
#     Oracle: BOTH half-builds unrolled (17 MATERIALIZED levels each,
#     prefixed a_/b_) + 17 generalized merge levels where original
#     states at each level join the pair decision (s_pair + c_parent
#     <= t) — the canonical q-digest condition, vs the Python
#     mixed-level tree DP.

QD_SPLIT_DAY = 15


def events_qdigest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qdigest_merge_frame(_events_cents(spark, sf_dir))


def qdigest_merge_frame(
    ev_cents: DataFrame, _hist2: DataFrame | None = None
) -> DataFrame:
    """Core -State/-Merge audit over any (event_type, ts, cents) frame —
    factored out so events_series_suite can feed it from its persisted
    corpus scan. r11: ``_hist2`` is a caller-shared (event_type,
    first_half, cents, cnt) histogram — the leaf table becomes a tiny
    clamp re-key and the rank audit a weighted fold, zero corpus scans."""
    import pandas as pd

    cap = (1 << QD_BITS) - 1
    clamp_v = F.greatest(
        F.least(F.col("cents"), F.lit(cap)), F.lit(0)
    ).alias("v")
    if _hist2 is not None:
        leaf = (
            _hist2.select("event_type", "first_half", clamp_v, "cnt")
            .groupBy("event_type", "first_half", "v")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        leaf = (
            ev_cents.select(
                "event_type",
                clamp_v,
                (F.dayofmonth("ts") <= QD_SPLIT_DAY)
                .cast("int")
                .alias("first_half"),
            )
            .groupBy("event_type", "first_half", "v")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        et = pdf["event_type"].iloc[0]
        hists: dict[int, dict[int, int]] = {0: {}, 1: {}}
        for h, v, c in zip(pdf["first_half"], pdf["v"], pdf["cnt"]):
            hists[int(h)][int(v)] = hists[int(h)].get(int(v), 0) + int(c)
        n_a, n_b = sum(hists[1].values()), sum(hists[0].values())
        t_a, t_b = n_a // QD_K, n_b // QD_K
        sk_a = qdigest_compress(hists[1], t_a)
        sk_b = qdigest_compress(hists[0], t_b)
        n = n_a + n_b
        t = n // QD_K
        states: dict[tuple[int, int], int] = {}
        for level, off, c in sk_a + sk_b:
            states[(level, off)] = states.get((level, off), 0) + c
        merged = qdigest_compress_multi(states, t)
        nodes = []
        for level, off, c in merged:
            size = 1 << (QD_BITS - level)
            lo = off * size
            nodes.append((lo + size - 1, -lo, c))
        nodes.sort()
        rows = []
        for q in QD_PCTS:
            target = (n - 1) * q // 100 + 1
            cum = 0
            est = nodes[-1][0]
            for hi, _neg_lo, c in nodes:
                cum += c
                if cum >= target:
                    est = hi
                    break
            rows.append((et, q, n, t, t_a, t_b, len(merged), est, target))
        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "q_pct", "n", "t", "t_a", "t_b",
                "sketch_nodes", "est_cents", "target",
            ],
        )

    est = leaf.groupBy("event_type").applyInPandas(
        kernel,
        "event_type string, q_pct long, n long, t long, t_a long, t_b long, "
        "sketch_nodes long, est_cents long, target long",
    )
    aud = (
        leaf.join(
            F.broadcast(est.select("event_type", "q_pct", "est_cents")),
            "event_type",
        )
        .groupBy("event_type", "q_pct", "est_cents")
        .agg(
            F.sum(
                F.when(F.col("v") < F.col("est_cents"), F.col("cnt")).otherwise(0)
            ).alias("cnt_lt"),
            F.sum(
                F.when(F.col("v") <= F.col("est_cents"), F.col("cnt")).otherwise(0)
            ).alias("cnt_le"),
        )
    )
    return (
        est.join(aud, ["event_type", "q_pct", "est_cents"])
        .select(
            "event_type",
            F.col("q_pct").cast("long").alias("q_pct"),
            F.col("n").cast("long").alias("n"),
            F.col("t").cast("long").alias("t"),
            F.col("t_a").cast("long").alias("t_a"),
            F.col("t_b").cast("long").alias("t_b"),
            F.col("sketch_nodes").cast("long").alias("sketch_nodes"),
            F.col("est_cents").cast("long").alias("est_cents"),
            F.col("target").cast("long").alias("target"),
            F.col("cnt_lt").cast("long").alias("cnt_lt"),
            F.col("cnt_le").cast("long").alias("cnt_le"),
            (F.col("cnt_le") >= F.col("target")).alias("le_ok"),
            (
                F.col("cnt_lt")
                <= F.col("target") - 1
                + F.lit(QD_BITS + 1)
                * (F.col("t_a") + F.col("t_b") + F.col("t"))
            ).alias("lt_ok"),
        )
    )


def _qdigest_build_chain_sql(pfx: str, half_pred: str) -> str:
    """One full half-build: leaf histogram (filtered to one half),
    per-type threshold, 17 unrolled compression levels, sketch union."""
    head = f"""
{pfx}leaf AS MATERIALIZED (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev WHERE {half_pred} GROUP BY 1, 2
),
{pfx}thr AS MATERIALIZED (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt) // {QD_K} AS BIGINT) AS t
  FROM {pfx}leaf GROUP BY 1
),
{pfx}l{QD_BITS} AS MATERIALIZED (
  SELECT event_type, v AS off, cnt FROM {pfx}leaf
),"""
    levels = ",".join(
        _qdigest_level_sql(lv, pfx=pfx) for lv in range(QD_BITS, 0, -1)
    )
    sketch = (
        f",\n{pfx}sketch AS MATERIALIZED (\n  "
        + " UNION ALL ".join(
            f"SELECT * FROM {pfx}k{lv}" for lv in range(QD_BITS, 0, -1)
        )
        + f"\n  UNION ALL SELECT event_type, 0 AS level, off, cnt FROM {pfx}l0\n)"
    )
    return head + levels + sketch


def _qdigest_merge_level_sql(level: int) -> str:
    """One GENERALIZED compression stage for the merge phase: original
    states at level-1 (from either half's sketch) join the pair decision
    — the canonical q-digest condition c_pair + c_parent <= t — and
    untouched originals fall through to the next level."""
    return f"""
m_p{level} AS MATERIALIZED (
  SELECT event_type, off // 2 AS poff, CAST(SUM(cnt) AS BIGINT) AS s
  FROM m_l{level} GROUP BY 1, 2
),
m_k{level} AS (
  SELECT c.event_type, {level} AS level, c.off, c.cnt
  FROM m_l{level} c
  JOIN m_p{level} p ON p.event_type = c.event_type AND p.poff = c.off // 2
  LEFT JOIN (SELECT event_type, off, cnt FROM m_states
             WHERE level = {level - 1}) o
    ON o.event_type = p.event_type AND o.off = p.poff
  JOIN m_thr t ON t.event_type = c.event_type
  WHERE p.s + COALESCE(o.cnt, 0) > t.t
),
m_l{level - 1} AS MATERIALIZED (
  SELECT p.event_type, p.poff AS off,
         CAST(p.s + COALESCE(o.cnt, 0) AS BIGINT) AS cnt
  FROM m_p{level} p
  LEFT JOIN (SELECT event_type, off, cnt FROM m_states
             WHERE level = {level - 1}) o
    ON o.event_type = p.event_type AND o.off = p.poff
  JOIN m_thr t ON t.event_type = p.event_type
  WHERE p.s + COALESCE(o.cnt, 0) <= t.t
  UNION ALL
  SELECT o.event_type, o.off, o.cnt
  FROM (SELECT event_type, off, cnt FROM m_states
        WHERE level = {level - 1}) o
  LEFT JOIN m_p{level} p
    ON p.event_type = o.event_type AND p.poff = o.off
  JOIN m_thr t ON t.event_type = o.event_type
  WHERE p.poff IS NULL OR p.s + o.cnt > t.t
)"""


def _qdigest_merge_sql() -> str:
    merge_levels = ",".join(
        _qdigest_merge_level_sql(lv) for lv in range(QD_BITS, 0, -1)
    )
    merge_sketch = (
        "m_sketch AS MATERIALIZED (\n  "
        + " UNION ALL ".join(
            f"SELECT * FROM m_k{lv}" for lv in range(QD_BITS, 0, -1)
        )
        + "\n  UNION ALL SELECT event_type, 0 AS level, off, cnt FROM m_l0\n)"
    )
    return f"""
WITH ev AS (
  SELECT event_type,
         GREATEST(LEAST({_CENTS}, {(1 << QD_BITS) - 1}), 0) AS v,
         CASE WHEN day(CAST(ts AS TIMESTAMP)) <= {QD_SPLIT_DAY}
              THEN 1 ELSE 0 END AS fh
  FROM events
),{_qdigest_build_chain_sql("a_", "fh = 1")},{_qdigest_build_chain_sql("b_", "fh = 0")},
m_states AS MATERIALIZED (
  SELECT event_type, level, off, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM (SELECT * FROM a_sketch UNION ALL SELECT * FROM b_sketch)
  GROUP BY 1, 2, 3
),
m_thr AS MATERIALIZED (
  SELECT COALESCE(a.event_type, b.event_type) AS event_type,
         CAST(COALESCE(a.n, 0) + COALESCE(b.n, 0) AS BIGINT) AS n,
         CAST((COALESCE(a.n, 0) + COALESCE(b.n, 0)) // {QD_K} AS BIGINT) AS t,
         CAST(COALESCE(a.t, 0) AS BIGINT) AS t_a,
         CAST(COALESCE(b.t, 0) AS BIGINT) AS t_b
  FROM a_thr a FULL JOIN b_thr b ON b.event_type = a.event_type
),
m_l{QD_BITS} AS MATERIALIZED (
  SELECT event_type, off, cnt FROM m_states WHERE level = {QD_BITS}
),{merge_levels},
{merge_sketch},
nodes AS (
  SELECT event_type, cnt,
         off * (CAST(1 AS BIGINT) << ({QD_BITS} - level))
           + (CAST(1 AS BIGINT) << ({QD_BITS} - level)) - 1 AS hi,
         off * (CAST(1 AS BIGINT) << ({QD_BITS} - level)) AS lo
  FROM m_sketch
),
sksize AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sketch_nodes
  FROM m_sketch GROUP BY 1
),
cums AS (
  SELECT event_type, hi, lo, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY hi, lo DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM nodes
),
targets AS (
  SELECT t.event_type, q.q_pct, t.n, t.t, t.t_a, t.t_b,
         CAST((t.n - 1) * q.q_pct // 100 + 1 AS BIGINT) AS target
  FROM m_thr t
  CROSS JOIN (SELECT unnest(ARRAY{list(QD_PCTS)}) AS q_pct) q
),
est AS (
  SELECT g.event_type, CAST(g.q_pct AS BIGINT) AS q_pct, g.n, g.t,
         g.t_a, g.t_b, g.target,
         CAST(MIN(c.hi) AS BIGINT) AS est_cents
  FROM targets g
  JOIN cums c ON c.event_type = g.event_type AND c.cum >= g.target
  GROUP BY 1, 2, 3, 4, 5, 6, 7
),
aud AS (
  SELECT e.event_type, e.q_pct,
         CAST(SUM(CASE WHEN v.v < e.est_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_lt,
         CAST(SUM(CASE WHEN v.v <= e.est_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_le
  FROM est e JOIN ev v ON v.event_type = e.event_type
  GROUP BY 1, 2
)
SELECT e.event_type, e.q_pct, e.n, e.t, e.t_a, e.t_b, s.sketch_nodes,
       e.est_cents, e.target, a.cnt_lt, a.cnt_le,
       a.cnt_le >= e.target AS le_ok,
       a.cnt_lt <= e.target - 1 + {QD_BITS + 1} * (e.t_a + e.t_b + e.t)
         AS lt_ok
FROM est e
JOIN sksize s ON s.event_type = e.event_type
JOIN aud a ON a.event_type = e.event_type AND a.q_pct = e.q_pct
"""


EVENTS_QDIGEST_MERGE_SQL = _qdigest_merge_sql()


# --- events_hourly_crosscov: CROSS-SERIES covariance — the off-diagonal
#     of the correlation matrix events_hourly_autocov computes the
#     diagonal of (dashboards correlate metric pairs: do purchases move
#     with views?). For every UNORDERED type pair (a < b), over hours
#     where BOTH series have mass (the same sparse-equi-join-pairing vs
#     dense-spine-LAG differential as the autocov gate, applied across
#     series instead of across time): exact DECIMAL(38) covariance
#     numerator n*Σxy - Σx*Σy plus the raw sums. The hourly frame is
#     calendar-bounded; the pair join fans out by |type enum|, not by
#     rows. Oracle: dense calendar spine + self-join on the spine hour.


def events_hourly_crosscov(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly_frame(_events_cents(spark, sf_dir)).persist()
    a = hourly.select(
        F.col("event_type").alias("type_a"), "x", F.col("s").alias("sa")
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"), "x", F.col("s").alias("sb")
    )
    pairs = a.join(b, "x").filter(F.col("type_a") < F.col("type_b"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("sa").alias("sum_a"),
            F.sum("sb").alias("sum_b"),
            F.sum(F.col("sa").cast("decimal(38,0)") * F.col("sb")).alias(
                "sum_ab"
            ),
        )
        .select(
            "type_a",
            "type_b",
            F.col("n_hours").cast("long").alias("n_hours"),
            F.col("sum_a").cast("long").alias("sum_a"),
            F.col("sum_b").cast("long").alias("sum_b"),
            F.col("sum_ab").cast("decimal(38,0)").alias("sum_ab"),
            F.expr(
                "CAST(CAST(n_hours AS DECIMAL(38,0)) * sum_ab "
                "- CAST(sum_a AS DECIMAL(38,0)) * sum_b AS DECIMAL(38,0))"
            ).alias("cov_num"),
        )
    )


EVENTS_HOURLY_CROSSCOV_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         {_CENTS} AS cents
  FROM events
),
hourly AS MATERIALIZED (
  SELECT event_type, x, CAST(SUM(cents) AS BIGINT) AS s
  FROM ev GROUP BY 1, 2
),
spine AS (
  SELECT unnest(generate_series((SELECT MIN(x) FROM hourly),
                                (SELECT MAX(x) FROM hourly))) AS x
),
dense AS MATERIALIZED (
  SELECT t.event_type, sp.x, h.s
  FROM spine sp
  CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
  LEFT JOIN hourly h ON h.event_type = t.event_type AND h.x = sp.x
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(a.s) AS BIGINT) AS sum_a,
       CAST(SUM(b.s) AS BIGINT) AS sum_b,
       CAST(SUM(CAST(a.s AS HUGEINT) * b.s) AS DECIMAL(38,0)) AS sum_ab,
       CAST(COUNT(*) * SUM(CAST(a.s AS HUGEINT) * b.s)
            - CAST(SUM(a.s) AS HUGEINT) * SUM(b.s) AS DECIMAL(38,0))
         AS cov_num
FROM dense a
JOIN dense b ON b.x = a.x AND a.event_type < b.event_type
WHERE a.s IS NOT NULL AND b.s IS NOT NULL
GROUP BY 1, 2
"""


# --- streaming_qdigest_state: the q-digest as STREAMING STATE — a REAL
#     applyInPandasWithState query (streaming/stateful.py::qdigest_stream)
#     over a 3-chunk file source accumulates the per-type leaf histogram
#     across microbatches and emits refreshed quantile estimates each
#     batch. The sketch is a pure function of the histogram, so the
#     FINAL streamed estimates must equal the batch gate's — the oracle
#     is the batch q-digest SQL minus its audit columns (the same
#     streaming==batch contract streaming_positions_state uses). Chunk
#     staging follows the hardened mtime-forced pid-scoped discipline;
#     chunk order is immaterial here (histograms are order-free) but
#     kept deterministic anyway.


def streaming_qdigest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import hashlib
    import os
    import shutil

    from ..streaming.stateful import qdigest_stream

    cap = (1 << QD_BITS) - 1
    inp = _events_cents(spark, sf_dir).select(
        "event_type",
        F.greatest(F.least(F.col("cents"), F.lit(cap)), F.lit(0)).alias("v"),
        "event_id",
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12] + f"_{os.getpid()}"
    prune_stale_staging("nmci_stream_qd_")
    src = f"/tmp/nmci_stream_qd_src_{tag}"
    ckpt = f"/tmp/nmci_stream_qd_ckpt_{tag}"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(src)
    bounds = inp.approxQuantile("event_id", [0.33, 0.66], 0.0)
    chunks = [
        inp.filter(F.col("event_id") <= bounds[0]),
        inp.filter(
            (F.col("event_id") > bounds[0]) & (F.col("event_id") <= bounds[1])
        ),
        inp.filter(F.col("event_id") > bounds[1]),
    ]
    t_base = 1_700_000_000  # fixed epoch base — wall clock never read
    for i, c in enumerate(chunks):
        stage = f"{src}.stage{i}"
        c.select("event_type", "v").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"chunk-{i:03d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t_base + i, t_base + i))
        shutil.rmtree(stage, ignore_errors=True)

    stream = (
        spark.readStream.schema("event_type string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"qdigest_state_{tag}"
    # state-store partition scoping: the streaming_positions_state
    # doctrine (a plain session's 200 shuffle partitions would spawn 600
    # near-empty state tasks for 3 batches of 5 keys)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            qdigest_stream(stream, ckpt)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # a timeout would otherwise read a partially-folded
            # state and surface as a confusing hash mismatch
            raise RuntimeError(
                f"stream {name} did not terminate within 300s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # update-mode memory sink appends every per-batch emission; the row
    # with the highest n per (type, quantile) is the final state
    return (
        spark.table(name)
        .groupBy("event_type", "q_pct")
        .agg(
            F.max("n").alias("n"),
            F.max_by("t", "n").alias("t"),
            F.max_by("sketch_nodes", "n").alias("sketch_nodes"),
            F.max_by("est_cents", "n").alias("est_cents"),
            F.max_by("target", "n").alias("target"),
        )
        .select(
            "event_type",
            F.col("q_pct").cast("long").alias("q_pct"),
            F.col("n").cast("long").alias("n"),
            F.col("t").cast("long").alias("t"),
            F.col("sketch_nodes").cast("long").alias("sketch_nodes"),
            F.col("est_cents").cast("long").alias("est_cents"),
            F.col("target").cast("long").alias("target"),
        )
    )


STREAMING_QDIGEST_STATE_SQL = f"""
SELECT event_type, q_pct, n, t, sketch_nodes, est_cents, target
FROM ({EVENTS_QDIGEST_QUANTILES_SQL})
"""


# --- events_counter_delta_sum: COUNTER-RESET semantics (ClickHouse
#     deltaSum / deltaSumTimestamp; Prometheus counter rate()) — the
#     monitoring primitive for a monotone counter that periodically
#     WRAPS (SNMP 32-bit octet counters; Prometheus counter resets). A
#     deterministic wrapping counter is derived from the stream itself:
#     per type, the running cents total MOD CTR_MODULUS in
#     (ts, event_id) order — every modulus crossing drops the value,
#     exactly a uint-overflow wrap. Per type, BOTH industry semantics:
#       increase_wrapped   = wrap-corrected true increase (each negative
#                            delta is a wrap of exactly -M, so the real
#                            step is diff + M) — Spark computes this by
#                            the CLOSED FORM c_last + n_resets * M (no
#                            per-row max), the oracle by the literal
#                            per-row fold Σ (diff>=0 ? diff : diff+M)
#                            seeded with c_first; their agreement is the
#                            Lindley-doctrine closed-form == automaton
#                            proof for counter wraps
#       delta_sum_conserv  = ClickHouse deltaSum (negative deltas
#                            DROPPED — the safe choice when wraps are
#                            not modular) — per-row in both engines.
#     All integer; one lag window per type.

CTR_MODULUS = 1_000_000  # cents; ~10 wraps/type at sf0.01, ~1 at sf0.001


def events_counter_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return counter_delta_frame(_events_cents(spark, sf_dir))


def counter_delta_frame(ev: DataFrame) -> DataFrame:
    """Core wrap-corrected counter fold over any (event_type, ts,
    event_id, cents) frame — factored out for events_series_suite."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctr = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.sum("cents").over(w) % CTR_MODULUS).alias("c"),
    )
    wl = Window.partitionBy("event_type").orderBy("ts", "event_id")
    flagged = ctr.select(
        "event_type",
        "c",
        (F.col("c") - F.lag("c").over(wl)).alias("diff"),
        F.when(
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            )
            == 1,
            F.col("c"),
        )
        .otherwise(F.lit(0))
        .alias("last_c"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("diff") < 0, 1).otherwise(0)
            ).alias("n_resets"),
            F.max("last_c").alias("last_c"),
            F.sum(
                F.when(F.col("diff").isNull(), F.col("c"))
                .when(F.col("diff") > 0, F.col("diff"))
                .otherwise(F.lit(0))
            ).alias("delta_sum_conserv"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("n_resets").cast("long").alias("n_resets"),
            F.col("last_c").cast("long").alias("last_c"),
            # closed form: every wrap contributes exactly CTR_MODULUS
            (F.col("last_c") + F.col("n_resets") * F.lit(CTR_MODULUS))
            .cast("long")
            .alias("increase_wrapped"),
            F.col("delta_sum_conserv").cast("long").alias(
                "delta_sum_conserv"
            ),
        )
    )


EVENTS_COUNTER_DELTA_SUM_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         {_CENTS} AS cents
  FROM events
),
ctr AS MATERIALIZED (
  SELECT event_type, ts, event_id,
         SUM(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           % {CTR_MODULUS} AS c
  FROM ev
),
d AS (
  SELECT event_type, c,
         c - LAG(c) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS diff,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM ctr
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       CAST(MAX(CASE WHEN rn_last = 1 THEN c ELSE 0 END) AS BIGINT) AS last_c,
       -- the literal per-row wrap-corrected fold (vs Spark's closed form)
       CAST(SUM(CASE WHEN diff IS NULL THEN c
                     WHEN diff >= 0 THEN diff
                     ELSE diff + {CTR_MODULUS} END) AS BIGINT)
         AS increase_wrapped,
       -- ClickHouse deltaSum: negative deltas dropped
       CAST(SUM(CASE WHEN diff IS NULL THEN c
                     WHEN diff > 0 THEN diff ELSE 0 END) AS BIGINT)
         AS delta_sum_conserv
FROM d
GROUP BY event_type
"""


# --- events_seasonal_residual_outliers: SEASONALLY-ADJUSTED anomaly
#     detection — the STL-lite composition every ops dashboard needs and
#     the shape plain median/MAD (events_value_mad_outliers) misses: a
#     3am spike can be perfectly normal FOR 3PM volume and still be a
#     10x anomaly for 3AM. Pipeline, all exact integers:
#       1. hourly volume series per type (the shared _hourly_frame);
#       2. seasonal baseline = nearest-rank MEDIAN per (type,
#          hour-of-day) — 24 x |types| partitions, each calendar-bounded;
#       3. residual = s - seasonal_median;
#       4. robust scale = nearest-rank median of |residual| per type
#          (the MAD of the DESEASONALIZED series);
#       5. outlier: |residual| > 3*mad + 1 (the integer MAD rule).
#     Emits per type: n_hours, seasonal MAD, outlier count/ppm, and the
#     worst residual magnitude — aggregate output, so the gate stays
#     tiny while pinning every stage. At 100 TB: the series is
#     calendar-bounded, every window partition is (type[, hour-of-day]),
#     no global state. Oracle: identical definition through DuckDB
#     windows (the nr_med rank = ceil(k/2) convention both engines
#     share, cusum precedent).


def events_seasonal_residual_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    n_par = spark.sparkContext.defaultParallelism
    # persist + repartition: the hourly series feeds the seasonal-median
    # pass AND the residual join (two consumers), and the windows over
    # the calendar-bounded frame should not pay the plain session's 200
    # partitions (the cusum-gate doctrine)
    hourly = (
        _hourly_frame(_events_cents(spark, sf_dir))
        .withColumn("hod", F.col("x") % 24)
        .repartition(n_par, "event_type")
        .persist()
    )
    return seasonal_residual_frame(hourly)


def seasonal_residual_frame(hourly: DataFrame) -> DataFrame:
    """Core STL-lite path over a (persisted) hourly (event_type, x, s,
    hod) frame — factored out for events_series_suite."""
    w_med = Window.partitionBy("event_type", "hod").orderBy("s", "x")
    w_cnt = Window.partitionBy("event_type", "hod")
    med = (
        hourly.withColumn("vr", F.row_number().over(w_med))
        .withColumn("k", F.count(F.lit(1)).over(w_cnt))
        .filter(F.col("vr") == F.expr("CAST(ceil(k / 2) AS BIGINT)"))
        .select("event_type", "hod", F.col("s").alias("med"))
    )
    resid = hourly.join(med, ["event_type", "hod"]).select(
        "event_type",
        "x",
        (F.col("s") - F.col("med")).alias("r"),
        F.abs(F.col("s") - F.col("med")).alias("ar"),
    )
    w_mad = Window.partitionBy("event_type").orderBy("ar", "x")
    w_tcnt = Window.partitionBy("event_type")
    mad = (
        resid.withColumn("vr", F.row_number().over(w_mad))
        .withColumn("k", F.count(F.lit(1)).over(w_tcnt))
        .filter(F.col("vr") == F.expr("CAST(ceil(k / 2) AS BIGINT)"))
        .select("event_type", F.col("ar").alias("mad"))
    )
    return (
        resid.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(
                (F.col("ar") > F.lit(3) * F.col("mad") + 1).cast("long")
            ).alias("n_outliers"),
            F.max("ar").alias("max_abs_resid"),
        )
        .select(
            "event_type",
            F.col("n_hours").cast("long").alias("n_hours"),
            F.col("mad").cast("long").alias("seasonal_mad"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
            F.expr("n_outliers * 1000000 DIV n_hours").alias("outlier_ppm"),
            F.col("max_abs_resid").cast("long").alias("max_abs_resid"),
        )
    )


EVENTS_SEASONAL_RESIDUAL_OUTLIERS_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         {_CENTS} AS cents
  FROM events
),
hourly AS MATERIALIZED (
  SELECT event_type, x, x % 24 AS hod, CAST(SUM(cents) AS BIGINT) AS s
  FROM ev GROUP BY 1, 2
),
med AS MATERIALIZED (
  SELECT event_type, hod, s AS med FROM (
    SELECT event_type, hod, s,
           ROW_NUMBER() OVER (PARTITION BY event_type, hod
                              ORDER BY s, x) AS vr,
           COUNT(*) OVER (PARTITION BY event_type, hod) AS k
    FROM hourly
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
),
resid AS MATERIALIZED (
  SELECT h.event_type, h.x, h.s - m.med AS r, abs(h.s - m.med) AS ar
  FROM hourly h JOIN med m ON m.event_type = h.event_type AND m.hod = h.hod
),
mad AS (
  SELECT event_type, ar AS mad FROM (
    SELECT event_type, ar,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ar, x) AS vr,
           COUNT(*) OVER (PARTITION BY event_type) AS k
    FROM resid
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
)
SELECT r.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(m.mad AS BIGINT) AS seasonal_mad,
       CAST(SUM(CASE WHEN r.ar > 3 * m.mad + 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(SUM(CASE WHEN r.ar > 3 * m.mad + 1 THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS outlier_ppm,
       CAST(MAX(r.ar) AS BIGINT) AS max_abs_resid
FROM resid r JOIN mad m ON m.event_type = r.event_type
GROUP BY 1, 3
"""


# --- user_rfm_segments: RFM SEGMENTATION — the classic marketing/
#     retention cube (recency × frequency × monetary quintiles;
#     reference analog: the leaderboard + wallet-activity endpoints rank
#     on exactly these axes). Per user: recency_days (injected anchor −
#     last active day), frequency (event count), monetary (cents sum).
#     Segmentation is by VALUE THRESHOLDS — the p20/p40/p60/p80
#     order-statistic values of each axis, computed by the
#     quantile_select_frame two-level histogram selection (NO global
#     sort, NO global ntile window: a global NTILE over the user
#     dimension single-partitions an unbounded axis at 100 TB; value
#     thresholds are 12 broadcast scalars instead, and equal metric
#     values land in the same segment deterministically). The three
#     axes ride ONE selection pass as an unpivoted (axis, value) frame.
#     seg = 1 + Σ (value > threshold_k); output = the 5x5x5 cube with
#     user counts + exact cents. Oracle: the same threshold VALUES via
#     the literal full-sort ROW_NUMBER rank-k pick (the
#     events_quantile_select differential applied three axes at once),
#     then the identical assignment.

RFM_PCTS = (20, 40, 60, 80)


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # standalone form runs pinned + eager and releases its persists
    # (r11 verdict task 8: this tail entry paid the plain session's 200
    # near-empty shuffle tasks per groupBy AND leaked per_user/bounds
    # across the rest of a 247-entry sim)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    caches: list = []
    try:
        per_user = _per_user_rfm(_events_cents(spark, sf_dir)).persist()
        caches.append(per_user)
        out = rfm_segments_frame(
            per_user, _cache_out=caches
        ).localCheckpoint(eager=True)
        return out
    finally:
        # release in finally: an exception anywhere above must not leak
        # the persisted frames for the rest of the session (r14 verdict 3)
        for df in caches:
            df.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _per_user_rfm(ev: DataFrame) -> DataFrame:
    """Per-user (recency_days, frequency, monetary) — the ONE subtree the
    whole segmentation family shares (rfm cube, Pareto concentration;
    callers persist: it feeds both the threshold and assignment passes)."""
    return ev.groupBy("user_id").agg(
        F.datediff(
            F.lit(DECAY_ANCHOR).cast("date"), F.max(F.to_date("ts"))
        ).cast("long").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("cents").alias("monetary"),
    )


def rfm_segments_frame(
    per_user: DataFrame, _cache_out: list | None = None
) -> DataFrame:
    """Core path over a (persisted) per-user RFM frame — factored out so
    user_segmentation_suite can feed it from the shared subtree.
    ``_cache_out`` collects the bounds persist for caller release."""
    axes = per_user.selectExpr(
        "stack(3, 'r', recency_days, 'f', frequency, 'm', monetary)"
        " AS (event_type, cents)"
    )
    bounds = (
        quantile_select_frame(axes, pcts=RFM_PCTS)
        .select("event_type", "q_pct", "value_cents")
        .persist()
    )
    if _cache_out is not None:
        _cache_out.append(bounds)

    # ONE crossJoin with all 12 broadcast threshold rows + ONE groupBy
    # computes every axis segment in a single pass (r13: the previous
    # per-axis crossJoin + 3-way user_id join chain paid ~6 extra
    # shuffles for identical values — verified equal at sf0.1);
    # seg = 1 + #own-axis thresholds strictly below me, monetary is a
    # per-user constant carried with max()
    b_all = bounds.select(
        F.col("event_type").alias("ax"),
        F.col("value_cents").alias("thr"),
    )
    cube = (
        per_user.crossJoin(F.broadcast(b_all))
        .groupBy("user_id")
        .agg(
            F.max("monetary").alias("monetary"),
            *[
                (
                    F.lit(1)
                    + F.sum(
                        (
                            (F.col("ax") == axis)
                            & (F.col(col) > F.col("thr"))
                        ).cast("long")
                    )
                ).alias(f"{axis}_seg")
                for axis, col in (
                    ("r", "recency_days"),
                    ("f", "frequency"),
                    ("m", "monetary"),
                )
            ],
        )
    )
    return (
        cube.groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("monetary").alias("sum_cents"),
        )
        .select(
            F.col("r_seg").cast("long").alias("r_seg"),
            F.col("f_seg").cast("long").alias("f_seg"),
            F.col("m_seg").cast("long").alias("m_seg"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
        )
    )


def _rfm_bound_sql(metric: str, axis: str) -> str:
    """Literal full-sort rank-k thresholds for one axis (the
    events_quantile_select oracle convention: k = (n-1)*q DIV 100 + 1)."""
    return f"""
SELECT '{axis}' AS axis, q.q_pct,
       MAX(CASE WHEN rk = (q.n - 1) * q.q_pct // 100 + 1 THEN v END)
         AS thr
FROM (
  SELECT {metric} AS v,
         ROW_NUMBER() OVER (ORDER BY {metric}) AS rk,
         COUNT(*) OVER () AS n
  FROM per_user
) s
CROSS JOIN (SELECT unnest(ARRAY{list(RFM_PCTS)}) AS q_pct,
                   (SELECT COUNT(*) FROM per_user) AS n) q
GROUP BY 1, 2
"""


USER_RFM_SEGMENTS_SQL = f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         CAST(date_diff('day', MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)),
                   DATE '{DECAY_ANCHOR}') AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM({_CENTS}) AS BIGINT) AS monetary
  FROM events GROUP BY user_id
),
bounds AS MATERIALIZED (
  {_rfm_bound_sql("recency_days", "r")}
  UNION ALL
  {_rfm_bound_sql("frequency", "f")}
  UNION ALL
  {_rfm_bound_sql("monetary", "m")}
),
segs AS (
  SELECT p.user_id, p.monetary,
         1 + SUM(CASE WHEN b.axis = 'r' AND p.recency_days > b.thr
                      THEN 1 ELSE 0 END) AS r_seg,
         1 + SUM(CASE WHEN b.axis = 'f' AND p.frequency > b.thr
                      THEN 1 ELSE 0 END) AS f_seg,
         1 + SUM(CASE WHEN b.axis = 'm' AND p.monetary > b.thr
                      THEN 1 ELSE 0 END) AS m_seg
  FROM per_user p CROSS JOIN bounds b
  GROUP BY 1, 2
)
SELECT CAST(r_seg AS BIGINT) AS r_seg,
       CAST(f_seg AS BIGINT) AS f_seg,
       CAST(m_seg AS BIGINT) AS m_seg,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(monetary) AS BIGINT) AS sum_cents
FROM segs
GROUP BY 1, 2, 3
"""

# --- cohort_ltv_curves: COHORT LTV — the monetization companion to
#     events_retention_cohorts (that gate counts active users; this one
#     accumulates VALUE): users are cohorted by first-activity ISO week,
#     and each cohort's cumulative cents through week offset k is the
#     lifetime-value curve product teams plot (reference analog: the
#     profit-leaders views accumulate realized value per wallet over
#     time). All exact integers: per (cohort_week, week_offset) cents
#     sums, a running cumulative sum along the offset axis
#     (calendar-bounded partition), and ltv_ppm = cum*1e6 DIV
#     cohort_total — the normalized curve. Timestamps stay NTZ with
#     calendar arithmetic (no epoch), per the timezone-proof rule.
#     At 100 TB: one user-cohort map join + one calendar-bounded window.
#     Oracle: the same cohorting via a correlated MIN() subquery and the
#     cumulative via a self-join range aggregation (Σ over offsets <= k)
#     — no window function, a genuinely different formulation.


def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ltv_curves_frame(_events_cents(spark, sf_dir))


def ltv_curves_frame(ev_cents: DataFrame) -> DataFrame:
    """Core path over any (user_id, ts, cents) frame — factored out so
    user_segmentation_suite can feed it from the shared persisted scan."""
    ev = ev_cents.select("user_id", F.to_date("ts").alias("d"), "cents")
    first_day = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    cohorted = ev.join(first_day, "user_id").select(
        F.weekofyear("d0").alias("cohort_week"),
        (
            F.datediff(F.date_trunc("week", "d"), F.date_trunc("week", "d0"))
            / 7
        ).cast("long").alias("week_offset"),
        "cents",
    )
    cells = cohorted.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").alias("week_cents")
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("cohort_week")
    return (
        cells.withColumn("cum_cents", F.sum("week_cents").over(w_cum))
        .withColumn("total", F.sum("week_cents").over(w_tot))
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("week_cents").cast("long").alias("week_cents"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.expr("cum_cents * 1000000 DIV total").alias("ltv_ppm"),
        )
    )


COHORT_LTV_CURVES_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         {_CENTS} AS cents
  FROM events
),
first_day AS MATERIALIZED (
  SELECT user_id, MIN(d) AS d0 FROM ev GROUP BY user_id
),
cells AS MATERIALIZED (
  SELECT weekofyear(f.d0) AS cohort_week,
         date_diff('week', date_trunc('week', f.d0),
                   date_trunc('week', e.d)) AS week_offset,
         CAST(SUM(e.cents) AS BIGINT) AS week_cents
  FROM ev e JOIN first_day f ON f.user_id = e.user_id
  GROUP BY 1, 2
)
SELECT CAST(a.cohort_week AS BIGINT) AS cohort_week,
       CAST(a.week_offset AS BIGINT) AS week_offset,
       a.week_cents,
       CAST(SUM(b.week_cents) AS BIGINT) AS cum_cents,
       CAST(SUM(b.week_cents) * 1000000
            // (SELECT SUM(c.week_cents) FROM cells c
                WHERE c.cohort_week = a.cohort_week) AS BIGINT) AS ltv_ppm
FROM cells a
JOIN cells b
  ON b.cohort_week = a.cohort_week AND b.week_offset <= a.week_offset
GROUP BY a.cohort_week, a.week_offset, a.week_cents
"""


# --- user_volume_concentration: PARETO / WHALE-CONCENTRATION curve —
#     "what share of volume do the top X% of users carry?" (the 80/20
#     diagnostic; reference analog: the profit-leaders views exist
#     because market volume concentrates in whales). For each decile
#     threshold of the per-user monetary distribution (p10..p90 values
#     from the two-level histogram selection — broadcast scalars, no
#     global sort), emit: users at-or-above the threshold, their share
#     of total volume in exact ppm, and the threshold itself. Equal
#     values sit on one side of each cut deterministically (> thr), so
#     the curve is partitioning-invariant. Oracle: thresholds via the
#     literal full-sort rank-k pick + identical conditional aggregation.

PARETO_PCTS = (10, 20, 30, 40, 50, 60, 70, 80, 90)


def user_volume_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    per_user = (
        ev.groupBy("user_id")
        .agg(F.sum("cents").alias("monetary"))
        .persist()  # feeds the threshold pass AND the share aggregation
    )
    return volume_concentration_frame(per_user)


def volume_concentration_frame(per_user: DataFrame) -> DataFrame:
    """Core path over any (persisted) per-user frame with a ``monetary``
    column — factored out for user_segmentation_suite subtree sharing."""
    bounds = quantile_select_frame(
        per_user.selectExpr("'m' AS event_type", "monetary AS cents"),
        pcts=PARETO_PCTS,
    ).select(F.col("q_pct").alias("pct"), F.col("value_cents").alias("thr"))
    return (
        per_user.crossJoin(F.broadcast(bounds))
        .groupBy("pct", "thr")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("monetary") > F.col("thr")).cast("long")).alias(
                "users_above"
            ),
            F.sum("monetary").alias("total_cents"),
            F.sum(
                F.when(F.col("monetary") > F.col("thr"), F.col("monetary"))
                .otherwise(F.lit(0))
            ).alias("cents_above"),
        )
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("thr").cast("long").alias("thr_cents"),
            F.col("users_above").cast("long").alias("users_above"),
            F.expr("users_above * 1000000 DIV n_total").alias(
                "users_above_ppm"
            ),
            F.expr("cents_above * 1000000 DIV total_cents").alias(
                "volume_share_ppm"
            ),
        )
    )


USER_VOLUME_CONCENTRATION_SQL = f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id, CAST(SUM({_CENTS}) AS BIGINT) AS monetary
  FROM events GROUP BY user_id
),
bounds AS MATERIALIZED (
  SELECT q.q_pct AS pct,
         MAX(CASE WHEN rk = (q.n - 1) * q.q_pct // 100 + 1 THEN v END)
           AS thr
  FROM (
    SELECT monetary AS v,
           ROW_NUMBER() OVER (ORDER BY monetary) AS rk,
           COUNT(*) OVER () AS n
    FROM per_user
  ) s
  CROSS JOIN (SELECT unnest(ARRAY{list(PARETO_PCTS)}) AS q_pct,
                     (SELECT COUNT(*) FROM per_user) AS n) q
  GROUP BY 1
)
SELECT CAST(b.pct AS BIGINT) AS pct,
       CAST(b.thr AS BIGINT) AS thr_cents,
       CAST(SUM(CASE WHEN p.monetary > b.thr THEN 1 ELSE 0 END) AS BIGINT)
         AS users_above,
       CAST(SUM(CASE WHEN p.monetary > b.thr THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS users_above_ppm,
       CAST(SUM(CASE WHEN p.monetary > b.thr THEN p.monetary ELSE 0 END)
            * 1000000 // SUM(p.monetary) AS BIGINT) AS volume_share_ppm
FROM per_user p CROSS JOIN bounds b
GROUP BY 1, 2
"""


# --- user_segmentation_suite: the r8 fused gate for the segmentation/
#     cohort trio (r7 verdict task 2) — rfm cube + cohort LTV curves +
#     Pareto whale concentration, executed VERBATIM via their factored
#     frame cores (rfm_segments_frame / ltv_curves_frame /
#     volume_concentration_frame; strict-superset swap rule) from SHARED
#     persisted subtrees: ONE corpus scan (_events_cents) feeds all three
#     paths, ONE per-user RFM frame feeds both the rfm cube and the
#     Pareto thresholds (the r7 fused-audit lesson: label every path off
#     one persisted candidate subtree). Output is the labeled
#     (family, k, metric, value) shape with an all-STRING value column —
#     exact, every metric is BIGINT by construction.

def user_segmentation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same conf-pin scope as events_series_suite (six-branch eager union)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        return _segmentation_suite_body(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _segmentation_suite_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15: eager checkpoints, not persist+count — materialization before
    # the six-branch fan-out is unchanged (r10 cold-race rule), but over
    # checkpointed leaves AQE keeps coalescing the ~100 near-empty ladder
    # stage reads that an InMemoryRelation boundary would pin at cache
    # partition width (4x job-sum cut measured at bench shape)
    ev = _events_cents(spark, sf_dir).localCheckpoint(eager=True)
    per_user = _per_user_rfm(ev).localCheckpoint(eager=True)
    # r13: everything past the materialized per-user frame is
    # ladder/threshold work whose level tables are domain-bounded tiny —
    # the quantile ladders' ~15 near-empty shuffle stages pay per-task
    # overhead at width 32 (measured 2.1s vs 4.0s warm for one ladder).
    # Narrow the pool's plan width RELATIVELY (n_par//4, floor 8): the
    # value-grain locate pass still scales with users, so a literal
    # width would bottleneck a 1000-executor cluster; n_par//4 keeps it
    # proportional while killing the local task storms. Single-threaded
    # set; the outer finally restores.
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(8, spark.sparkContext.defaultParallelism // 4)),
    )
    released: list = []
    thunks: dict = {}
    thunks["rfm"] = lambda: rfm_segments_frame(
        per_user, _cache_out=released
    ).selectExpr(
        "'rfm' AS family",
        "CAST(r_seg AS STRING) || '/' || CAST(f_seg AS STRING) || '/' ||"
        " CAST(m_seg AS STRING) AS k",
        "stack(2, 'n_users', CAST(n_users AS STRING),"
        " 'sum_cents', CAST(sum_cents AS STRING)) AS (metric, value)",
    )
    thunks["ltv"] = lambda: ltv_curves_frame(ev).selectExpr(
        "'ltv' AS family",
        "CAST(cohort_week AS STRING) || '/' || CAST(week_offset AS STRING)"
        " AS k",
        "stack(3, 'week_cents', CAST(week_cents AS STRING),"
        " 'cum_cents', CAST(cum_cents AS STRING),"
        " 'ltv_ppm', CAST(ltv_ppm AS STRING)) AS (metric, value)",
    )
    thunks["par"] = lambda: volume_concentration_frame(per_user).selectExpr(
        "'pareto' AS family",
        "CAST(pct AS STRING) AS k",
        "stack(4, 'thr_cents', CAST(thr_cents AS STRING),"
        " 'users_above', CAST(users_above AS STRING),"
        " 'users_above_ppm', CAST(users_above_ppm AS STRING),"
        " 'volume_share_ppm', CAST(volume_share_ppm AS STRING))"
        " AS (metric, value)",
    )
    # r8 growth: the two other per-user monetary analytics ride the same
    # persisted scan — max drawdown (running-cummax fold vs the oracle's
    # quadratic pair definition) and linear multi-touch attribution
    # (credit-conserving DIV-k shares); both all-BIGINT
    thunks["mdd"] = lambda: max_drawdown_frame(ev).selectExpr(
        "'mdd' AS family",
        "CAST(user_id AS STRING) AS k",
        "stack(5, 'n_events', CAST(n_events AS STRING),"
        " 'peak_cents', CAST(peak_cents AS STRING),"
        " 'final_cents', CAST(final_cents AS STRING),"
        " 'max_drawdown_cents', CAST(max_drawdown_cents AS STRING),"
        " 'underwater_events', CAST(underwater_events AS STRING))"
        " AS (metric, value)",
    )
    thunks["att"] = lambda: attribution_frame(ev).selectExpr(
        "'attr' AS family",
        "CAST(user_id AS STRING) || '/' || CAST(lag_h AS STRING) AS k",
        "stack(2, 'cents', CAST(cents AS STRING),"
        " 'n', CAST(n AS STRING)) AS (metric, value)",
    )
    # late-r8 growth: the exact-Gini closed form rides the SAME per-user
    # frame (monetary column); abs_diff_sum is DECIMAL(38,0), exact as
    # STRING (the fused-suite value-column doctrine)
    thunks["gin"] = lambda: gini_frame(per_user).selectExpr(
        "'gini' AS family",
        "'all' AS k",
        "stack(4, 'n', CAST(n AS STRING),"
        " 'sum_cents', CAST(sum_cents AS STRING),"
        " 'abs_diff_sum', CAST(abs_diff_sum AS STRING),"
        " 'gini_ppm', CAST(gini_ppm AS STRING)) AS (metric, value)",
    )
    # eager checkpoint + RELEASE the shared subtrees: a 240-entry sim
    # session otherwise accumulates every suite's persisted frames and
    # later entries pay the cache-pressure tax (r9: three untouched doc
    # gates slowed 2-3x between the round's first and last full sim)
    from concurrent.futures import ThreadPoolExecutor

    # r11: the six builders are driver-paced at construction (threshold
    # collects, ladder persists) — pool the constructions like the
    # series suite; every shared subtree is materialized above
    with ThreadPoolExecutor(max_workers=6) as pool:
        futs = {n: pool.submit(t) for n, t in thunks.items()}
        fr = {n: f.result() for n, f in futs.items()}
    out = (
        fr["rfm"].unionByName(fr["ltv"])
        .unionByName(fr["par"])
        .unionByName(fr["mdd"])
        .unionByName(fr["att"])
        .unionByName(fr["gin"])
    )
    try:
        out = out.localCheckpoint(eager=True)
    finally:
        # ev/per_user are checkpoints now (GC-reclaimed), only the
        # thunk-internal persists need explicit release
        for df in released:
            df.unpersist()
    return out


def _segmentation_suite_sql() -> str:
    return f"""
SELECT 'rfm' AS family,
       CAST(r.r_seg AS VARCHAR) || '/' || CAST(r.f_seg AS VARCHAR) || '/' ||
       CAST(r.m_seg AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'n_users' THEN CAST(r.n_users AS VARCHAR)
                     ELSE CAST(r.sum_cents AS VARCHAR) END AS value
FROM ({USER_RFM_SEGMENTS_SQL}) r,
     (SELECT unnest(['n_users','sum_cents']) AS metric) m
UNION ALL
SELECT 'ltv' AS family,
       CAST(l.cohort_week AS VARCHAR) || '/' ||
       CAST(l.week_offset AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'week_cents' THEN CAST(l.week_cents AS VARCHAR)
                     WHEN 'cum_cents' THEN CAST(l.cum_cents AS VARCHAR)
                     ELSE CAST(l.ltv_ppm AS VARCHAR) END AS value
FROM ({COHORT_LTV_CURVES_SQL}) l,
     (SELECT unnest(['week_cents','cum_cents','ltv_ppm']) AS metric) m
UNION ALL
SELECT 'pareto' AS family,
       CAST(p.pct AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'thr_cents' THEN CAST(p.thr_cents AS VARCHAR)
                     WHEN 'users_above' THEN CAST(p.users_above AS VARCHAR)
                     WHEN 'users_above_ppm'
                       THEN CAST(p.users_above_ppm AS VARCHAR)
                     ELSE CAST(p.volume_share_ppm AS VARCHAR) END AS value
FROM ({USER_VOLUME_CONCENTRATION_SQL}) p,
     (SELECT unnest(['thr_cents','users_above','users_above_ppm',
                     'volume_share_ppm']) AS metric) m
UNION ALL
SELECT 'mdd' AS family, CAST(d.user_id AS VARCHAR) AS k, m.metric,
       CASE m.metric WHEN 'n_events' THEN CAST(d.n_events AS VARCHAR)
                     WHEN 'peak_cents' THEN CAST(d.peak_cents AS VARCHAR)
                     WHEN 'final_cents' THEN CAST(d.final_cents AS VARCHAR)
                     WHEN 'max_drawdown_cents'
                       THEN CAST(d.max_drawdown_cents AS VARCHAR)
                     ELSE CAST(d.underwater_events AS VARCHAR) END AS value
FROM ({USER_MAX_DRAWDOWN_SQL}) d,
     (SELECT unnest(['n_events','peak_cents','final_cents',
                     'max_drawdown_cents','underwater_events'])
        AS metric) m
UNION ALL
SELECT 'attr' AS family,
       CAST(a.user_id AS VARCHAR) || '/' || CAST(a.lag_h AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'cents' THEN CAST(a.cents AS VARCHAR)
                     ELSE CAST(a.n AS VARCHAR) END AS value
FROM ({EVENTS_MULTITOUCH_ATTRIBUTION_SQL}) a,
     (SELECT unnest(['cents','n']) AS metric) m
UNION ALL
SELECT 'gini' AS family, 'all' AS k, m.metric,
       CASE m.metric WHEN 'n' THEN CAST(g.n AS VARCHAR)
                     WHEN 'sum_cents' THEN CAST(g.sum_cents AS VARCHAR)
                     WHEN 'abs_diff_sum' THEN CAST(g.abs_diff_sum AS VARCHAR)
                     ELSE CAST(g.gini_ppm AS VARCHAR) END AS value
FROM ({USER_GINI_INEQUALITY_SQL}) g,
     (SELECT unnest(['n','sum_cents','abs_diff_sum','gini_ppm'])
        AS metric) m
"""


# --- events_multitouch_attribution: LINEAR MULTI-TOUCH revenue
#     attribution — the marketing-analytics shape that generalizes
#     last_view_before_purchase (J6's winner-takes-all) to credit EVERY
#     view in the lookback window: a purchase's cents split equally
#     across its qualifying views (strictly earlier, within
#     ATTR_WINDOW_H hours), share = cents DIV k with the integer
#     REMAINDER credited to the earliest view (deterministic (v_ts,
#     v_id) tiebreak) so credit conserves exactly: Σ shares == cents.
#     Output grain (user_id, lag_h): attribution-lag histogram in exact
#     cents (lag in whole hours via MICROSECOND diffs DIV'd identically
#     in both engines — the user_interevent_gaps doctrine; never
#     second-granularity datediff). Purchases with NO qualifying view
#     emit as lag_h = -1 ("direct") rows, so total credited cents ==
#     total purchase cents (a conservation audit rides the gate).
#     At 100 TB: one equi-join on user_id with a window-bounded time
#     predicate (the supplier_shipment_overlap expansion argument —
#     fanout is per-user activity inside 72h, not corpus-scale), and the
#     per-purchase windows partition on purchase id (touch-count-sized).
#     Oracle: k and the earliest view via plain per-purchase aggregates
#     + a pointwise min-ts/min-id characterization (no ROW_NUMBER), then
#     identical integer share arithmetic. Reference analog: the wallet
#     activity/profit attribution views (src/api.ts leaders endpoints).

ATTR_WINDOW_H = 72
_US_PER_H = 3_600_000_000


def events_multitouch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return attribution_frame(_events_cents(spark, sf_dir))


def attribution_frame(ev: DataFrame) -> DataFrame:
    """Core multi-touch path over any _events_cents-shaped frame —
    factored out so user_segmentation_suite can feed it from its
    persisted scan."""
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        "cents",
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    cand = (
        p.join(v, "user_id")
        .withColumn(
            "d_us", F.expr("timestampdiff(MICROSECOND, v_ts, p_ts)")
        )
        .filter(
            (F.col("d_us") > 0)
            & (F.col("d_us") <= ATTR_WINDOW_H * _US_PER_H)
        )
        # feeds the share/window path AND the direct anti-join — persist
        # or the 72h expansion join executes twice (late-r5 lesson 3)
        .persist()
    )
    wk = Window.partitionBy("p_id")
    wr = Window.partitionBy("p_id").orderBy("v_ts", "v_id")
    shared = cand.select(
        "user_id",
        "cents",
        F.expr(f"d_us DIV {_US_PER_H}").alias("lag_h"),
        F.count(F.lit(1)).over(wk).alias("k"),
        F.row_number().over(wr).alias("rn"),
    ).select(
        "user_id",
        "lag_h",
        (
            F.expr("cents DIV k")
            + F.when(F.col("rn") == 1, F.expr("cents % k")).otherwise(
                F.lit(0)
            )
        ).alias("share"),
    )
    att = shared.groupBy("user_id", "lag_h").agg(
        F.sum("share").alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    direct = (
        p.join(cand.select("p_id").distinct(), "p_id", "left_anti")
        .groupBy("user_id")
        .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n"))
        .select("user_id", F.lit(-1).cast("long").alias("lag_h"), "cents", "n")
    )
    return att.unionByName(direct).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("lag_h").cast("long").alias("lag_h"),
        F.col("cents").cast("long").alias("cents"),
        F.col("n").cast("long").alias("n"),
    )


EVENTS_MULTITOUCH_ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, user_id,
         {_CENTS} AS cents
  FROM events
),
p AS MATERIALIZED (
  SELECT user_id, ts AS p_ts, event_id AS p_id, cents
  FROM ev WHERE event_type = 'purchase'
),
cand AS MATERIALIZED (
  SELECT p.user_id, p.p_id, p.cents, v.ts AS v_ts, v.event_id AS v_id,
         datediff('microsecond', v.ts, p.p_ts) AS d_us
  FROM p JOIN ev v ON v.user_id = p.user_id AND v.event_type = 'view'
  WHERE datediff('microsecond', v.ts, p.p_ts) > 0
    AND datediff('microsecond', v.ts, p.p_ts) <= {ATTR_WINDOW_H * _US_PER_H}
),
-- pointwise first-view characterization: min ts, then min id at that ts
kf AS MATERIALIZED (
  SELECT p_id, CAST(COUNT(*) AS BIGINT) AS k, MIN(v_ts) AS mn_ts
  FROM cand GROUP BY 1
),
kf2 AS MATERIALIZED (
  SELECT c.p_id, kf.k, kf.mn_ts, MIN(c.v_id) AS mn_id
  FROM cand c JOIN kf ON kf.p_id = c.p_id AND c.v_ts = kf.mn_ts
  GROUP BY 1, 2, 3
),
att AS (
  SELECT c.user_id, c.d_us // {_US_PER_H} AS lag_h,
         SUM(c.cents // f.k
             + CASE WHEN c.v_ts = f.mn_ts AND c.v_id = f.mn_id
                    THEN c.cents % f.k ELSE 0 END) AS cents,
         COUNT(*) AS n
  FROM cand c JOIN kf2 f ON f.p_id = c.p_id
  GROUP BY 1, 2
),
direct AS (
  SELECT p.user_id, -1 AS lag_h, SUM(p.cents) AS cents, COUNT(*) AS n
  FROM p
  WHERE p.p_id NOT IN (SELECT p_id FROM cand)
  GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(lag_h AS BIGINT) AS lag_h,
       CAST(cents AS BIGINT) AS cents, CAST(n AS BIGINT) AS n
FROM att
UNION ALL
SELECT CAST(user_id AS BIGINT), CAST(lag_h AS BIGINT),
       CAST(cents AS BIGINT), CAST(n AS BIGINT)
FROM direct
"""


# --- user_max_drawdown: MAX DRAWDOWN over each user's signed equity
#     curve (purchases credit, everything else debits — the running-PnL
#     risk statistic every trading surface reports; reference analog:
#     the profit-leaders views, src/api.ts). Exact integers end-to-end:
#     P_t = running signed cents ordered by (ts, event_id); drawdown_t =
#     cummax(P) - P_t; per user emit peak, final, max drawdown, and the
#     underwater event count (rows strictly below the prior peak).
#     At 100 TB: two per-user running windows + one hash agg — the W2
#     shape. Oracle: the LITERAL pair definition — max over ordered
#     pairs i <= j of P_i - P_j via a per-user self-join (quadratic, the
#     formulation the running-cummax path exists to avoid) — so the two
#     derivations check each other (the Lindley-doctrine differential).

def user_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return max_drawdown_frame(_events_cents(spark, sf_dir))


def max_drawdown_frame(ev_cents: DataFrame) -> DataFrame:
    """Core drawdown fold over any _events_cents-shaped frame — factored
    out for user_segmentation_suite subtree sharing."""
    ev = ev_cents.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("cents"))
        .otherwise(-F.col("cents"))
        .alias("d"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("d").over(wcum).alias("p"),
    ).withColumn("peak_so_far", F.max("p").over(wcum))
    return (
        curve.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("p").alias("peak_cents"),
            F.max_by("p", F.struct("ts", "event_id")).alias("final_cents"),
            F.max(F.col("peak_so_far") - F.col("p")).alias(
                "max_drawdown_cents"
            ),
            F.sum(
                (F.col("p") < F.col("peak_so_far")).cast("long")
            ).alias("underwater_events"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("peak_cents").cast("long").alias("peak_cents"),
            F.col("final_cents").cast("long").alias("final_cents"),
            F.col("max_drawdown_cents").cast("long").alias(
                "max_drawdown_cents"
            ),
            F.col("underwater_events").cast("long").alias(
                "underwater_events"
            ),
        )
    )


USER_MAX_DRAWDOWN_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN event_type = 'purchase' THEN {_CENTS}
              ELSE -({_CENTS}) END AS d
  FROM events
),
runs AS MATERIALIZED (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         CAST(SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
  FROM ev
),
-- the literal pair definition of drawdown: max over i <= j of P_i - P_j
dd AS (
  SELECT a.user_id,
         CAST(MAX(a.p - b.p) AS BIGINT) AS max_drawdown_cents,
         CAST(COUNT(DISTINCT CASE WHEN a.rn < b.rn AND a.p > b.p
                                  THEN b.rn END) AS BIGINT)
           AS underwater_events
  FROM runs a JOIN runs b
    ON b.user_id = a.user_id AND b.rn >= a.rn
  GROUP BY 1
)
SELECT r.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(r.p) AS BIGINT) AS peak_cents,
       CAST(MAX(CASE WHEN r.rn = (SELECT MAX(r2.rn) FROM runs r2
                                  WHERE r2.user_id = r.user_id)
                     THEN r.p END) AS BIGINT) AS final_cents,
       MAX(d.max_drawdown_cents) AS max_drawdown_cents,
       MAX(d.underwater_events) AS underwater_events
FROM runs r JOIN dd d ON d.user_id = r.user_id
GROUP BY 1
"""


# (series-suite SQL binding moved to module end: it now also
# interpolates EVENTS_ROBUST_MEANS_SQL, defined below)

# --- events_robust_means: WINSORIZED + TRIMMED means per event type —
#     the robust location estimators that complement median/MAD
#     (winsorizing CLAMPS tails to the p10/p90 order-statistic values,
#     trimming DROPS them; both need exact quantile VALUES first, so
#     this composes the selection machinery with zero new algorithmic
#     surface). All exact integers: the p10/p90 thresholds come from
#     quantile_select_frame (bounded_axis: event cents are
#     domain-bounded), then one conditional aggregation emits
#       winsorized_sum = Σ clamp(cents, lo, hi)      (exact BIGINT)
#       trimmed_sum / trimmed_n over lo <= cents <= hi
#     plus mean_milli = sum*1000 DIV n for each — integer division,
#     no float rounding anywhere. At 100 TB: one selection pass (two
#     scans) + one scan-aggregation with broadcast thresholds. Oracle:
#     thresholds via the literal full-sort rank-k pick, identical
#     clamp/trim arithmetic.

RM_LO_PCT = 10
RM_HI_PCT = 90


def events_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    return robust_means_frame(
        _events_cents(spark, sf_dir).select("event_type", "cents")
    )


def robust_means_frame(
    ev: DataFrame, _hist: DataFrame | None = None
) -> DataFrame:
    """Core winsorize/trim path over any (event_type, cents) frame —
    factored out so events_series_suite can feed it from its persisted
    cents subtree. r11: thresholds AND the clamp/trim folds run off the
    value-grain histogram (one corpus pass standalone, zero with a
    caller-shared ``_hist``); every sum is a weighted fold, results
    bit-identical."""
    hist = _hist
    if hist is None:
        hist = (
            ev.groupBy("event_type", "cents")
            .agg(F.count(F.lit(1)).alias("cnt"))
            # pre-partition by event_type so the selection chain over the
            # cached histogram is exchange-free (see mad_outliers_frame)
            .repartition(ev.sparkSession.sparkContext.defaultParallelism,
                         "event_type")
            .persist()
        )
        hist.count()  # materialize before the fan-out (cold-race rule)
    thr = (
        quantile_select_frame(
            None, pcts=(RM_LO_PCT, RM_HI_PCT), bounded_axis=True, _hist=hist
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("q_pct") == RM_LO_PCT, F.col("value_cents"))
            ).alias("lo"),
            F.max(
                F.when(F.col("q_pct") == RM_HI_PCT, F.col("value_cents"))
            ).alias("hi"),
        )
    )
    return (
        hist.join(F.broadcast(thr), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum(
                F.greatest(F.least(F.col("cents"), F.col("hi")), F.col("lo"))
                * F.col("cnt")
            ).alias("winsorized_sum"),
            F.sum(
                F.when(
                    (F.col("cents") >= F.col("lo"))
                    & (F.col("cents") <= F.col("hi")),
                    F.col("cents") * F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("trimmed_sum"),
            F.sum(
                F.when(
                    (F.col("cents") >= F.col("lo"))
                    & (F.col("cents") <= F.col("hi")),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("trimmed_n"),
        )
        .select(
            "event_type",
            F.col("lo").cast("long").alias("lo_cents"),
            F.col("hi").cast("long").alias("hi_cents"),
            F.col("n").cast("long").alias("n"),
            F.col("winsorized_sum").cast("long").alias("winsorized_sum"),
            F.expr("winsorized_sum * 1000 DIV n").alias(
                "winsorized_mean_milli"
            ),
            F.col("trimmed_sum").cast("long").alias("trimmed_sum"),
            F.col("trimmed_n").cast("long").alias("trimmed_n"),
            F.expr("trimmed_sum * 1000 DIV trimmed_n").alias(
                "trimmed_mean_milli"
            ),
        )
    )


EVENTS_ROBUST_MEANS_SQL = f"""
WITH ev AS (
  SELECT event_type, {_CENTS} AS cents FROM events
),
r AS MATERIALIZED (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
thr AS MATERIALIZED (
  SELECT event_type,
         CAST(MAX(CASE WHEN rn = (n - 1) * {RM_LO_PCT} // 100 + 1
                       THEN cents END) AS BIGINT) AS lo,
         CAST(MAX(CASE WHEN rn = (n - 1) * {RM_HI_PCT} // 100 + 1
                       THEN cents END) AS BIGINT) AS hi
  FROM r GROUP BY 1
)
SELECT e.event_type,
       t.lo AS lo_cents,
       t.hi AS hi_cents,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(GREATEST(LEAST(e.cents, t.hi), t.lo)) AS BIGINT)
         AS winsorized_sum,
       CAST(SUM(GREATEST(LEAST(e.cents, t.hi), t.lo)) * 1000
            // COUNT(*) AS BIGINT) AS winsorized_mean_milli,
       CAST(SUM(CASE WHEN e.cents BETWEEN t.lo AND t.hi
                     THEN e.cents ELSE 0 END) AS BIGINT) AS trimmed_sum,
       CAST(SUM(CASE WHEN e.cents BETWEEN t.lo AND t.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS trimmed_n,
       CAST(SUM(CASE WHEN e.cents BETWEEN t.lo AND t.hi
                     THEN e.cents ELSE 0 END) * 1000
            // SUM(CASE WHEN e.cents BETWEEN t.lo AND t.hi
                        THEN 1 ELSE 0 END) AS BIGINT)
         AS trimmed_mean_milli
FROM ev e JOIN thr t USING (event_type)
GROUP BY 1, 2, 3
"""


# --- user_gini_inequality: exact GINI / mean-absolute-difference over
#     the per-user monetary distribution — the scalar companion of the
#     Pareto concentration curve (how unequal IS the whale economy?).
#     The naive definition is quadratic (Σ|x_i − x_j| over all pairs);
#     the closed form over the SORTED multiset,
#       Σ_v v·c_v·(2·cum_before(v) + c_v − n),
#     needs per-VALUE cumulative counts on the unbounded monetary axis —
#     exactly what the hierarchical prefix-sum ladder (_hier_cum)
#     provides with every window partition <= 2^17 rows at any range.
#     Sums ride DECIMAL(38,0) (n·v·n exceeds 2^63 at 100 TB; DuckDB's
#     HUGEINT sum arrives as the same decimal128 kind), gini_ppm =
#     abs_diff_sum·1e6 DIV (n·Σx) in exact integer arithmetic.
#     Oracle: the LITERAL pairwise definition (a.user_id < b.user_id
#     self-join) — the quadratic form the ladder exists to avoid; the
#     driver-fixture user dimension is small so the oracle stays cheap.


def user_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_cents(spark, sf_dir)
    # eager checkpoint, not bare persist: per_user feeds the value
    # histogram AND the totals row — the branches race an unmaterialized
    # cache (r10 rule), and a checkpointed leaf keeps AQE coalescing
    # below it (the r15 segmentation-suite lesson)
    per_user = (
        ev.groupBy("user_id")
        .agg(F.sum("cents").alias("monetary"))
        .localCheckpoint(eager=True)
    )
    return gini_frame(per_user)


def gini_frame(per_user: DataFrame) -> DataFrame:
    """Core Gini closed form over any (persisted) per-user frame with a
    ``monetary`` column — factored out for user_segmentation_suite
    subtree sharing."""
    vc = (
        per_user.groupBy("monetary")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("all").alias("event_type"),
            F.col("monetary").alias("b"),
            "cnt",
        )
        .withColumn("p1", F.expr(f"b DIV {QSEL_FAN}"))
    )
    bcum, ntab = _hier_cum(vc)
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n"), F.sum("monetary").alias("sum_cents")
    )
    terms = bcum.join(F.broadcast(ntab), "event_type").select(
        (
            F.col("b").cast("decimal(38,0)")
            * F.col("cnt")
            * (
                F.lit(2) * (F.col("cum") - F.col("cnt"))
                + F.col("cnt")
                - F.col("n")
            )
        ).alias("t")
    )
    return (
        terms.agg(F.sum("t").cast("decimal(38,0)").alias("abs_diff_sum"))
        .crossJoin(tot)  # 1 row x 1 row
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            "abs_diff_sum",
            F.expr(
                "CAST((abs_diff_sum * 1000000)"
                " DIV (CAST(n AS DECIMAL(38,0)) * sum_cents) AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )


USER_GINI_INEQUALITY_SQL = f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id, CAST(SUM({_CENTS}) AS BIGINT) AS m
  FROM events GROUP BY user_id
),
pairs AS (
  -- the literal quadratic definition over unordered pairs
  SELECT SUM(CAST(ABS(a.m - b.m) AS HUGEINT)) AS abs_diff_sum
  FROM per_user a JOIN per_user b ON a.user_id < b.user_id
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(m) AS BIGINT) AS sum_cents
  FROM per_user
)
SELECT t.n, t.sum_cents,
       p.abs_diff_sum,
       CAST(p.abs_diff_sum * 1000000
            // (CAST(t.n AS HUGEINT) * t.sum_cents) AS BIGINT) AS gini_ppm
FROM pairs p, tot t
"""


# --- events_hll_register_histogram: HyperLogLog made DETERMINISTIC and
#     oracle-able at the REGISTER level — the distinct-count sketch the
#     repo previously exercised only through Spark's builtin
#     approx_count_distinct (whose registers are engine-internal, so no
#     cross-engine differential was possible). From-scratch registers:
#     h = first 12 md5 hex chars of the user id (48 bits, the KMV
#     convention), register j = top 8 bits (m = 256), w = low 40 bits,
#     rho = leading-zero count of w within 40 bits + 1 (41 when w = 0).
#     Per (event_type, j): MAX rho — a plain mergeable aggregate (the
#     -State/-Merge contract: register-wise max distributes over any
#     partitioning). The gate emits the REGISTER HISTOGRAM
#     (event_type, rho, n_registers) — all integer, fully deterministic;
#     the float harmonic-mean estimate is a pure function of the
#     histogram and lives in tests/test_sketches.py (within-rel-error
#     check vs exact), keeping floats out of the gate.
#     rho derivations deliberately DIFFER: Spark uses
#     41 - length(bin(w)); the oracle zero-pads the 40-bit binary string
#     and takes strpos(.., '1') — two independent leading-zero formulas.
#     At 100 TB: one scan, map-side-combinable max into 256·|types|
#     cells. Reference analog: ClickHouse uniq()/uniqHLL12
#     (src/api.ts distinct-user stats).

HLL_B = 8  # 2^8 = 256 registers
_HLL_W_BITS = 40
_HLL_RADIX = 1 << (_HLL_W_BITS + HLL_B)  # 48-bit hash space


def events_hll_register_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    regs = ev.select(
        "event_type",
        h.alias("h"),
    ).select(
        "event_type",
        F.expr(f"h DIV {1 << _HLL_W_BITS}").alias("j"),
        F.expr(f"h % {1 << _HLL_W_BITS}").alias("w"),
    ).select(
        "event_type",
        "j",
        F.when(F.col("w") == 0, F.lit(_HLL_W_BITS + 1))
        .otherwise(F.lit(_HLL_W_BITS + 1) - F.length(F.bin("w")))
        .alias("rho"),
    )
    return (
        regs.groupBy("event_type", "j")
        .agg(F.max("rho").alias("m_rho"))
        .groupBy("event_type", F.col("m_rho").alias("rho"))
        .agg(F.count(F.lit(1)).alias("n_registers"))
        .select(
            "event_type",
            F.col("rho").cast("long").alias("rho"),
            F.col("n_registers").cast("long").alias("n_registers"),
        )
    )


EVENTS_HLL_REGISTER_HISTOGRAM_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS STRING)), 1, 12)
              AS BIGINT) AS h
  FROM events
),
r AS (
  SELECT event_type,
         h // {1 << _HLL_W_BITS} AS j,
         h % {1 << _HLL_W_BITS} AS w
  FROM h
),
regs AS (
  -- independent rho derivation: strpos of the first '1' in the
  -- zero-padded 40-bit binary string (vs Spark's 41 - len(bin(w)))
  SELECT event_type, j,
         MAX(CASE WHEN w = 0 THEN {_HLL_W_BITS + 1}
                  ELSE strpos(lpad(bin(w), {_HLL_W_BITS}, '0'), '1')
             END) AS m_rho
  FROM r GROUP BY 1, 2
)
SELECT event_type, CAST(m_rho AS BIGINT) AS rho,
       CAST(COUNT(*) AS BIGINT) AS n_registers
FROM regs GROUP BY 1, 2
"""


# --- events_ab_arm_stats: A/B EXPERIMENTATION sufficient statistics —
#     the reduction every experimentation platform ships: users split
#     into arms by a deterministic hash (md5 first hex nibble: 0-7 = A,
#     8-f = B — the unit of randomization is the USER, so all of a
#     user's events land in one arm), then per (event_type, arm) the
#     EXACT sufficient statistics for any two-sample test: n, Σx (cents,
#     BIGINT) and Σx² (DECIMAL(38,0) — cents² exceeds int64 at corpus
#     scale; DuckDB's HUGEINT sum arrives as the same decimal128 kind).
#     The float Welch t statistic is a pure function of these six
#     numbers per type and is checked against a direct numpy computation
#     in tests (the autocov sufficient-stat doctrine: floats never enter
#     the gate). At 100 TB: ONE map-side-combinable scan-aggregation —
#     the cheapest plan shape there is. Reference analog: the summary
#     stats endpoints (src/api.ts); arm-splitting is beyond-ref surface.


def events_ab_arm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ab_arm_stats_frame(_events_cents(spark, sf_dir))


def ab_arm_stats_frame(ev: DataFrame) -> DataFrame:
    """Frame core over (event_type, user_id, cents) — the series suite
    executes this verbatim off its persisted scan (r8 verdict task 7)."""
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
            *"01234567"
        ),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    return (
        ev.select("event_type", arm.alias("arm"), "cents")
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("cents")
            ).cast("decimal(38,0)").alias("sumsq_cents"),
        )
        .select(
            "event_type",
            "arm",
            F.col("n").cast("long").alias("n"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            "sumsq_cents",
        )
    )


EVENTS_AB_ARM_STATS_SQL = f"""
SELECT event_type,
       CASE WHEN substring(md5(CAST(user_id AS STRING)), 1, 1)
                 IN ('0','1','2','3','4','5','6','7')
            THEN 'A' ELSE 'B' END AS arm,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents,
       SUM(CAST({_CENTS} AS HUGEINT) * ({_CENTS})) AS sumsq_cents
FROM events
GROUP BY 1, 2
"""


# --- events_value_drift: DISTRIBUTION-DRIFT monitor between the
#     month's two halves (the population-stability-index shape every
#     training-data/feature pipeline runs before trusting a refresh;
#     day <= 15 vs > 15 — the qdigest_merge split convention). Per
#     (event_type, value bucket = cents DIV 256, the domain-bounded
#     histogram axis): exact counts and integer ppm shares per half,
#     plus the per-bucket |Δshare| ppm — the summable terms of total
#     variation distance (TVD = Σ|p−q|/2). The float PSI
#     Σ(p−q)·ln(p/q) is a pure function of this histogram and is
#     checked against a direct numpy computation in tests (floats never
#     enter the gate — the HLL/Welch doctrine). At 100 TB: ONE
#     map-side-combinable scan-aggregation + a broadcast join of the
#     per-(type, half) totals. Reference analog: the daily rollup
#     consistency checks (src/build-rollup-1d.ts); drift monitoring is
#     beyond-ref surface.


def events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_drift_frame(_events_cents(spark, sf_dir))


def value_drift_frame(ev0: DataFrame) -> DataFrame:
    """Frame core over (event_type, ts, cents) — the series suite
    executes this verbatim off its persisted scan (r8 verdict task 7)."""
    ev = ev0.select(
        "event_type",
        F.expr(f"cents DIV {QSEL_BUCKET}").alias("b"),
        (F.dayofmonth("ts") <= QD_SPLIT_DAY).cast("int").alias("first_half"),
    )
    cells = ev.groupBy("event_type", "b").agg(
        F.sum("first_half").cast("long").alias("n_first"),
        F.sum(F.lit(1) - F.col("first_half")).cast("long").alias("n_second"),
    )
    tots = cells.groupBy("event_type").agg(
        F.sum("n_first").alias("t1"), F.sum("n_second").alias("t2")
    )
    return (
        cells.join(F.broadcast(tots), "event_type")
        .select(
            "event_type",
            F.col("b").cast("long").alias("bucket"),
            "n_first",
            "n_second",
            # GREATEST(...,1): a type whose rows all fall in one half has a
            # zero divisor — guard identically in both engines (KMV doctrine)
            F.expr("n_first * 1000000 DIV GREATEST(t1, 1)").alias(
                "share_first_ppm"
            ),
            F.expr("n_second * 1000000 DIV GREATEST(t2, 1)").alias(
                "share_second_ppm"
            ),
        )
        .withColumn(
            "abs_share_diff_ppm",
            F.abs(F.col("share_first_ppm") - F.col("share_second_ppm")),
        )
    )


EVENTS_VALUE_DRIFT_SQL = f"""
WITH ev AS (
  SELECT event_type, {_CENTS} // {QSEL_BUCKET} AS b,
         CASE WHEN day(CAST(ts AS TIMESTAMP)) <= {QD_SPLIT_DAY}
              THEN 1 ELSE 0 END AS first_half
  FROM events
),
cells AS MATERIALIZED (
  SELECT event_type, b,
         CAST(SUM(first_half) AS BIGINT) AS n_first,
         CAST(SUM(1 - first_half) AS BIGINT) AS n_second
  FROM ev GROUP BY 1, 2
),
tots AS (
  SELECT event_type, CAST(SUM(n_first) AS BIGINT) AS t1,
         CAST(SUM(n_second) AS BIGINT) AS t2
  FROM cells GROUP BY 1
)
SELECT c.event_type, CAST(c.b AS BIGINT) AS bucket, c.n_first, c.n_second,
       CAST(c.n_first * 1000000 // GREATEST(t.t1, 1) AS BIGINT)
         AS share_first_ppm,
       CAST(c.n_second * 1000000 // GREATEST(t.t2, 1) AS BIGINT)
         AS share_second_ppm,
       CAST(ABS(c.n_first * 1000000 // GREATEST(t.t1, 1)
                - c.n_second * 1000000 // GREATEST(t.t2, 1)) AS BIGINT)
         AS abs_share_diff_ppm
FROM cells c JOIN tots t USING (event_type)
"""


# --- events_type_xcorr: CROSS-type lead-lag correlation sufficient
#     statistics (r9) — the companion of events_hourly_autocov across
#     SERIES: for every unordered type pair (a < b) and lag h ∈ {0, 24},
#     pair b's hourly-cents value at hour x with a's at hour x - h
#     (pairs exist only where BOTH series have the hour — the sparse
#     semantics autocov uses) and emit the exact sufficient statistics
#     n_pairs / Σa / Σb / Σab / cov_num for the Pearson numerator. The
#     float r is a pure function of these (checked against numpy in
#     tests — the autocov/Welch doctrine; floats never enter the gate).
#     At 100 TB: the hourly series is calendar-bounded (one row per
#     (type, hour)), the pair join keys on the hour index, and the
#     output is |type-enum|²-bounded — scan-dominated like autocov.
#     Spark joins the shifted sparse series; the oracle derives the same
#     pairs by LAG over a per-pair dense hour spine (absent hours NULL,
#     dropped) — a genuinely different pairing construction.
#     Reference analog: none (beyond-ref analytics surface; nearest is
#     the hourly volume MV, clickhouse/init/001:559-586).

XCORR_LAGS = (0, 24)


def xcorr_frame(hourly: DataFrame) -> DataFrame:
    outs = []
    for lag in XCORR_LAGS:
        a_side = hourly.selectExpr(
            "event_type AS type_a", f"x + {lag} AS x", "s AS a"
        )
        b_side = hourly.selectExpr("event_type AS type_b", "x", "s AS b")
        pairs = a_side.join(b_side, "x").filter(
            F.col("type_a") < F.col("type_b")
        )
        outs.append(
            pairs.groupBy("type_a", "type_b")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                # sum a/b through DECIMAL(38,0) like sum_ab/cov_num (r9
                # ADVICE): a bare long sum would wrap silently at scale
                # where the oracle's HUGEINT->BIGINT cast errors; the
                # decimal->long cast below nulls on overflow instead,
                # which the gate hash surfaces loudly
                F.sum(F.col("a").cast("decimal(38,0)")).alias("sum_a_dec"),
                F.sum(F.col("b").cast("decimal(38,0)")).alias("sum_b_dec"),
                F.sum(F.col("a").cast("decimal(38,0)") * F.col("b")).alias(
                    "sum_ab"
                ),
            )
            .select(
                "type_a",
                "type_b",
                F.lit(lag).cast("long").alias("lag_h"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.col("sum_a_dec").cast("long").alias("sum_a"),
                F.col("sum_b_dec").cast("long").alias("sum_b"),
                F.col("sum_ab").cast("decimal(38,0)").alias("sum_ab"),
            )
            .select(
                "type_a",
                "type_b",
                "lag_h",
                "n_pairs",
                "sum_a",
                "sum_b",
                "sum_ab",
                F.expr(
                    "CAST(CAST(n_pairs AS DECIMAL(38,0)) * sum_ab "
                    "- CAST(sum_a AS DECIMAL(38,0)) * sum_b "
                    "AS DECIMAL(38,0))"
                ).alias("cov_num"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def events_type_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: feeds both join sides, for every lag
    return xcorr_frame(_hourly_frame(_events_cents(spark, sf_dir)).persist())


def _xcorr_lag_sql(lag: int) -> str:
    # dense per-pair hour spine + LAG, vs Spark's sparse shifted join
    return f"""
SELECT type_a, type_b, CAST({lag} AS BIGINT) AS lag_h,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(a) AS BIGINT) AS sum_a,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(CAST(a AS HUGEINT) * b) AS DECIMAL(38,0)) AS sum_ab,
       CAST(COUNT(*) * SUM(CAST(a AS HUGEINT) * b)
            - CAST(SUM(a) AS HUGEINT) * SUM(b) AS DECIMAL(38,0)) AS cov_num
FROM (
  SELECT p.type_a, p.type_b, sp.x,
         LAG(ha.s, {lag}) OVER (PARTITION BY p.type_a, p.type_b
                                ORDER BY sp.x) AS a,
         hb.s AS b
  FROM xpairs p
  JOIN xspine sp ON sp.x BETWEEN p.x0 AND p.x1
  LEFT JOIN xhourly ha ON ha.event_type = p.type_a AND ha.x = sp.x
  LEFT JOIN xhourly hb ON hb.event_type = p.type_b AND hb.x = sp.x
)
WHERE a IS NOT NULL AND b IS NOT NULL
GROUP BY 1, 2
"""


EVENTS_TYPE_XCORR_SQL = f"""
WITH xev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         {_CENTS} AS cents
  FROM events
),
xhourly AS MATERIALIZED (
  SELECT event_type, x, CAST(SUM(cents) AS BIGINT) AS s
  FROM xev GROUP BY 1, 2
),
xspans AS MATERIALIZED (
  SELECT event_type, MIN(x) AS x0, MAX(x) AS x1 FROM xhourly GROUP BY 1
),
xpairs AS MATERIALIZED (
  -- spine spans the union of both series' ranges (LAG over the dense
  -- axis then reproduces exactly the shifted-join pairing)
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         LEAST(a.x0, b.x0) AS x0, GREATEST(a.x1, b.x1) + {max(XCORR_LAGS)}
           AS x1
  FROM xspans a JOIN xspans b ON a.event_type < b.event_type
),
xspine AS MATERIALIZED (
  SELECT UNNEST(generate_series(
    (SELECT MIN(x0) FROM xpairs), (SELECT MAX(x1) FROM xpairs))) AS x
)
{_xcorr_lag_sql(0)}
UNION ALL
{_xcorr_lag_sql(24)}
"""


# --- events_type_transition_matrix: first-order MARKOV-CHAIN fit of the
#     per-user clickstream (r9) — the user-journey model every product
#     analytics stack ships (and the generalization of events_top_paths'
#     fixed triples): per user, order events by (ts, event_id); each
#     adjacent pair contributes one (prev_type, next_type) transition.
#     Output per cell: exact count, the row total, and the transition
#     probability as integer ppm (n·1e6 DIV row total). Spark derives
#     adjacency with a per-user LAG window; the oracle derives it by the
#     QUANTIFIER definition — (e1, e2) are adjacent iff NO event of the
#     same user falls strictly between them (correlated NOT EXISTS, the
#     suppliers_kept_waiting doctrine) — a genuinely different
#     construction of the same pair set. At 100 TB: the window
#     partitions by user (the wallet_event_scans shape), transitions
#     partial-aggregate map-side into a |type-enum|²-bounded matrix.
#     Reference analog: none (beyond-ref; nearest is the activity feed).


def transition_matrix_frame(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    cells = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tots = cells.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        cells.join(F.broadcast(tots), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n"),
            F.col("row_total").cast("long").alias("row_total"),
            F.expr("n * 1000000 DIV row_total").alias("p_ppm"),
        )
    )


def events_type_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return transition_matrix_frame(_events_cents(spark, sf_dir))


EVENTS_TYPE_TRANSITION_MATRIX_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
),
adj AS (
  -- quantifier adjacency: e2 follows e1 with nothing strictly between
  SELECT e1.event_type AS prev_type, e2.event_type AS next_type
  FROM e e1 JOIN e e2
    ON e1.user_id = e2.user_id
   AND (e1.ts, e1.event_id) < (e2.ts, e2.event_id)
  WHERE NOT EXISTS (
    SELECT 1 FROM e e3
    WHERE e3.user_id = e1.user_id
      AND (e1.ts, e1.event_id) < (e3.ts, e3.event_id)
      AND (e3.ts, e3.event_id) < (e2.ts, e2.event_id)
  )
),
cells AS MATERIALIZED (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM adj GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS p_ppm
FROM cells
"""


# --- events_ewma_control: integer EWMA control chart (r9) — the
#     exponentially-weighted moving average monitor every ops stack runs
#     on its metric streams, with the float killed by construction: with
#     α = 1/4 the recursion m_t = m_{t-1} + (s_t − m_{t-1}) DIV 4 stays
#     in exact integers (Spark DIV and DuckDB // both truncate toward
#     zero on negatives — verified in CLAUDE.md), so the carried state
#     is bit-identical cross-engine at any length. Emits per (type,
#     hour): the observation s, the post-update ewma, and the residual
#     s − m_{t−1} against the PRE-update state (the control-chart
#     statistic). Spark folds each type's calendar-bounded hourly series
#     with ONE F.aggregate over the sorted (x, s) array (≤ month-hours
#     rows per type — the sequence-automaton doctrine); the oracle is
#     the literal recursive CTE. At 100 TB: the hourly pre-agg collapses
#     the corpus before any sequence work, series length is calendar-
#     bounded, per-type arrays are KB-sized.
#     Reference analog: none (beyond-ref ops monitoring).

EWMA_SHIFT = 4  # alpha = 1/4


def _ewma_step(acc, e):
    """Fold step: append (x, s, ewma, resid) given the running array.

    DIV-toward-zero via double division by 2^k then long cast: (s−m)/4
    is EXACT in binary floating point (power-of-two divisor, |s−m| far
    below 2^52) and the long cast truncates toward zero — the same
    semantics as Spark DIV / DuckDB // on negatives."""
    prev = F.element_at(acc, -1)
    first = F.size(acc) == 0
    resid = F.when(first, F.lit(0).cast("long")).otherwise(
        e["s"] - prev["ewma"]
    )
    m_new = F.when(first, e["s"]).otherwise(
        prev["ewma"]
        + ((e["s"] - prev["ewma"]) / F.lit(float(EWMA_SHIFT))).cast("long")
    )
    return F.concat(
        acc,
        F.array(
            F.struct(
                e["x"].alias("x"),
                e["s"].alias("s"),
                m_new.alias("ewma"),
                resid.alias("resid"),
            )
        ),
    )


def ewma_control_frame(hourly: DataFrame) -> DataFrame:
    pts = hourly.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("x"), F.col("s")))
        ).alias("pts")
    )
    acc_t = "array<struct<x:bigint,s:bigint,ewma:bigint,resid:bigint>>"
    fold = pts.select(
        "event_type",
        F.aggregate(
            "pts", F.expr(f"CAST(array() AS {acc_t})"), _ewma_step
        ).alias("out"),
    )
    return fold.select("event_type", F.explode("out").alias("o")).select(
        "event_type",
        F.col("o.x").alias("x"),
        F.col("o.s").alias("s"),
        F.col("o.ewma").cast("long").alias("ewma"),
        F.col("o.resid").cast("long").alias("resid"),
    )


def events_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_control_frame(_hourly_frame(_events_cents(spark, sf_dir)))


EVENTS_EWMA_CONTROL_SQL = f"""
WITH RECURSIVE eev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) * 24
           + CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         {_CENTS} AS cents
  FROM events
),
ehourly AS MATERIALIZED (
  SELECT event_type, x, CAST(SUM(cents) AS BIGINT) AS s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn
  FROM eev GROUP BY 1, 2
),
scan AS (
  SELECT event_type, rn, x, s, s AS ewma, CAST(0 AS BIGINT) AS resid
  FROM ehourly WHERE rn = 1
  UNION ALL
  SELECT h.event_type, h.rn, h.x, h.s,
         sc.ewma + (h.s - sc.ewma) // {EWMA_SHIFT},
         h.s - sc.ewma
  FROM scan sc JOIN ehourly h
    ON h.event_type = sc.event_type AND h.rn = sc.rn + 1
)
SELECT event_type, x, s, CAST(ewma AS BIGINT) AS ewma,
       CAST(resid AS BIGINT) AS resid
FROM scan
"""


# --- events_day_bitmap_stats: bitmap-index aggregates (r9) — the
#     groupBitmap/groupBitmapOr analog of ClickHouse's bitmap family
#     re-expressed on a BIGINT day-mask: each user's activity mask sets
#     bit (day−1) of the fixture month (30 bits), built with bit_or;
#     per type the -Merge tier reports exact user counts, the OR / AND
#     of all member masks (any-day coverage / every-user-common days),
#     their popcounts, and the summed per-user active-day popcounts.
#     Both engines compute bit_or/bit_and aggregates and bit_count
#     natively (JVM-side / vectorized). At 100 TB: the mask build is one
#     map-side-combinable groupBy; masks are 8 bytes per (user, type) —
#     the bitmap tier every retention dashboard reads instead of raw
#     events. Reference analog: uniqExact MV states
#     (clickhouse/init/002:13) — the bitmap is the mergeable exact-set
#     encoding for a bounded universe.


def day_bitmap_frame(ev: DataFrame) -> DataFrame:
    masks = (
        ev.select(
            "event_type",
            "user_id",
            # SQL shiftleft: the Python API wants a literal shift amount
            F.expr("shiftleft(CAST(1 AS BIGINT), day(ts) - 1)").alias(
                "daybit"
            ),
        )
        .groupBy("event_type", "user_id")
        .agg(F.bit_or("daybit").alias("mask"))
    )
    return (
        masks.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.bit_or("mask").alias("or_mask"),
            F.bit_and("mask").alias("and_mask"),
            F.sum(F.bit_count("mask")).alias("sum_user_days"),
        )
        .select(
            "event_type",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("or_mask").cast("long").alias("or_mask"),
            F.col("and_mask").cast("long").alias("and_mask"),
            F.bit_count("or_mask").cast("long").alias("coverage_days"),
            F.bit_count("and_mask").cast("long").alias("common_days"),
            F.col("sum_user_days").cast("long").alias("sum_user_days"),
        )
    )


def events_day_bitmap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return day_bitmap_frame(_events_cents(spark, sf_dir))


EVENTS_DAY_BITMAP_STATS_SQL = """
WITH masks AS MATERIALIZED (
  SELECT event_type, user_id,
         CAST(bit_or(1::BIGINT << (day(CAST(ts AS TIMESTAMP)) - 1))
              AS BIGINT) AS mask
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(bit_or(mask) AS BIGINT) AS or_mask,
       CAST(bit_and(mask) AS BIGINT) AS and_mask,
       CAST(bit_count(bit_or(mask)) AS BIGINT) AS coverage_days,
       CAST(bit_count(bit_and(mask)) AS BIGINT) AS common_days,
       CAST(SUM(bit_count(mask)) AS BIGINT) AS sum_user_days
FROM masks
GROUP BY 1
"""


# deferred: interpolates the drawdown/attribution oracles defined above
USER_SEGMENTATION_SUITE_SQL = _segmentation_suite_sql()

# deferred: interpolates the cusum/counter/seasonal/qdmerge/robust oracles
EVENTS_SERIES_SUITE_SQL = _series_suite_sql()
