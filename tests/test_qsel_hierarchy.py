"""Planted wide-range checks for the r8 hierarchical bucket-axis prefix
sum in quantile_select_frame (the r7 verdict's one weak finding: the
level-1 running sum single-partitioned an UNBOUNDED derived axis like
per-user monetary). Two assertions:

1. correctness is unchanged on values spanning >= 2^40 cents (including
   negatives straddling the truncation-toward-zero double-wide parent),
   vs the literal sorted rank-k definition;
2. the BOUND is real: recomputing the level tables by the same DIV
   formulas, every window partition the plan sorts — (type, p1) at the
   base, (type, p2)/(type, p3) above, (type) at the top — holds
   <= 2^17 rows even though the raw axis would have needed millions.
"""

from __future__ import annotations

import numpy as np
import pytest

from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
    QSEL_BUCKET,
    QSEL_FAN,
    quantile_select_frame,
)


def _tdiv(a: int, d: int) -> int:
    """Truncation-toward-zero division (Spark DIV semantics)."""
    q = abs(a) // d
    return q if a >= 0 else -q


@pytest.mark.parametrize("seed", [29, 173])
def test_wide_range_selection_exact_and_bounded(spark, seed):
    rng = np.random.RandomState(seed)
    # plant a whale distribution spanning > 2^40 cents: a dense bulk,
    # a heavy tail out to ~1.1e12, and a negative lobe (signed ledgers)
    bulk = rng.randint(-(10**6), 10**6, size=3000)
    tail = (rng.pareto(0.6, size=400) * 1e9).astype(np.int64)
    neg = -(rng.pareto(0.7, size=200) * 1e8).astype(np.int64)
    vals = np.concatenate([bulk, tail, neg]).astype(np.int64)
    assert int(vals.max()) - int(vals.min()) >= 1 << 40
    rows = [("m", int(v)) for v in vals]
    df = spark.createDataFrame(rows, "event_type string, cents bigint")
    pcts = (10, 50, 90, 99)
    got = {
        r.q_pct: (r.n, r.k, r.value_cents)
        for r in quantile_select_frame(df, pcts=pcts).collect()
    }
    s = np.sort(vals)
    n = len(s)
    for p in pcts:
        k = (n - 1) * p // 100 + 1
        assert got[p] == (n, k, int(s[k - 1])), p

    # the planted bound check: level tables by the plan's own formulas
    bs = sorted({_tdiv(int(v), QSEL_BUCKET) for v in vals})
    p1 = [_tdiv(b, QSEL_FAN) for b in bs]
    p2 = [_tdiv(x, QSEL_FAN) for x in p1]
    p3 = [_tdiv(x, QSEL_FAN) for x in p2]
    cap = 1 << 17

    def max_group(children, parents):
        sizes: dict[int, set[int]] = {}
        for c, p in zip(children, parents):
            sizes.setdefault(p, set()).add(c)
        return max(len(v) for v in sizes.values())

    assert max_group(bs, p1) <= cap  # base window (type, p1) order by b
    assert max_group(p1, p2) <= cap  # (type, p2) order by p1
    assert max_group(p2, p3) <= cap  # (type, p3) order by p2
    assert len(set(p3)) <= 1 << 8  # top per-type window
    # and the raw axis really WAS unbounded-scale: without the
    # hierarchy the single per-type window would sort every base bucket
    assert (max(bs) - min(bs)) > cap  # value range forces > 2^17 buckets


@pytest.mark.parametrize("seed", [7, 211])
def test_gini_closed_form_vs_pairwise(spark, seed):
    """The Gini mean-absolute-difference closed form rides the same
    ladder at VALUE grain (bucket width 1) — fuzz it on wide-range
    distributions with planted ties vs the literal pairwise sum."""
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        QSEL_FAN,
        _hier_cum,
    )

    rng = np.random.RandomState(seed)
    vals = np.concatenate(
        [
            rng.randint(0, 10**6, size=500),
            (rng.pareto(0.7, size=80) * 1e9).astype(np.int64),
            np.repeat(rng.randint(0, 10**4, size=10), 5),  # planted ties
        ]
    ).astype(np.int64)
    df = spark.createDataFrame([(int(v),) for v in vals], "m bigint")
    vc = (
        df.groupBy("m")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("all").alias("event_type"), F.col("m").alias("b"), "cnt")
        .withColumn("p1", F.expr(f"b DIV {QSEL_FAN}"))
    )
    bcum, ntab = _hier_cum(vc)
    got = (
        bcum.join(ntab, "event_type")
        .select(
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
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    s = np.sort(vals)
    n = len(s)
    want = sum(
        int(v) * (2 * (i + 1) - n - 1) for i, v in enumerate(s)
    )  # == sum over unordered pairs of |xi - xj|
    assert int(got) == want
