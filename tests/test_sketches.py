"""Mergeable cardinality sketches (A7's -State/-Merge discipline applied to
distinct counts): per-partition HLL sketch states union-merge to the global
estimate — the scale path for uniqExact-style columns when exact re-count
is too expensive (SURVEY §1.2: "uniqExact state ≈ keep key set or use
approx_count_distinct sketch"). Approximate algorithms have no cross-engine
oracle, so this is pytest-gated: estimates must land within 5% of exact and
the merge must be grouping-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_hll_sketch_merges_match_direct_estimate(spark):
    ev = load_table(spark, SF, "events")

    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]

    # direct whole-table sketch
    direct = ev.select(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est")
    ).collect()[0]["est"]

    # partial states per day, merged — the AggregatingMergeTree shape:
    # daily sketch rows persist, the total is a cheap union of states
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).collect()[0]["est"]

    # a DIFFERENT partitioning must merge to the same estimate (the sketch
    # is grouping-invariant, so incremental/partial builds are safe)
    by_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged2 = by_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).collect()[0]["est"]

    assert merged == direct == merged2, (merged, direct, merged2)
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_hll_estimate_tracks_exact_per_group(spark):
    ev = load_table(spark, SF, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["est"] - r["exact"]) / max(r["exact"], 1) < 0.05, r


def test_percentile_approx_tracks_exact(spark):
    """The sketch path for type_value_percentiles: percentile_approx
    (Greenwald-Khanna at accuracy 10000) must land within 1% relative
    error of the exact type-7 percentile per group."""
    ev = load_table(spark, SF, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.9)").alias("exact"),
            F.expr("percentile_approx(value, 0.9, 10000)").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / abs(r["exact"]) < 0.01, r


def test_cms_shard_sketches_merge_to_whole(spark):
    """Count-min mergeability: sketches built independently on disjoint
    corpus shards, merged by summing (row, bucket) cells, must equal the
    whole-corpus sketch EXACTLY — the property that lets 1000 executors
    sketch their shards and OR the results. Holds exactly (not
    approximately) because a CMS cell is a plain sum."""
    from neomarket_clickhouse_indexer_spark.functions import text as TX
    from neomarket_clickhouse_indexer_spark.queries.documents import CMS_D, CMS_W

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")

    def sketch(frame):
        toks = frame.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        buckets = F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"cms{i}:"), F.col("token"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % CMS_W
                for i in range(CMS_D)
            ]
        )
        return (
            toks.select(F.posexplode(buckets).alias("row", "bucket"))
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    whole = sketch(docs).toPandas().set_index(["row", "bucket"]).sort_index()
    shard_a = sketch(docs.filter(F.col("doc_id") % 2 == 0))
    shard_b = sketch(docs.filter(F.col("doc_id") % 2 == 1))
    merged = (
        shard_a.unionByName(shard_b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
        .toPandas()
        .set_index(["row", "bucket"])
        .sort_index()
    )
    assert merged.equals(whole)


def test_hll_register_histogram_estimate_tracks_exact(spark):
    """The r8 from-scratch HLL gate emits the register histogram; the
    float estimate is a pure function of it. Standard HLL with the
    small-range linear-counting correction must track the exact
    per-type distinct-user count within the b=8 error envelope."""
    import math

    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        HLL_B,
        events_hll_register_histogram,
    )
    from neomarket_clickhouse_indexer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    m = 1 << HLL_B
    hist: dict[str, dict[int, int]] = {}
    for r in events_hll_register_histogram(spark, sf).collect():
        hist.setdefault(r.event_type, {})[r.rho] = r.n_registers
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    alpha = 0.7213 / (1 + 1.079 / m)
    for et, h in hist.items():
        used = sum(h.values())
        zeros = m - used
        s = zeros * 1.0 + sum(n * (2.0 ** -rho) for rho, n in h.items())
        e = alpha * m * m / s
        if e <= 2.5 * m and zeros > 0:
            e = m * math.log(m / zeros)  # linear counting
        assert abs(e - exact[et]) / exact[et] < 0.16, (et, e, exact[et])


def test_ab_arm_stats_welch_matches_numpy(spark):
    """The Welch t statistic derived from the gate's exact sufficient
    statistics must equal the direct numpy computation on the raw
    per-arm samples (proves the reduction loses nothing)."""
    import numpy as np
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        _events_cents,
        events_ab_arm_stats,
    )

    sf = "/root/testdata/sf0.001"
    stats = {
        (r.event_type, r.arm): (r.n, r.sum_cents, int(r.sumsq_cents))
        for r in events_ab_arm_stats(spark, sf).collect()
    }
    ev = _events_cents(spark, sf).select(
        "event_type",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).alias("h"),
        "cents",
    ).collect()
    raw: dict[tuple[str, str], list[int]] = {}
    for r in ev:
        arm = "A" if r.h in "01234567" else "B"
        raw.setdefault((r.event_type, arm), []).append(r.cents)
    types = {t for t, _ in stats}
    for t in types:
        for arm in ("A", "B"):
            xs = np.array(raw[(t, arm)], dtype=np.float64)
            n, s, q = stats[(t, arm)]
            assert n == len(xs) and s == int(xs.sum())
            assert q == int((xs.astype(object) ** 2).sum())
        # Welch t from sufficient stats vs numpy means/variances
        def welch_from_stats(a, b):
            (na, sa, qa), (nb, sb, qb) = a, b
            ma, mb = sa / na, sb / nb
            va = (qa - na * ma * ma) / (na - 1)
            vb = (qb - nb * mb * mb) / (nb - 1)
            return (ma - mb) / np.sqrt(va / na + vb / nb)

        t_stats = welch_from_stats(stats[(t, "A")], stats[(t, "B")])
        xa = np.array(raw[(t, "A")], dtype=np.float64)
        xb = np.array(raw[(t, "B")], dtype=np.float64)
        t_np = (xa.mean() - xb.mean()) / np.sqrt(
            xa.var(ddof=1) / len(xa) + xb.var(ddof=1) / len(xb)
        )
        assert abs(t_stats - t_np) < 1e-9, (t, t_stats, t_np)


def test_value_drift_psi_matches_numpy(spark):
    """PSI derived from the drift gate's exact histogram equals a direct
    numpy computation over the raw halves (smoothed shares — the
    standard epsilon guard for empty cells — applied identically)."""
    import numpy as np
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        QD_SPLIT_DAY,
        QSEL_BUCKET,
        _events_cents,
        events_value_drift,
    )

    sf = "/root/testdata/sf0.001"
    rows = events_value_drift(spark, sf).collect()
    raw = _events_cents(spark, sf).select(
        "event_type",
        F.expr(f"cents DIV {QSEL_BUCKET}").alias("b"),
        (F.dayofmonth("ts") <= QD_SPLIT_DAY).cast("int").alias("fh"),
    ).collect()
    eps = 1e-6
    types = {r.event_type for r in rows}
    for t in types:
        # PSI from the gate histogram
        g = [r for r in rows if r.event_type == t]
        t1, t2 = sum(r.n_first for r in g), sum(r.n_second for r in g)
        psi_gate = sum(
            (max(r.n_first / t1, eps) - max(r.n_second / t2, eps))
            * np.log(max(r.n_first / t1, eps) / max(r.n_second / t2, eps))
            for r in g
        )
        # PSI from the raw rows
        from collections import Counter

        c1 = Counter(r.b for r in raw if r.event_type == t and r.fh == 1)
        c2 = Counter(r.b for r in raw if r.event_type == t and r.fh == 0)
        n1, n2 = sum(c1.values()), sum(c2.values())
        assert (n1, n2) == (t1, t2)
        psi_raw = sum(
            (max(c1.get(b, 0) / n1, eps) - max(c2.get(b, 0) / n2, eps))
            * np.log(
                max(c1.get(b, 0) / n1, eps) / max(c2.get(b, 0) / n2, eps)
            )
            for b in set(c1) | set(c2)
        )
        assert abs(psi_gate - psi_raw) < 1e-12, (t, psi_gate, psi_raw)


def test_type_xcorr_pearson_matches_numpy(spark):
    """Pearson r derived from the xcorr gate's exact sufficient stats
    must equal numpy's corrcoef on the aligned raw hourly series (proves
    the integer reduction loses nothing — the Welch/PSI doctrine)."""
    import numpy as np
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        _events_cents,
        _hourly_frame,
        events_type_xcorr,
    )

    sf = "/root/testdata/sf0.001"
    stats = {
        (r.type_a, r.type_b, r.lag_h): (
            r.n_pairs, r.sum_a, r.sum_b, int(r.sum_ab), int(r.cov_num)
        )
        for r in events_type_xcorr(spark, sf).collect()
    }
    assert stats, "xcorr gate returned no pairs"
    series: dict[str, dict[int, int]] = {}
    for r in _hourly_frame(_events_cents(spark, sf)).collect():
        series.setdefault(r.event_type, {})[r.x] = r.s
    checked = 0
    for (ta, tb, lag), (n, sa, sb, sab, cov) in stats.items():
        xs, ys = [], []
        for x, b in series[tb].items():
            a = series[ta].get(x - lag)
            if a is not None:
                xs.append(a)
                ys.append(b)
        assert n == len(xs) and sa == sum(xs) and sb == sum(ys)
        assert sab == sum(a * b for a, b in zip(xs, ys))
        if n < 2:
            continue
        a_arr = np.array(xs, dtype=np.float64)
        b_arr = np.array(ys, dtype=np.float64)
        if a_arr.std() == 0 or b_arr.std() == 0:
            continue
        # r from the exact integer stats
        var_a = n * sum(v * v for v in xs) - sa * sa
        var_b = n * sum(v * v for v in ys) - sb * sb
        r_stats = cov / np.sqrt(float(var_a) * float(var_b))
        r_np = np.corrcoef(a_arr, b_arr)[0, 1]
        assert abs(r_stats - r_np) < 1e-9, (ta, tb, lag, r_stats, r_np)
        checked += 1
    assert checked > 0


def test_bag_setops_closed_form(spark):
    """exceptAll/intersectAll multiplicities must equal the closed form
    max(p-c, 0) / min(p, c) of the per-user event counts."""
    from pyspark.sql import functions as F

    from neomarket_clickhouse_indexer_spark.queries.events import (
        events_bag_setops,
    )
    from neomarket_clickhouse_indexer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.op, r.user_id): r.multiplicity
        for r in events_bag_setops(spark, sf).collect()
    }
    counts: dict[int, list[int]] = {}
    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in ev:
        counts.setdefault(r.user_id, [0, 0])[
            0 if r.event_type == "purchase" else 1
        ] = r.n
    want = {}
    for u, (p, c) in counts.items():
        if p - c > 0:
            want[("except_all", u)] = p - c
        if min(p, c) > 0:
            want[("intersect_all", u)] = min(p, c)
    assert got == want
