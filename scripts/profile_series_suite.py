#!/usr/bin/env python3
"""Per-path cost profile of the two heaviest window slots
(events_series_suite 18.1s, user_segmentation_suite 12.6s in the r10
final-sim profile) — the r8 eager-checkpoint timer lesson applies: each
path is timed via its own eager localCheckpoint off the SAME persisted
subtrees the suite builds, so the numbers decompose the suite's real
gate cost instead of lazy-plan noise.

Usage: python3 scripts/profile_series_suite.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.session import get_spark
from neomarket_clickhouse_indexer_spark.queries import timeseries_q as TS


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile_series_suite", cores=32)
    # mimic the plain driver session: 200 shuffle partitions
    spark.conf.set("spark.sql.shuffle.partitions", "200")

    t0 = time.perf_counter()
    TS.events_series_suite(spark, sf_dir)
    print(f"FULL events_series_suite: {time.perf_counter() - t0:.2f}s",
          flush=True)

    n_par = spark.sparkContext.defaultParallelism
    # per-path timings mirror the suite body exactly: same conf pin, same
    # persisted subtrees (incl. the r11 shared value-grain histograms)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_par))
    ev = TS._events_cents(spark, sf_dir).persist()
    ev.count()
    cents2 = ev.select("event_type", "cents")
    hourly = TS._hourly_frame(ev).persist()
    hourly.count()
    hourly_n = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .repartition(n_par, "event_type")
        .persist()
    )
    hourly_n.count()
    hist2 = (
        ev.groupBy(
            "event_type",
            (F.dayofmonth("ts") <= TS.QD_SPLIT_DAY).cast("int").alias(
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

    from neomarket_clickhouse_indexer_spark.queries.events import (
        bag_setops_frame,
        growth_accounting_frame,
        props_bucket_agg,
    )

    paths = {
        "qsel": lambda: TS.quantile_select_frame(
            cents2, bounded_axis=True, _hist=hist
        ),
        "mad": lambda: TS.mad_outliers_frame(cents2, _hist=hist),
        "autocov": lambda: TS.autocov_frame(hourly),
        "forecast": lambda: TS.forecast_backtest_frame(hourly),
        "qdigest": lambda: TS.qdigest_frame(cents2, _hist=hist),
        "props": lambda: props_bucket_agg(spark, sf_dir),
        "cusum": lambda: TS.cusum_alarms_frame(hourly_n),
        "ctr": lambda: TS.counter_delta_frame(ev),
        "qdmerge": lambda: TS.qdigest_merge_frame(ev, _hist2=hist2),
        "robust": lambda: TS.robust_means_frame(cents2, _hist=hist),
        "seasonal": lambda: TS.seasonal_residual_frame(
            hourly.withColumn("hod", F.col("x") % 24).repartition(
                n_par, "event_type")),
        "drift": lambda: TS.value_drift_frame(ev),
        "ab": lambda: TS.ab_arm_stats_frame(ev),
        "xcorr": lambda: TS.xcorr_frame(hourly),
        "markov": lambda: TS.transition_matrix_frame(ev),
        "ewma": lambda: TS.ewma_control_frame(hourly),
        "bitmap": lambda: TS.day_bitmap_frame(ev),
        "growth": lambda: growth_accounting_frame(ev),
        "bagops": lambda: bag_setops_frame(ev),
    }
    rows = []
    for name, fn in paths.items():
        t0 = time.perf_counter()
        fn().localCheckpoint(eager=True)
        dt = time.perf_counter() - t0
        rows.append((dt, name))
        print(f"  path {name}: {dt:.2f}s", flush=True)
    for dt, name in sorted(rows, reverse=True):
        print(f"SORTED {name}: {dt:.2f}s")
    for f in (hourly_n, hourly, hist2, hist, ev):
        f.unpersist()
    spark.conf.set("spark.sql.shuffle.partitions", "200")

    t0 = time.perf_counter()
    TS.user_segmentation_suite(spark, sf_dir)
    print(f"FULL user_segmentation_suite: {time.perf_counter() - t0:.2f}s",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
