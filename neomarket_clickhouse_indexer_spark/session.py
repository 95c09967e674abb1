"""SparkSession builder tuned for this engine.

Local testing runs ``local[N]`` single-JVM; the configs below are chosen so
the same logical plans scale to a real multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB, static
  partition counts are always wrong; AQE re-plans from actual map output.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  should be ~2-3× total cores (AQE coalesces the excess).
- Arrow enabled: every pandas-UDF operator (FIFO ledger, vector ops) moves
  data in columnar batches, not pickled rows.
- UTC session timezone: event timestamps are instants; all bucketing
  (candles, rollups) must be timezone-stable across engines/oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "neomarket_clickhouse_indexer_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
