"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``neomarket_clickhouse_indexer_spark``; this file is
a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neomarket_clickhouse_indexer_spark.queries import oracle_sql_map, queries_map

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's headline feature — OHLCV candles from
    a pre-aggregated 1-minute tier (reference candles_1m materialized view,
    clickhouse/init/001_create_tables.sql:403-430; <300ms vs 6s raw-scan,
    README.md:12) — re-bucketed to 5 minutes from partial states."""
    from neomarket_clickhouse_indexer_spark.queries.events import candles_5m_rebucketed

    return candles_5m_rebucketed(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-data-pipeline operators)."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query in :func:`queries`."""
    return oracle_sql_map()
