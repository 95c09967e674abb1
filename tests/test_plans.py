"""Plan-quality gate: pushdown, pruning, broadcast, partial aggregation —
asserted on the physical plans of headline queries (SURVEY §4: what
ClickHouse gives the reference, Catalyst must actually give us)."""

from __future__ import annotations

from neomarket_clickhouse_indexer_spark.plans import explain_str, plan_asserts
from neomarket_clickhouse_indexer_spark.queries import REGISTRY

from .conftest import SF_CORRECTNESS


def _q(name, spark):
    return REGISTRY[name].fn(spark, SF_CORRECTNESS)


def test_pricing_summary_pushdown_and_pruning(spark):
    df = _q("pricing_summary", spark)
    problems = plan_asserts(
        df,
        pushed_filters=["l_shipdate"],
        read_schema_only=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
        partial_agg=True,
    )
    assert not problems, problems


def test_shipping_priority_broadcasts_dims(spark):
    df = _q("shipping_priority", spark)
    problems = plan_asserts(
        df,
        pushed_filters=["l_shipdate"],
        broadcast_joins=1,
    )
    assert not problems, problems


def test_regional_volume_broadcasts_all_dims(spark):
    df = _q("regional_supplier_volume", spark)
    problems = plan_asserts(df, broadcast_joins=3, partial_agg=True)
    assert not problems, problems


def test_candles_partial_agg_single_shuffle(spark):
    import re

    df = _q("candles_1m", spark)
    plan = explain_str(df)
    # formatted explain names each node once in the tree and once in the
    # detail section — count plan nodes "(N) Exchange", not substrings
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, (
        "candles_1m should shuffle exactly once (on key+bucket):\n" + plan
    )
    problems = plan_asserts(df, partial_agg=True)
    assert not problems, problems


def test_latest_event_filter_prunes_columns(spark):
    df = _q("latest_event_per_user", spark)
    problems = plan_asserts(
        df,
        read_schema_only=["user_id", "event_id", "event_type", "value", "ts"],
    )
    assert not problems, problems


def test_top_users_compiles_to_take_ordered_or_single_limit(spark):
    plan = explain_str(_q("top_users_by_volume", spark))
    # rank ≤ 10 via row_number over a fully-aggregated (150-row) frame —
    # the aggregation below it must still be two-phase
    assert "HashAggregate" in plan
