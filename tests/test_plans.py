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


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_queries_take_ordered_no_unbounded_window(spark):
    """The round-1 scale-killers (global row_number for top-k/pagination)
    must plan as TakeOrderedAndProject, and every Window node must have a
    non-empty partition spec with its input bounded by the preceding limit
    (WindowExec's 'No Partition Defined ... single partition' path must
    never appear)."""
    import re

    for name in ("lineitem_page", "top_users_by_volume", "party_volume_union"):
        plan = _physical(_q(name, spark))
        assert "TakeOrderedAndProject" in plan, f"{name}: no TakeOrdered\n{plan}"
        # every Window's spec list (2nd bracket group after windowspecdefinition
        # args) must be non-empty: "Window [exprs], [partSpec], [orderSpec]"
        for m in re.finditer(r"Window \[[^\n]*?\], (\[[^\]]*\]), \[", plan):
            assert m.group(1) != "[]", f"{name}: unpartitioned Window\n{plan}"
        # the Window (if any) must sit above the TakeOrdered, i.e. bounded
        if "Window" in plan:
            assert plan.index("Window") < plan.index("TakeOrderedAndProject"), (
                f"{name}: Window below the limit (unbounded input)\n{plan}"
            )


def test_select_top_wallets_take_ordered(spark):
    from neomarket_clickhouse_indexer_spark.ledger.jobs import select_top_wallets
    from neomarket_clickhouse_indexer_spark.queries.events import _domain_events

    df = select_top_wallets(_domain_events(spark, SF_CORRECTNESS), n=50)
    plan = _physical(df)
    assert "TakeOrderedAndProject" in plan
    assert df.count() <= 50


def test_contamination_broadcasts_eval_grams(spark):
    # the eval fingerprint set must be the broadcast side — the training
    # corpus must never shuffle for the probe (100 TB shape)
    df = _q("docs_contamination", spark)
    problems = plan_asserts(df, broadcast_joins=1, partial_agg=True)
    assert not problems, problems


def test_quality_filter_no_agg_shuffle(spark):
    import re

    df = _q("docs_quality_filter", spark)
    plan = explain_str(df)
    # pure per-row rules: the only permitted Exchange is the small-corpus
    # round-robin spread (a no-op at real scale); no hash/range exchange —
    # the rules stream through the scan with no aggregation shuffle
    exchanges = re.findall(r"\(\d+\) Exchange (\w+)", plan)
    assert all(kind == "RoundRobinPartitioning" for kind in exchanges), (
        "quality filter must have no hash/range shuffle:\n" + plan
    )
    assert "HashAggregate" not in plan


def test_tf_keywords_broadcasts_df_and_partitions_window(spark):
    df = _q("docs_tf_keywords", spark)
    plan = explain_str(df)
    problems = plan_asserts(df, broadcast_joins=1, partial_agg=True)
    assert not problems, problems
    assert "No Partition Defined" not in plan
    # per-doc window must be partitioned by doc_id, never global
    assert "partitionBy" not in plan or "doc_id" in plan


def test_reorg_replay_no_cartesian_and_partial_agg(spark):
    # the 1-row max-ts frame must join as a broadcast HASH join (a bare
    # lit() key would constant-fold back into a nested-loop cartesian)
    df = _q("reorg_replay_counts", spark)
    problems = plan_asserts(df, broadcast_joins=1, partial_agg=True)
    assert not problems, problems


def test_parity_audit_take_ordered_not_global_window(spark):
    import re

    df = _q("leaderboard_parity_audit", spark)
    plan = explain_str(df)
    assert re.search(r"TakeOrderedAndProject", plan), (
        "top-k sides must plan as TakeOrdered:\n" + plan
    )


def test_wallet_event_scans_partitioned_window(spark):
    # S9: the per-wallet scan is one window pass PARTITIONED by wallet —
    # a global (unpartitioned) window here would funnel every event
    # through one task at scale
    import re

    df = _q("wallet_event_scans", spark)
    plan = explain_str(df)
    # the Window detail's partition-spec list must be [user_id ...]
    m = re.search(
        r"\(\d+\) Window\n(?:Input[^\n]*\n)?Arguments: \[[^\n]*\], \[user_id",
        plan,
    )
    assert m, "window must partition by user_id:\n" + plan
    # WindowGroupLimit = the rank<=k predicate pushed below the shuffle
    assert "WindowGroupLimit" in plan, plan
    problems = plan_asserts(df, pushed_filters=["user_id"])
    assert not problems, problems


def test_optional_filter_pages_take_ordered(spark):
    # P6: each parameter set's page must compile to TakeOrderedAndProject
    # with its filters pushed to the scan — no global sort, no post-scan
    # filtering of unpushed conjuncts
    import re

    df = _q("optional_filter_trades", spark)
    plan = explain_str(df)
    tree = plan.split("\n\n(1)")[0]
    assert len(re.findall(r"TakeOrderedAndProject", tree)) == 2, plan
    problems = plan_asserts(df, pushed_filters=["event_type", "value"])
    assert not problems, problems


def test_adaptive_window_single_scan_partial_agg(spark):
    # T6: both candidate windows fold in ONE conditional aggregation pass
    # over ONE scan — the serve layer's retry loop becomes a single job
    import re

    df = _q("adaptive_window_trades", spark)
    plan = explain_str(df)
    tree = plan.split("\n\n(1)")[0]
    assert len(re.findall(r"Scan parquet", tree)) == 1, plan
    problems = plan_asserts(df, pushed_filters=["event_type"],
                            partial_agg=True)
    assert not problems, problems


def test_validation_quarantine_single_pass(spark):
    # P9: all guard counters fold in one partial-aggregated pass
    df = _q("validation_quarantine", spark)
    problems = plan_asserts(df, partial_agg=True)
    assert not problems, problems


def test_skewed_agg_two_phase_salted(spark):
    # hot-key mitigation: first Exchange must hash on (event_type, __salt),
    # the final merge on event_type alone
    import re

    df = _q("skewed_type_volume", spark)
    plan = explain_str(df)
    exchanges = re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan)
    assert any("__salt" in e and "event_type" in e for e in exchanges), plan
    assert any("__salt" not in e and "event_type" in e for e in exchanges), plan


def test_watermark_window_partitioned_by_stream(spark):
    # ST5: the per-stream running-max watermark must be a WindowExec
    # partitioned by event_type — round 3's verdict flagged the previous
    # forced single-partition window (pmod(xxhash64(lit),1)) as the last
    # whole-table-through-one-task plan in the repo
    import re

    df = _q("watermark_accept_counts", spark)
    plan = explain_str(df)
    m = re.search(
        r"\(\d+\) Window\n(?:Input[^\n]*\n)?Arguments: \[[^\n]*\], \[event_type",
        plan,
    )
    assert m, "watermark window must partition by event_type:\n" + plan
    assert "pmod" not in plan, "single-partition pmod key resurfaced:\n" + plan


def test_kmeans_step_broadcasts_seeds_partial_agg(spark):
    # VS2+: the Lloyd scoring pass must broadcast the K seeds against the
    # corpus (BroadcastNestedLoopJoin over a tiny broadcast side — the
    # designed linear-scan probe, same shape as knn_ivf) and the
    # (cluster, dim) mean must be a two-phase aggregate
    df = _q("kmeans_lloyd_step", spark)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    problems = plan_asserts(df, partial_agg=True, forbid_cartesian=False)
    assert not problems, problems


def test_hybrid_near_dup_no_cartesian(spark):
    # DD2+DD3: the cosine verification joins only the LSH candidate set to
    # embeddings — keyed joins throughout, never a pair blow-up
    df = _q("docs_hybrid_near_dup", spark)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_user_sessions_partial_agg_single_shuffle(spark):
    # ST5+: session_window agg shuffles once on user_id and keeps the
    # two-phase aggregate (partial session assembly map-side)
    import re

    df = _q("user_sessions", spark)
    plan = explain_str(df)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, "sessionization should shuffle once:\n" + plan
