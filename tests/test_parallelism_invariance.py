"""Results must not depend on physical parallelism: the same query at
shuffle.partitions=3 and =32 must produce identical rows. Catches hidden
order dependence (first()/head-of-partition semantics, float accumulation
order) — the classic way a query that passes single-threaded breaks on a
1000-executor cluster. Queries chosen for order-sensitive internals:
running windows, FIFO matching, argMin/argMax candles, merge-paginate,
salted aggregation."""

from __future__ import annotations

import pandas as pd
import pytest

from neomarket_clickhouse_indexer_spark.queries.registry import REGISTRY

SF = "/root/testdata/sf0.001"

QUERIES = [
    "user_running_value",
    "fifo_user_pnl",
    "candles_1m",
    "merged_timeline_page",
    "skewed_type_volume",
    "user_sessions",
    # r5 additions, chosen for order-sensitive internals: FIFO open-lot
    # walk + last-price mark; per-subspace Lloyd -> codes -> ADC top-k;
    # per-shard position windows
    "fifo_pnl_modes_unrealized",
    "knn_pq_adc",
    "docs_shuffle_shards",
    # r5b additions: max_by cluster argmax + pair-scan prune; dsum'd BM25
    # term sums + ranked top-k; lag-window island merge; window cumsum
    # packing over a sampled subset
    "semdedup_prune",
    "docs_bm25_search",
    "docs_dup_ngram_spans",
    "docs_sample_pack",
    # r5c additions: rarest-first row_number prefix ranking (window over a
    # broadcast-joined df table); per-source cumulative-weight boundary
    # crossing (window cumsum + sequence explode)
    "docs_setsim_join",
    "docs_weighted_sample",
    # md5-ranked quota fill over a broadcast quota table
    "docs_training_mix",
    # late-r5 additions: Lindley closed form (window cumsum + running
    # max); sequential LTTB kernel (whole-series applyInPandas group —
    # must not depend on how partitions feed the group); bottom-K hash
    # reservoir + global merge window; iterative message passing with
    # explicit repartition widths; bucket-expansion pair dedup
    "events_sequence_match",
    "events_lttb_downsample",
    "docs_kmv_distinct",
    "supplier_pagerank",
    "supplier_shipment_overlap",
    # r8 additions, chosen for order-sensitive internals: the
    # hierarchical prefix-sum ladder (join-reassembled running counts);
    # running-cummax drawdown fold; per-purchase remainder assignment
    # (row_number over (v_ts, v_id)); synchronous-LPA argmax rounds with
    # per-round checkpoints; register max + histogram; Q21 top-k with
    # (numwait, suppkey) total order
    "user_volume_concentration",
    "user_max_drawdown",
    "events_multitouch_attribution",
    "parts_coorder_communities",
    "events_hll_register_histogram",
    "suppliers_kept_waiting",
    "user_gini_inequality",
    # r9 additions, chosen for order-sensitive internals: the EWMA
    # F.aggregate fold (sequential state over a collected sorted array);
    # the per-user LAG adjacency; bit_or/bit_and merge order; the
    # streamed additive leaderboard fold (3 microbatches whose merge
    # order must not matter); pivot column fill
    "events_ewma_control",
    "events_type_transition_matrix",
    "events_day_bitmap_stats",
    "streaming_leaderboard_1h",
    "events_daily_type_pivot",
    # r11 additions, chosen for order-sensitive internals: the layered
    # descent's per-hop beam cut + pooled layer builds (three concurrent
    # NSW builds whose bucket-cap windows must not race); the residual
    # Lloyd chain -> cell-restricted ADC -> exhaustive in-cell re-rank
    "knn_hnsw_search",
    "knn_ivfpq_adc",
    # Hamming ties are dense (integer distances 0..64) — the id
    # tiebreak must hold across partitionings
    "knn_bq_hamming",
]


def _run_sorted(spark, name):
    df = REGISTRY[name].fn(spark, SF).toPandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitioning(name, spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _run_sorted(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        high = _run_sorted(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    pd.testing.assert_frame_equal(low, high)
