import sys, re
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
from neomarket_clickhouse_indexer_spark.session import get_spark
from neomarket_clickhouse_indexer_spark.queries import REGISTRY
from neomarket_clickhouse_indexer_spark.plans import explain_str
spark = get_spark('audit', cores=8, shuffle_partitions=8)
sf = '/root/testdata/sf0.01'
# Broadcast-probe patterns where a nested-loop join is the DESIGNED plan:
# the broadcast side is a bounded probe/threshold frame (query vectors,
# centroid probes, or a 1-row grand total), so the "nested loop" is a
# linear scan of the big side against an in-memory constant — the correct
# shape at any scale.
INTENTIONAL_CROSS = {
    "knn_bruteforce", "knn_bruteforce_batched", "near_dup_embeddings",
    "knn_ann_lsh", "knn_ivf",
    "knn_ivf_nprobe2",  # same broadcast centroid-probe as knn_ivf
    "kmeans_lloyd_step",  # broadcast seed-probe, corpus-linear by design
    "kmeans_train",  # same broadcast centroid-probe, iterated
    "knn_ivf_trained",  # trained-codebook probe, same broadcast shape
    "supplier_share_having",  # 1-row broadcast grand-total threshold
    "semdedup_prune",  # k-row broadcast centroid probe (same as knn_ivf)
    "docs_bm25_search",  # 1-row broadcast corpus stats (N, avgdl)
    "docs_mixture_weights",  # 1-row broadcast normalization totals
    "bloom_semijoin_filter",  # 1-row broadcast bloom bitmap probed per row
    "docs_training_mix",  # ~20-row broadcast quota frame (budget slots)
    "knn_recall_report",  # composes knn_bruteforce + knn_ann_lsh shapes
    "semantic_decontam",  # broadcast eval-split probe (same as knn_bruteforce)
    "knn_rank_fusion",  # composes knn_bruteforce + knn_ann_lsh shapes
    "docs_kmv_jaccard",  # 1-row-per-pair est/exact joins on literal keys
    "ann_index_audit",  # fuses knn_ivf + knn_pq_adc broadcast probes (r6)
    "knn_mmr_rerank",  # knn_bruteforce broadcast-probe shortlist build (r6)
    "events_key_skew_profile",  # 1-row totals x 1-row top-8 crossJoin
    "fk_integrity_audit",  # 1-row stats x 1-row orphan/parent crossJoins
    "join_cardinality_estimate",  # 1-row sampled x 1-row exact crossJoin
    "user_rfm_segments",  # 4-row broadcast quantile-threshold crossJoin
    "user_volume_concentration",  # 9-row broadcast threshold crossJoin
    # executes rfm + volume_concentration verbatim: same 4/9-row
    # broadcast threshold crossJoins (suites inherit component shapes)
    "user_segmentation_suite",
    "user_gini_inequality",  # 1-row abs-diff total x 1-row n/sum crossJoin
    # r11: the Hamming pass IS a deliberate code-table scan — 5-row
    # broadcast query codes against 8-byte/vector corpus codes (the BQ
    # first-pass-filter design; embeddings never shuffle)
    "knn_bq_hamming",
    # r11: the same n_cells-row broadcast centroid-probe as knn_ivf,
    # composed under the residual-PQ encode
    "knn_ivfpq_adc",
}

# Unpartitioned Window nodes single-partition-sort their whole input —
# fine ONLY over a provably bounded frame. Every entry here names the
# bound that keeps the frame small at ANY corpus scale; anything else
# that plans a global window is flagged.
BOUNDED_GLOBAL_WINDOW = {
    # this is the COMPLETE registry inventory of physical global-window
    # nodes (rerun with the allowlist emptied to regenerate); each line
    # states the bound that keeps the single-partition frame small at
    # any corpus scale
    "docs_kmv_distinct",  # merged bottom-K frame: <= K x #sources rows
    "docs_kmv_sketch",  # same merged bottom-K frame
    "docs_sketch_suite",  # executes docs_kmv_distinct: same bottom-K frame
    "docs_kmv_jaccard",  # bottom-K sketch merges: <= 2K rows per window
    "supplier_pagerank",  # rank window over the orderBy().limit(25) result
    "parts_coorder_triangles",  # rank window over orderBy().limit(20) result
    "parts_graph_suite",  # executes parts_coorder_triangles: same bound
    "supplier_similarity_cf",  # rank window over orderBy().limit(20) result
    "events_top_paths",  # rank over path-triple counts: <= |type enum|^3
    "events_funnel_dropoff",  # stage spine: one row per funnel stage (<=4)
    "events_cumulative_distinct_users",  # day spine: one row per active day
    "user_churn_hazard",  # duration spine: one row per calendar day
    # quantile_select_frame's TOP hierarchy window (partitionBy event_type
    # folds away under the literal 'm' axis) is <= 2^8 rows at ANY value
    # range: p3 = cents DIV 256 DIV 2^48 — the r8 hierarchical prefix-sum
    # (timeseries_q.QSEL_FAN; planted bound check in
    # tests/test_qsel_hierarchy.py)
    "user_volume_concentration",
    "user_segmentation_suite",  # executes the same pareto path: same bound
    "user_gini_inequality",  # same folded ladder-top window: <= 2^8 rows
}


def global_windows(plan: str) -> int:
    """Count physical Window nodes with no PARTITION BY. Rendering
    (verified on Spark 4.1): 3 top-level bracket groups = [funcs],
    [part], [order] (partitioned); 2 groups = EITHER [funcs], [order]
    (global, order group carries ASC/DESC markers) OR [funcs], [part]
    (partitioned, no order — not global); 1 group = global."""
    n = 0
    for line in plan.splitlines():
        m = re.match(r"^[\s+:*-]*Window (\[.*)$", line)
        if not m:
            continue
        rest, depth = m.group(1), 0
        groups: list[str] = []
        for ch in rest:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0:
                groups[-1] += ch
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(r" (ASC|DESC) ", groups[1]):
            continue  # [funcs], [part]: partitioned, just no order spec
        n += 1
    return n


for name in sorted(REGISTRY):
    if name in ("domain_ledger_summary", "docs_bpe_merges", "docs_bpe_encode",
                "docs_bpe_vocab_coverage",
                # LPA localCheckpoints eagerly per round at build time;
                # its final plan is checkpoint scans (nothing to audit)
                "parts_coorder_communities",
                # r9: eagerly checkpoints its 610-row union under scoped
                # shuffle parallelism; component shapes stay audited via
                # knn_ivf / knn_pq_adc / knn_ivf_incremental
                "ann_index_audit",
                # r9: runs the BPE training collects at build and
                # checkpoints its paths eagerly; component shapes stay
                # audited via docs_simhash / docs_vocab_growth
                "docs_tokenizer_suite",
                # r9 cache-pressure fix: these suites now checkpoint
                # eagerly at build and release their persisted subtrees;
                # component shapes stay audited via their standalone
                # entries
                "events_series_suite",
                "user_segmentation_suite",
                "docs_pair_recall_audit",
                # r10: NN-descent rounds checkpoint eagerly at build
                # (the k-core lineage doctrine); its bucket-window /
                # capped-pair-join shapes stay audited via
                # knn_mutual_pairs
                "knn_nsw_graph",
                # r10: beam search checkpoints eagerly per hop over the
                # eager graph build; its join/window shapes are the
                # audited knn_bruteforce / knn_mutual_pairs classes
                "knn_nsw_search",
                # r11: three eager layer builds + eager per-hop descent
                # checkpoints; same audited shapes as knn_nsw_graph /
                # knn_nsw_search
                "knn_hnsw_search",
                # r12: eager base build + attach/repair checkpoints;
                # same audited shapes as knn_nsw_graph
                "knn_nsw_incremental",
                "knn_hnsw_incremental",
                # r13: eager base build (memo-shared) + compaction
                # checkpoints; same audited shapes as knn_nsw_graph
                "knn_nsw_delete",
                "knn_hnsw_delete",
                "knn_nsw_reembed",
                # r14: eager insert+compaction+serve composition /
                # per-layer reembed compositions / eager rotated-frame
                # checkpoint + PQ Lloyd collects at build; same audited
                # shapes as knn_nsw_graph / knn_nsw_search / knn_pq_adc
                "knn_nsw_search_maintained",
                "knn_hnsw_reembed",
                "knn_opq_adc",
                # r13: eager checkpoint (pHash memo + union); the text
                # pair scan is the audited near_dup_embeddings class,
                # the band self-join the multimodal_frame_dedup class
                "multimodal_caption_audit",
                # r12 tail-shave: standalone forms now run pinned+eager
                # and release their persists; component shapes stay
                # audited via events_quantile_select (the selection
                # machinery) and docs_vocab_growth / docs_count_of_counts
                # (the tokenization grain)
                "user_rfm_segments",
                "docs_source_overlap",
                # r12: pHash codes.count() materializes at build; the
                # band self-join shape is the audited knn_bq_hamming /
                # docs_near_dup_pairs class
                "multimodal_frame_dedup",
                # r10: eager checkpoint under the scoped conf pin;
                # component shapes stay audited via docs_cms_counts /
                # docs_heavy_hitters / docs_kmv_distinct
                "docs_sketch_suite"):
        # these run eager work when built (ledger build; K BPE training
        # iterations with per-iteration argmax collects) — skip the
        # plan-only audit; their plans are vocabulary/ledger-bounded
        continue
    try:
        df = REGISTRY[name].fn(spark, sf)
        plan = explain_str(df, "simple")
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in INTENTIONAL_CROSS:
            flags.append("BNLJ")
        gw = global_windows(plan)
        if gw and name not in BOUNDED_GLOBAL_WINDOW:
            flags.append(f"GLOBAL_WINDOW x{gw}")
        n_ex = plan.count("Exchange")
        if flags:
            print(f"{name}: {' '.join(flags)} (exchanges~{n_ex})")
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:120]}")
print("audit done")
