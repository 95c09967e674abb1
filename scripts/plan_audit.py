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
}
for name in sorted(REGISTRY):
    if name == "domain_ledger_summary":  # triggers eager work; skip plan-only audit
        pass
    try:
        df = REGISTRY[name].fn(spark, sf)
        plan = explain_str(df, "simple")
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in INTENTIONAL_CROSS:
            flags.append("BNLJ")
        n_ex = plan.count("Exchange")
        if flags:
            print(f"{name}: {' '.join(flags)} (exchanges~{n_ex})")
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:120]}")
print("audit done")
