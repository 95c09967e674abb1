"""Semantic tests for the training-data pipeline operators beyond the
differential gate: LSH recall vs exact, near-dup detection on planted
duplicates, simhash locality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.queries.documents import (
    docs_near_dup_pairs,
)
from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    knn_ann_lsh,
    knn_bruteforce,
)

from .conftest import SF_SMOKE


def test_ann_results_are_subset_of_exact_ranking(spark):
    """Every ANN hit must be a real corpus vector with its exact cosine —
    i.e. ANN(q) ⊆ brute-force ranking with identical scores."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in knn_bruteforce(spark, SF_SMOKE).collect()
    }
    # brute force keeps top-10; extend: ANN hits outside top-10 just need a
    # consistent score, so recompute full pairs when missing is fine — here
    # we assert the stronger property only for pairs brute-force kept.
    ann = knn_ann_lsh(spark, SF_SMOKE).collect()
    assert ann, "LSH buckets produced no candidates at all"
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert exact[key] == r["cosine_sim"]


def test_minhash_finds_planted_near_duplicates(spark, tmp_path):
    """Plant near-identical documents → LSH candidate pairs must surface
    them (recall on true near-dups), and exact text twins always collide."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest while the hunter sleeps soundly"
    )
    variant = base.replace("hunter", "farmer")  # 1-word edit
    unrelated = "completely different tokens " + " ".join(
        f"zz{i}" for i in range(20)
    )
    rows = [(0, base, "en", "s", len(base)),
            (1, base, "en", "s", len(base)),
            (2, variant, "en", "s", len(variant)),
            (3, unrelated, "en", "s", len(unrelated))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    pairs = {(r["doc_a"], r["doc_b"]) for r in docs_near_dup_pairs(spark, sf_dir).collect()}
    assert (0, 1) in pairs, "identical twins must share every band"
    assert (0, 2) in pairs or (1, 2) in pairs, "1-word edit should collide in ≥1 band"
    assert not any(3 in p for p in pairs), "unrelated doc must not collide"


def test_simhash_locality(spark, tmp_path):
    from neomarket_clickhouse_indexer_spark.queries.documents import docs_simhash

    base = " ".join(f"tok{i}" for i in range(60))
    variant = base.replace("tok30", "tokX")
    other = " ".join(f"zz{i}" for i in range(60))
    rows = [(0, base, "en", "s", 1), (1, variant, "en", "s", 1), (2, other, "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    sig = {r["doc_id"]: r["simhash"] for r in docs_simhash(spark, str(tmp_path)).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sig[0], sig[1]) <= hamming(sig[0], sig[2]), (
        "near-dup must not be farther than an unrelated doc"
    )
    assert hamming(sig[0], sig[1]) <= 4


def test_connected_components_planted_chain(spark):
    from neomarket_clickhouse_indexer_spark.operators.clusters import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_doc_bands_persisted_table_reused(spark):
    """doc_bands_table builds the LSH signature table once (MV analog) and
    subsequent reads return the identical persisted rows."""
    import os

    from neomarket_clickhouse_indexer_spark.queries.documents import (
        _doc_bands,
        doc_bands_table,
    )

    t1 = doc_bands_table(spark, SF_SMOKE)
    path = t1.inputFiles()[0]
    assert "/tmp/nmci_doc_bands_" in path
    # second call must read the persisted table, not rebuild
    t2 = doc_bands_table(spark, SF_SMOKE)
    assert sorted(t2.inputFiles()) == sorted(t1.inputFiles())
    # persisted rows == freshly computed rows
    fresh = {tuple(r) for r in _doc_bands(spark, SF_SMOKE).collect()}
    stored = {tuple(r) for r in t1.collect()}
    assert fresh == stored and len(stored) > 0


def test_ivf_recall_improves_monotonically_with_nprobe(spark):
    """recall@3 vs the exact ranking must be non-decreasing in nprobe, and
    probing every cell must reach recall 1.0 (IVF degenerates to exact)."""
    from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
        knn_bruteforce,
        knn_ivf,
    )
    from neomarket_clickhouse_indexer_spark.sources.tables import load_table

    exact = {}
    for r in knn_bruteforce(spark, SF_SMOKE).filter(F.col("rank") <= 3).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_labels = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("label").distinct().count()
    )

    def recall(nprobe: int) -> float:
        got = {}
        for r in knn_ivf(spark, SF_SMOKE, nprobe=nprobe).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & s) for q, s in exact.items())
        return hits / sum(len(s) for s in exact.values())

    recalls = [recall(p) for p in (1, 2, n_labels)]
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls
