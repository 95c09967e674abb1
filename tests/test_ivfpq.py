"""IVF-PQ residual-encoding pins at sf0.001: the driver gate hashes the
full deterministic output; THIS file pins the semantics behind it.

1. END-TO-END EXACTNESS IN THE PROBED CELL: fixture cells hold ~50
   vectors and _PQ_RERANK = 50, so the exact re-rank is exhaustive
   within the cell — the final top-10 must EQUAL a from-scratch numpy
   recompute of (probe rule -> exact in-cell d2 ranking). This pins the
   probe tie-breaks, the residual round-trip, and the rerank in one go.

2. ADC FAITHFULNESS BAND: mean relative error of the residual ADC
   approximation vs exact d2 on the returned rows. Honest fixture note:
   the corpus is near-orthogonal synthetic noise and `label` cells are
   not geometric clusters, so residuals carry ~the same energy as raw
   vectors and residual-PQ shows NO error advantage over raw PQ here
   (measured 0.151 vs 0.145) — the residual mechanism's payoff needs a
   coarse quantizer that actually concentrates cells (true k-means at
   production scale). What the gate pins is the MECHANISM: residual
   encode/decode parity cross-engine and cell-restricted ADC.

3. RESIDUAL EDGE ON GEOMETRIC CELLS (r11 verdict task 4): when cells DO
   concentrate, residual encoding must beat raw PQ at the same code
   budget. Measured through the real Spark cores:
   - planted md5-derived clusters (8 centers, noise 10% of center
     scale): residual mean rel err 0.0966 vs raw 7.56 — a ~78x edge,
     because raw sub-vectors straddle far-apart centers that 16
     codewords per subspace cannot represent, while residuals are
     small noise the codebook captures easily (Jegou TPAMI'11 SIV).
   - the REAL fixture relabeled with numpy-Lloyd k-means cells (K=10,
     det. init = first K corpus vectors, 5 iters): residual 0.1300 vs
     raw 0.1452 — geometric cells give residual a ~10% edge even on a
     noise corpus, where the arbitrary fixture-label cells showed none.
"""

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from neomarket_clickhouse_indexer_spark.queries.vectors_q import (
    N_QUERIES,
    _knn_ivfpq_core,
    _knn_pq_adc_core,
    knn_bq_hamming,
    knn_bruteforce,
    knn_ivfpq_adc,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ivfpq_rows(spark):
    return knn_ivfpq_adc(spark, SF).collect()


def test_final_ranking_is_exact_within_probed_cell(ivfpq_rows):
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    lab = t["label"].to_numpy()
    x = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    corpus = ids >= N_QUERIES
    cents = {l: x[(lab == l) & corpus].mean(axis=0) for l in set(lab)}
    got = {}
    for r in ivfpq_rows:
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    assert set(got) == set(range(N_QUERIES))
    for q in range(N_QUERIES):
        qv = x[ids == q][0]
        best = max(
            cents,
            key=lambda l: (
                round(
                    float(
                        qv @ cents[l]
                        / (np.linalg.norm(qv) * np.linalg.norm(cents[l]))
                    ),
                    6,
                ),
                -l,
            ),
        )
        cell_ids = ids[(lab == best) & corpus]
        d2 = {
            int(c): round(float(((qv - x[ids == c][0]) ** 2).sum()), 6)
            for c in cell_ids
        }
        top = sorted(d2, key=lambda c: (d2[c], c))[:10]
        mine = [n for _, n in sorted(got[q])]
        assert mine == top, (q, best, mine, top)


def test_adc_error_band(ivfpq_rows):
    errs = [
        abs(r["adc_d2u"] - r["d2u"]) / r["d2u"]
        for r in ivfpq_rows
        if r["d2u"] > 0
    ]
    mean_err = sum(errs) / len(errs)
    # 2 Lloyd iterations, 16x16 codebooks over 64 dims: measured 0.1511
    # on the fixture. HARD BOUND, not a point-estimate band (r11 ADVICE:
    # tight fixture-bound pins break in threes on regeneration; the
    # driver gate's value-hash already pins exact determinism) — a
    # blowup past 0.25 means the residual round-trip or the codebook
    # training drifted.
    assert mean_err < 0.25, mean_err


def _md5_unit(tag: str) -> float:
    """Deterministic uniform(0,1) from md5 — the no-RNG doctrine."""
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) / 2**32


def test_residual_adc_edge_on_geometric_cells(spark):
    """The residual mechanism's payoff, shown on cells that actually
    cluster (r11 verdict task 4): planted md5-derived clusters (8
    centers at unit scale, point noise at 10% of it), label = the true
    geometric cell. Run the REAL Spark cores — residual PQ
    (_knn_ivfpq_core) vs raw PQ (_knn_pq_adc_core) at the identical
    code budget — and require the residual ADC error to be at least
    10x smaller (measured: 0.0966 vs 7.56, a ~78x edge; hard bound
    keeps fixture-regeneration slack, the r11 ADVICE doctrine)."""
    DIM, N_CENTERS, PTS_PER = 64, 8, 40
    centers = [
        [(_md5_unit(f"ctr-{c}-{d}") - 0.5) * 2.0 for d in range(DIM)]
        for c in range(N_CENTERS)
    ]
    rows, vid = [], 0
    for q in range(N_QUERIES):
        c = q % N_CENTERS
        rows.append((vid, c, [
            centers[c][d] + (_md5_unit(f"q-{q}-{d}") - 0.5) * 0.2
            for d in range(DIM)
        ]))
        vid += 1
    for c in range(N_CENTERS):
        for i in range(PTS_PER):
            rows.append((vid, c, [
                centers[c][d] + (_md5_unit(f"pt-{c}-{i}-{d}") - 0.5) * 0.2
                for d in range(DIM)
            ]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )

    def _mean_rel_err(res):
        errs = [
            abs(r["adc_d2u"] - r["d2u"]) / r["d2u"]
            for r in res if r["d2u"] > 0
        ]
        return sum(errs) / len(errs)

    res_err = _mean_rel_err(_knn_ivfpq_core(spark, emb).collect())
    raw_err = _mean_rel_err(_knn_pq_adc_core(spark, emb).collect())
    assert res_err * 10 < raw_err, (res_err, raw_err)
    assert res_err < 0.25, res_err


def test_bq_hamming_shortlist_recall(spark):
    """Binary quantization (the sibling 1-bit tier, same file by
    family): the exact re-rank of the top-50 Hamming shortlist must
    recover 0.70 of the true top-10 on the fixture — sign bits over
    zero-centered dims carry real signal (49.3% of dims are positive),
    and a drop here means the code packing or the xor+bit_count
    Hamming broke."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(spark, SF).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bq_hamming(spark, SF).collect()
    }
    recall = len(got & exact) / len(exact)
    # measured 0.70 on the fixture; hard floor only (see mean_err note)
    assert recall >= 0.60, recall
