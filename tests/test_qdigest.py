"""Q-digest kernel properties: planted compression cases, the internal-
count invariant the rank-error audit relies on, the sketch size bound,
and a seeded fuzz of the quantile query against exact sorted ranks."""

from __future__ import annotations

import numpy as np
import pytest

from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
    QD_BITS,
    QD_K,
    QD_PCTS,
    qdigest_compress,
)


def _query(sketch, n, q_pct):
    """Same postorder quantile query as the Arrow kernel."""
    nodes = []
    for level, off, c in sketch:
        size = 1 << (QD_BITS - level)
        lo = off * size
        nodes.append((lo + size - 1, -lo, c))
    nodes.sort()
    target = (n - 1) * q_pct // 100 + 1
    cum = 0
    for hi, _neg_lo, c in nodes:
        cum += c
        if cum >= target:
            return hi, target
    return nodes[-1][0], target


def test_all_mass_merges_to_root_when_threshold_huge():
    hist = {0: 1, 1: 1, 5: 1, 131071: 1}
    sk = qdigest_compress(hist, t=100)
    assert sk == [(0, 0, 4)]


def test_nothing_merges_at_threshold_zero():
    hist = {3: 7, 9: 2, 100: 5}
    sk = qdigest_compress(hist, t=0)
    assert sorted(sk) == [(QD_BITS, 3, 7), (QD_BITS, 9, 2), (QD_BITS, 100, 5)]


def test_sibling_pair_above_threshold_stays_below_merges():
    # values 4,5 are siblings (parent off 2); combined 6 > t=5 -> kept;
    # values 8,9 combined 4 <= 5 -> merge upward and keep merging until
    # some level's pair sum exceeds t or the root absorbs them
    hist = {4: 3, 5: 3, 8: 2, 9: 2}
    sk = qdigest_compress(hist, t=5)
    kept_leaves = {(lv, off): c for lv, off, c in sk if lv == QD_BITS}
    assert kept_leaves == {(QD_BITS, 4): 3, (QD_BITS, 5): 3}
    # the 8/9 mass (4 <= t) must sit in exactly one ancestor node
    rest = [(lv, off, c) for lv, off, c in sk if lv != QD_BITS]
    assert sum(c for _, _, c in rest) == 4 and len(rest) == 1


@pytest.mark.parametrize("seed", [11, 42, 99])
def test_invariants_and_rank_error_fuzz(seed):
    rng = np.random.RandomState(seed)
    # mixed distribution: heavy spike + uniform tail + geometric low end
    vals = np.concatenate(
        [
            np.full(rng.randint(200, 800), int(rng.randint(0, 1 << QD_BITS))),
            rng.randint(0, 1 << QD_BITS, size=rng.randint(200, 1500)),
            rng.geometric(0.001, size=rng.randint(100, 800)),
        ]
    )
    vals = np.minimum(vals, (1 << QD_BITS) - 1).astype(np.int64)
    hist: dict[int, int] = {}
    for v in vals:
        hist[int(v)] = hist.get(int(v), 0) + 1
    n = len(vals)
    t = n // QD_K
    sk = qdigest_compress(hist, t)

    # mass conservation
    assert sum(c for _, _, c in sk) == n
    # every INTERNAL node holds <= t (merges only happen at s_pair <= t)
    for lv, _off, c in sk:
        if lv < QD_BITS:
            assert c <= t
    # size bound: each kept sibling group carries disjoint mass > t, so
    # there are <= n/(t+1) groups of <= 2 nodes, + 1 root remainder
    assert len(sk) <= 2 * (n // (t + 1)) + 1

    srt = np.sort(vals)
    for q in QD_PCTS:
        est, target = _query(sk, n, q)
        cnt_lt = int(np.searchsorted(srt, est, side="left"))
        cnt_le = int(np.searchsorted(srt, est, side="right"))
        assert cnt_le >= target
        assert cnt_lt <= target - 1 + (QD_BITS + 1) * t


@pytest.mark.parametrize("seed", [5, 77])
def test_merge_mass_and_rank_error_fuzz(seed):
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        qdigest_compress_multi,
    )

    rng = np.random.RandomState(seed)

    def hist_of(vals):
        h: dict[int, int] = {}
        for v in vals:
            h[int(v)] = h.get(int(v), 0) + 1
        return h

    a = np.minimum(rng.geometric(0.0005, size=900), (1 << QD_BITS) - 1)
    b = np.minimum(rng.randint(0, 1 << QD_BITS, size=1100), (1 << QD_BITS) - 1)
    ha, hb = hist_of(a), hist_of(b)
    na, nb = len(a), len(b)
    ta, tb = na // QD_K, nb // QD_K
    ska = qdigest_compress(ha, ta)
    skb = qdigest_compress(hb, tb)
    n = na + nb
    t = n // QD_K
    states: dict[tuple[int, int], int] = {}
    for lv, off, c in ska + skb:
        states[(lv, off)] = states.get((lv, off), 0) + c
    merged = qdigest_compress_multi(states, t)

    # mass conservation through build + merge + re-compression
    assert sum(c for _, _, c in merged) == n
    # internal nodes bounded by t_a + t_b + t (kept-from-half states can
    # carry up to t_a + t_b; re-compression absorbs at <= t)
    for lv, _off, c in merged:
        if lv < QD_BITS:
            assert c <= ta + tb + t
    srt = np.sort(np.concatenate([a, b]))
    for q in QD_PCTS:
        est, target = _query(merged, n, q)
        cnt_lt = int(np.searchsorted(srt, est, side="left"))
        cnt_le = int(np.searchsorted(srt, est, side="right"))
        assert cnt_le >= target
        assert cnt_lt <= target - 1 + (QD_BITS + 1) * (ta + tb + t)


def test_merge_of_uncompressed_equals_build():
    from neomarket_clickhouse_indexer_spark.queries.timeseries_q import (
        qdigest_compress_multi,
    )

    # t=0 sketches are the raw leaf histograms, so merging them and
    # compressing at t must equal building from the combined histogram
    ha = {3: 5, 100: 2, 4000: 9}
    hb = {3: 1, 77: 4, 131071: 2}
    states = {(QD_BITS, k): v for k, v in ha.items()}
    for k, v in hb.items():
        states[(QD_BITS, k)] = states.get((QD_BITS, k), 0) + v
    combined = dict(ha)
    for k, v in hb.items():
        combined[k] = combined.get(k, 0) + v
    assert sorted(qdigest_compress_multi(states, 4)) == sorted(
        qdigest_compress(combined, 4)
    )
