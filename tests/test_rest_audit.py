"""Tests for the REST source patterns (S5/S6), the leaderboard parity audit
(O6), and the adaptive widening scan (T6)."""

from __future__ import annotations

import pytest

from neomarket_clickhouse_indexer_spark.operators.dedup import latest_by_key
from neomarket_clickhouse_indexer_spark.serve import ServeContext
from neomarket_clickhouse_indexer_spark.sources.rest import (
    Checkpoint,
    fetch_all_pages,
    sync_incremental,
)
from neomarket_clickhouse_indexer_spark.verify.audit import audit_leaderboards

from .conftest import SF_SMOKE


def test_fetch_all_pages_stops_on_short_page():
    corpus = [{"id": i} for i in range(257)]
    calls = []

    def fake_fetch(offset, limit):
        calls.append(offset)
        return corpus[offset : offset + limit]

    rows = list(fetch_all_pages(fake_fetch, page_size=100))
    assert [r["id"] for r in rows] == list(range(257))
    assert calls == [0, 100, 200]  # stopped after the short page


def test_sync_incremental_checkpoint_and_change_detection(spark, tmp_path):
    table = str(tmp_path / "market_metadata")
    ckpt = Checkpoint(str(tmp_path / "ckpt.json"))
    corpus = [
        {"condition_id": "c1", "question": "q1", "updated_at": 100},
        {"condition_id": "c2", "question": "q2", "updated_at": 200},
    ]
    schema = "condition_id string, question string, updated_at long"

    def fetch(offset, limit):
        return corpus[offset : offset + limit]

    # round 1: everything new
    assert sync_incremental(spark, fetch, schema, table, ckpt, "condition_id", "updated_at") == 2
    assert ckpt.read()["since"] == 200
    # round 2: nothing newer than the watermark → no fetch rows pass
    assert sync_incremental(spark, fetch, schema, table, ckpt, "condition_id", "updated_at") == 0
    # round 3: one updated row (newer version) + one unchanged
    corpus.append({"condition_id": "c1", "question": "q1-edited", "updated_at": 300})
    assert sync_incremental(spark, fetch, schema, table, ckpt, "condition_id", "updated_at") == 1
    latest = latest_by_key(
        spark.read.parquet(table), ["condition_id"], ["updated_at"]
    ).collect()
    got = {r["condition_id"]: r["question"] for r in latest}
    assert got == {"c1": "q1-edited", "c2": "q2"}


def test_audit_leaderboards_verdicts():
    official = [f"w{i}" for i in range(20)]
    same = audit_leaderboards(official, official)
    assert same.verdict == "PASS" and same.overlap_ratio == 1.0
    assert same.top10_overlap == 10 and same.mean_rank_delta == 0.0

    shuffled = official[5:] + official[:5]
    ok = audit_leaderboards(shuffled, official)
    assert ok.verdict == "PASS"

    disjoint = audit_leaderboards([f"x{i}" for i in range(20)], official)
    assert disjoint.verdict == "FAIL"
    assert audit_leaderboards([], official).verdict == "FAIL"


def test_adaptive_widening_scan(spark):
    ctx = ServeContext(spark, SF_SMOKE)
    # user with plenty of trades in 30d → no widening
    out = ctx.recent_trades(user_id=12)
    assert out["windowWidened"] is False or len(out["trades"]) >= 10
    # nonexistent user → widened (both windows empty, but the retry fired)
    out2 = ctx.recent_trades(user_id=10**9)
    assert out2["windowWidened"] is True and out2["trades"] == []
