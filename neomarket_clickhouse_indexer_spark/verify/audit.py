"""Leaderboard parity audit (O6) — compare a locally computed leaderboard
against an external/official one.

Reference: src/leaderboard-audit-agent.ts:233-386 — overlap ratio,
top-10 overlap, rank-delta stats; PASS/WARN/FAIL with thresholds
(overlap ≥ 0.2, top-10 overlap ≥ 2; README.md:122-134 strict mode).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class AuditResult:
    overlap_ratio: float
    top10_overlap: int
    mean_rank_delta: float
    verdict: str  # PASS | WARN | FAIL


def audit_leaderboards(
    local: list[str],
    official: list[str],
    overlap_threshold: float = 0.2,
    top10_threshold: int = 2,
) -> AuditResult:
    """Both inputs are rank-ordered id lists (highest first)."""
    if not local or not official:
        return AuditResult(0.0, 0, float("nan"), "FAIL")
    local_set, official_set = set(local), set(official)
    overlap = local_set & official_set
    overlap_ratio = len(overlap) / min(len(local_set), len(official_set))
    top10 = len(set(local[:10]) & set(official[:10]))
    official_rank = {w: i for i, w in enumerate(official)}
    deltas = [abs(i - official_rank[w]) for i, w in enumerate(local) if w in official_rank]
    mean_delta = sum(deltas) / len(deltas) if deltas else float("nan")
    if overlap_ratio >= overlap_threshold and top10 >= top10_threshold:
        verdict = "PASS"
    elif overlap_ratio >= overlap_threshold / 2:
        verdict = "WARN"
    else:
        verdict = "FAIL"
    return AuditResult(overlap_ratio, top10, mean_delta, verdict)
