"""Operational batch jobs over the ledger — the reference's CLI job surface
(build-ledger / backfill-ledger / snapshot-scheduler / build-rollup-1d,
SURVEY §0 program 3) as Spark jobs.

The reference's snapshot scheduler targets the top-N wallets by 30d volume
(snapshot-scheduler.ts:124-158,175: default top 2000) with a worker pool of
2; here wallet selection is one aggregation and the build is one
distributed pass — then an idempotent partition replace (S4)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..determinism import ranked_topk
from ..sources.sinks import replace_partitions
from .build import build_wallet_ledger, build_wallet_snapshots


def select_top_wallets(events: DataFrame, n: int = 2000) -> DataFrame:
    """Top-N wallets by traded volume (reference wallet selection from the
    leaderboard aggregate, snapshot-scheduler.ts:124-158)."""
    vol = (
        events.filter(F.col("type") == "trade")
        .groupBy("wallet")
        .agg(F.sum(F.col("usdc").cast("decimal(30,10)")).alias("volume"))
    )
    return ranked_topk(
        vol, [F.desc("volume"), F.asc("wallet")], n
    ).select("wallet")


def snapshot_top_wallets(
    events: DataFrame,
    out_path: str,
    n: int = 2000,
    interval_s: int = 86400,
) -> int:
    """One scheduler round: pick top-N wallets, rebuild their snapshots,
    replace only their partitions (wallet-partitioned parquet). Returns the
    number of wallets rebuilt."""
    top = select_top_wallets(events, n)
    scoped = events.join(F.broadcast(top), "wallet")
    snaps = build_wallet_snapshots(scoped, interval_s=interval_s)
    replace_partitions(snaps, out_path, partition_by=["wallet"])
    return top.count()


def rebuild_wallet_ledgers(
    events: DataFrame, out_path: str, wallets: list[str] | None = None
) -> None:
    """build-ledger / backfill-ledger analog: full or scoped idempotent
    rebuild via partition replace (reference ALTER TABLE DELETE + INSERT,
    build-ledger.ts:73-109)."""
    scoped = events
    if wallets:
        scoped = events.filter(F.col("wallet").isin(wallets))
    entries = build_wallet_ledger(scoped)
    replace_partitions(entries, out_path, partition_by=["wallet"])
