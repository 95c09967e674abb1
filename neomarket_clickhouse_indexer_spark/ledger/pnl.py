"""PnL modes (O3) and the daily realized rollup (O4) over the ledger
engine's realized-event output.

Reference semantics (src/ledger-engine.ts:16-21,1955-2055; docs
src/calculate-pnl.ts:4-10): four modes over realized events —

  period_only    entry AND exit inside [start, end)
  with_history   exit inside the period (entry may predate it)
  (±unrealized variants add the open-position mark at the period end; the
  unrealized component comes from build_wallet_snapshots.)

Rollup (src/build-rollup-1d.ts:56-87): wallet × condition × day →
sum(realized), sum(|usdc_delta|), trade counts — idempotently rebuilt per
partition (Spark: partition-overwrite instead of ALTER TABLE DELETE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..determinism import dsum


def realized_pnl_by_mode(
    realized: DataFrame,
    start,
    end,
    mode: str = "with_history",
) -> DataFrame:
    """Aggregate realized events per wallet under a PnL mode."""
    in_period = (F.col("timestamp") >= F.lit(start)) & (F.col("timestamp") < F.lit(end))
    if mode == "period_only":
        cond: Column = in_period & (F.col("entry_timestamp") >= F.lit(start))
    elif mode == "with_history":
        cond = in_period
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return (
        realized.filter(cond)
        .groupBy("wallet")
        .agg(
            dsum(F.col("realized_pnl"), "realized_pnl"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def rollup_realized_1d(ledger_entries: DataFrame) -> DataFrame:
    """wallet × condition × day rollup of ledger entries (O4)."""
    return (
        ledger_entries.groupBy(
            "wallet",
            "condition_id",
            F.to_date("block_timestamp").alias("day"),
        )
        .agg(
            dsum(F.col("realized_pnl"), "realized_pnl"),
            dsum(F.abs(F.col("usdc_delta")), "gross_usdc"),
            F.count(F.when(F.col("realized_pnl") != 0, 1)).alias("n_realizing"),
            F.count(F.when(F.col("realized_pnl") > 0, 1)).alias("n_wins"),
            F.count(F.when(F.col("realized_pnl") < 0, 1)).alias("n_losses"),
        )
    )
