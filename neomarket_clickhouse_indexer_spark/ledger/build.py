"""Distributed ledger build: one FIFO replay per wallet, all wallets in
parallel.

The reference builds one wallet per CLI run (build-ledger.ts) or a worker
pool of 2 (backfill-ledger.ts:60); here wallet-parallelism is the cluster's
partition count. One shuffle (repartition on wallet) + in-partition sort +
a single mapInPandas pass — identical mechanics to operators/fifo.py, with
the full domain state machine inside (SURVEY §2.10 O1/O2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .engine import LedgerEngine

LEDGER_SCHEMA = (
    "wallet string, event_type string, block_timestamp timestamp, "
    "block_number long, log_index long, token_id string, "
    "condition_id string, quantity double, usdc_delta double, "
    "unit_price double, cost_basis double, realized_pnl double"
)

SNAPSHOT_SCHEMA = (
    "wallet string, snapshot_epoch double, realized_pnl double, "
    "unrealized_pnl double, open_positions_cost double, "
    "open_positions_value double, cashflow double, token_count long"
)

REALIZED_SCHEMA = (
    "wallet string, event_type string, timestamp timestamp, "
    "entry_timestamp timestamp, token_id string, condition_id string, "
    "quantity double, realized_pnl double"
)


def _replay_wallet(wallet: str, g: pd.DataFrame,
                   snapshot_interval_s: int | None,
                   ref_basis_memory: bool = False) -> LedgerEngine:
    eng = LedgerEngine(wallet, snapshot_interval_s=snapshot_interval_s,
                       ref_basis_memory=ref_basis_memory)
    events = []
    for row in g.itertuples(index=False):
        ev = {
            "ts": row.ts,
            "block_number": row.block_number,
            "log_index": row.log_index,
            "type": row.type,
            "token_id": row.token_id,
            "condition_id": row.condition_id,
            "qty": row.qty,
            "usdc": row.usdc,
            "fee": row.fee,
            "is_buy": row.is_buy,
            "is_in": row.is_in,
            "outcome_token_ids": list(row.outcome_token_ids)
            if row.outcome_token_ids is not None
            else [],
            "payout_ratios": list(row.payout_ratios)
            if row.payout_ratios is not None
            else [],
        }
        # optional column: negRisk conversions carry the minted legs
        # (ledger-engine.ts:1670-1751); absent for every other caller
        mint = getattr(row, "mint_token_ids", None)
        if mint is not None:
            ev["mint_token_ids"] = list(mint)
        events.append(ev)
    eng.replay(events)
    return eng


def _runner(kind: str, snapshot_interval_s: int | None):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        outs = []
        for wallet, g in pdf.groupby("wallet", sort=False):
            eng = _replay_wallet(wallet, g, snapshot_interval_s)
            if kind == "entries":
                recs = eng.entries
            elif kind == "snapshots":
                recs = eng.snapshots
            else:
                recs = eng.realized_events
            if recs:
                outs.append(pd.DataFrame(recs))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return run


def _prepared(events: DataFrame) -> DataFrame:
    return events.repartition("wallet").sortWithinPartitions(
        "wallet", "ts", "block_number", "log_index", "type"
    )


def build_wallet_ledger(events: DataFrame) -> DataFrame:
    """Normalized events (ledger/prep.py schema) → wallet_ledger entries
    (reference table 001:292-313)."""
    return _prepared(events).mapInPandas(_runner("entries", None), LEDGER_SCHEMA)


def build_wallet_snapshots(events: DataFrame, interval_s: int = 86400) -> DataFrame:
    """Normalized events → periodic PnL snapshots (reference
    wallet_pnl_snapshots 001:318-332; snapshot emitter
    ledger-engine.ts:1116-1152)."""
    return _prepared(events).mapInPandas(
        _runner("snapshots", interval_s), SNAPSHOT_SCHEMA
    )


MARKS_SCHEMA = (
    "wallet string, unrealized_pnl double, open_positions_cost double, "
    "open_positions_value double"
)


def build_pnl_marks(
    events: DataFrame,
    end: str,
    entry_start: str | None = None,
    entry_end: str | None = None,
) -> DataFrame:
    """Per-wallet open-position mark at ``end`` (reference calculatePnl's
    unrealized leg, ledger-engine.ts:2018-2031): replay each wallet's
    events with ts <= end — buildLedger(wallet, endTs) truncation — then
    price the open lots, optionally restricted to lots entered inside
    [entry_start, entry_end] (PnL mode 3). One replay per wallet, same
    repartition-by-wallet shape as the other builders."""
    import pandas as pd

    e_start = pd.Timestamp(entry_start) if entry_start is not None else None
    e_end = pd.Timestamp(entry_end) if entry_end is not None else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        rows = []
        for wallet, g in pdf.groupby("wallet", sort=False):
            eng = _replay_wallet(wallet, g, None)
            unreal, cost, value = eng.open_positions_report(e_start, e_end)
            rows.append((wallet, unreal, cost, value))
        yield pd.DataFrame(
            rows,
            columns=[
                "wallet", "unrealized_pnl", "open_positions_cost",
                "open_positions_value",
            ],
        )

    from pyspark.sql import functions as F

    truncated = events.filter(F.col("ts") <= F.lit(end).cast("timestamp"))
    return _prepared(truncated).mapInPandas(run, MARKS_SCHEMA)


def build_realized_events(events: DataFrame) -> DataFrame:
    """Normalized events → per-slice realized PnL events (feeds the O3 PnL
    modes, ledger-engine.ts:1955-2055)."""
    return _prepared(events).mapInPandas(_runner("realized", None), REALIZED_SCHEMA)
