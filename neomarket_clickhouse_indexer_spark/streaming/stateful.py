"""Custom stateful streaming operator: per-key running position/PnL state
maintained across microbatches with ``applyInPandasWithState``.

The reference's ledger is batch-rebuilt (ST6 — "batch, not streaming, in
the reference"); this is the streaming-native upgrade path: each key's
(net position, cost, realized, volume) state lives in the state store,
updated per microbatch, emitting the refreshed row — a continuously
maintained leaderboard/positions table without re-reading history.

Semantics kept deliberately additive-associative (running totals + avg-cost
position), so state size is O(1) per key and late/replayed rows fold in the
same way ClickHouse SummingMergeTree absorbs re-inserts. The full FIFO lot
queue COULD live in state the same way (serialize lots per token), at the
cost of unbounded state for pathological wallets — the batch rebuild
(ledger/build.py) stays the source of truth, this operator serves the live
tail, mirroring the reference's pre-agg + fallback ladder.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "position double, cost double, realized double, volume double, n long"
OUTPUT_SCHEMA = (
    "key bigint, position double, avg_cost double, realized double, "
    "volume double, n long"
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        position, cost, realized, volume, n = state.get
    else:
        position, cost, realized, volume, n = 0.0, 0.0, 0.0, 0.0, 0
    for pdf in pdfs:
        # rows within a microbatch arrive in shuffle order — re-establish
        # event-time order before folding (cross-batch order is the
        # source's responsibility, same as the reference's finalized-block
        # ingest discipline, ST2)
        if {"ts", "ord"} <= set(pdf.columns):
            pdf = pdf.sort_values(["ts", "ord"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            qty = float(row.qty)
            price = float(row.price)
            volume += qty * price
            n += 1
            if row.side == 1:  # buy: add to position at cost
                position += qty
                cost += qty * price
            else:  # sell: realize against average cost
                avg = cost / position if position > 1e-12 else 0.0
                take = min(qty, position)
                realized += take * (price - avg)
                cost -= take * avg
                position -= take
                # oversold remainder: pure income (see DIVERGENCES.md #3)
                realized += (qty - take) * price
    state.update((position, cost, realized, volume, n))
    avg_cost = cost / position if position > 1e-12 else 0.0
    yield pd.DataFrame(
        [(key[0], position, avg_cost, realized, volume, n)],
        columns=["key", "position", "avg_cost", "realized", "volume", "n"],
    )


def running_positions_stream(trades_stream, checkpoint_dir: str):
    """trades_stream columns: key bigint, side int (1/-1), qty double,
    price double. Emits the refreshed per-key state row each microbatch."""
    updated = trades_stream.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return updated.writeStream.outputMode("update").option(
        "checkpointLocation", checkpoint_dir
    )


# --- streaming sequenceCount: the greedy view→purchase pair automaton
#     (queries/timeseries_q.py events_sequence_match, where the BATCH
#     side uses the Lindley-reflection closed form) run as a REAL
#     stateful streaming operator: per-user (pending, pairs, n) state is
#     O(1) and folds each microbatch's rows in event-time order. With
#     the batch gate proving closed form == sequential automaton and
#     this operator proving streaming fold == the same automaton, the
#     three formulations pin each other.

PAIR_STATE_SCHEMA = "pending long, pairs long, n long"
PAIR_OUTPUT_SCHEMA = "user_id bigint, pending long, pairs long, n long"


def _pairs_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        pending, pairs, n = state.get
    else:
        pending, pairs, n = 0, 0, 0
    for pdf in pdfs:
        # microbatch rows arrive in shuffle order — re-establish event
        # time order (cross-batch order is the file source's contract,
        # same as running_positions_stream)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            n += 1
            if row.event_type == "view":
                pending += 1
            elif row.event_type == "purchase" and pending > 0:
                pending -= 1
                pairs += 1
    state.update((int(pending), int(pairs), int(n)))
    yield pd.DataFrame(
        [(key[0], int(pending), int(pairs), int(n))],
        columns=["user_id", "pending", "pairs", "n"],
    )


def sequence_pairs_stream(events_stream, checkpoint_dir: str):
    """events_stream columns: user_id bigint, ts timestamp, event_id
    bigint, event_type string. Emits each user's refreshed
    (pending, pairs, n) automaton state every microbatch."""
    updated = events_stream.groupBy("user_id").applyInPandasWithState(
        _pairs_update,
        outputStructType=PAIR_OUTPUT_SCHEMA,
        stateStructType=PAIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return updated.writeStream.outputMode("update").option(
        "checkpointLocation", checkpoint_dir
    )


# --- streaming q-digest: the quantile sketch maintained as STREAMING
#     STATE — per-type leaf histogram (universe-bounded: <= 2^QD_BITS
#     entries per key at ANY volume, the state-store analog of the CMS
#     w*d table) accumulated across microbatches; every batch emits the
#     refreshed quantile estimates from a compression of the CURRENT
#     histogram. Because the q-digest is a pure function of the leaf
#     histogram (queries/timeseries_q.py::qdigest_compress), the final
#     streamed state answers EXACTLY the batch gate's estimates — the
#     -State/-Merge contract in its streaming form (dashboard
#     percentiles over an unbounded stream, the reference's stats
#     endpoints made incremental).

QDIGEST_STATE_SCHEMA = "offs array<long>, cnts array<long>"
QDIGEST_OUTPUT_SCHEMA = (
    "event_type string, q_pct long, n long, t long, sketch_nodes long, "
    "est_cents long, target long"
)


def _qdigest_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    from ..queries.timeseries_q import (
        QD_BITS,
        QD_K,
        QD_PCTS,
        qdigest_compress,
    )

    hist: dict[int, int] = {}
    if state.exists:
        offs, cnts = state.get
        hist = dict(zip((int(o) for o in offs), (int(c) for c in cnts)))
    for pdf in pdfs:
        for v in pdf["v"]:
            vv = int(v)
            hist[vv] = hist.get(vv, 0) + 1
    state.update((list(hist.keys()), list(hist.values())))
    n = sum(hist.values())
    t = n // QD_K
    sketch = qdigest_compress(hist, t)
    nodes = []
    for level, off, c in sketch:
        size = 1 << (QD_BITS - level)
        lo = off * size
        nodes.append((lo + size - 1, -lo, c))
    nodes.sort()
    rows = []
    for q in QD_PCTS:
        target = (n - 1) * q // 100 + 1
        cum = 0
        est = nodes[-1][0]
        for hi, _neg_lo, c in nodes:
            cum += c
            if cum >= target:
                est = hi
                break
        rows.append((key[0], q, n, t, len(sketch), est, target))
    yield pd.DataFrame(
        rows,
        columns=[
            "event_type", "q_pct", "n", "t", "sketch_nodes",
            "est_cents", "target",
        ],
    )


def qdigest_stream(events_stream, checkpoint_dir: str):
    """events_stream columns: event_type string, v long (clamped cents).
    Emits the refreshed per-type quantile estimates each microbatch."""
    updated = events_stream.groupBy("event_type").applyInPandasWithState(
        _qdigest_update,
        outputStructType=QDIGEST_OUTPUT_SCHEMA,
        stateStructType=QDIGEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return updated.writeStream.outputMode("update").option(
        "checkpointLocation", checkpoint_dir
    )
