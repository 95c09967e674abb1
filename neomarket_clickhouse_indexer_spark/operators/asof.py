"""As-of (backward) join — latest anchor row at or before each probe time.

The reference emulates this per-key with ``ORDER BY snapshot_time DESC
LIMIT 1`` point queries (reference src/api.ts:639-661,
src/pnl-from-snapshots.ts:10-32). A distributed engine can't afford a query
per probe; we express the whole join as ONE pass:

  union(anchors tagged 0, probes tagged 1)
    → window per key ordered by (ts, tag, tiebreak)
    → last non-null anchor payload carried forward
    → keep probe rows.

This is a single shuffle on the key (no range-join row explosion), scales to
any probe/anchor cardinality, and handles the equal-timestamp case exactly
like SQL ``ASOF JOIN ... ON anchor.ts <= probe.ts`` (anchor sorts before the
probe at equal ts via the tag).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    anchors: DataFrame,
    on: Sequence[str],
    ts: str,
    payload: Sequence[str],
    tiebreak: str,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: each probe row gains ``<payload_prefix><col>`` columns
    from the latest anchor with ``anchor.ts <= probe.ts`` on the same key(s).

    ``tiebreak`` must be a unique column (e.g. event_id) present in both
    inputs so the ordering is total and deterministic. Probe columns are
    preserved; anchor rows are dropped after the carry-forward.
    """
    on = list(on)
    payload = list(payload)
    probe_cols = probes.columns

    anchor_side = anchors.select(
        *on,
        F.col(ts).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    # Probe-only columns ride along as nulls on anchor rows.
    extra = [c for c in probe_cols if c not in set(on)]
    for c in extra:
        anchor_side = anchor_side.withColumn(c, F.lit(None).cast(probes.schema[c].dataType))

    probe_side = probes.select(
        *on,
        F.col(ts).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(anchors.schema[c].dataType).alias(f"__p_{c}") for c in payload],
        *extra,
    )

    u = anchor_side.select(probe_side.columns).unionByName(probe_side)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag", "__tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        u = u.withColumn(
            f"{payload_prefix}{c}", F.last(f"__p_{c}", ignorenulls=True).over(w)
        )
    return u.filter(F.col("__tag") == 1).drop(
        "__tag", "__tb", "__ts", *[f"__p_{c}" for c in payload]
    )
