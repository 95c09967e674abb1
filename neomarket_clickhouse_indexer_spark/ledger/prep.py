"""Spark-side event preparation for the ledger engine.

The reference pulls 11 per-wallet keyset-paginated scans per wallet
(ledger-engine.ts:574-726, :519-572) — a query storm that works for one
wallet at a time. The Spark shape inverts it: normalize ALL event tables
into one (wallet, event) stream in a handful of distributed passes, then
replay every wallet in parallel (SURVEY §3.2 step 7).

Normalized event schema (engine input):
  wallet, ts, block_number, log_index, type, token_id, condition_id,
  qty, usdc, fee, is_buy, is_in, outcome_token_ids, payout_ratios

All amounts are converted from 6-decimal fixed point to float64 once here
(matching the reference's Number() conversion, constants.ts:35-37).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedupe_by_id, latest_by_key

SCALE = 1_000_000

NORMALIZED_SCHEMA = (
    "wallet string, ts timestamp, block_number long, log_index long, "
    "type string, token_id string, condition_id string, qty double, "
    "usdc double, fee double, is_buy boolean, is_in boolean, "
    "outcome_token_ids array<string>, payout_ratios array<double>"
)

def _nulls() -> dict[str, Column]:
    # built lazily — Column construction needs an active SparkSession
    return {
        "token_id": F.lit("").cast("string"),
        "condition_id": F.lit("").cast("string"),
        "qty": F.lit(0.0),
        "usdc": F.lit(0.0),
        "fee": F.lit(0.0),
        "is_buy": F.lit(False),
        "is_in": F.lit(False),
        "outcome_token_ids": F.lit(None).cast("array<string>"),
        "payout_ratios": F.lit(None).cast("array<double>"),
    }


def _norm(df: DataFrame, **cols: Column) -> DataFrame:
    """Project a source table onto the normalized schema."""
    out = {**_nulls(), **cols}
    return df.select(
        out["wallet"].alias("wallet"),
        F.col("block_timestamp").alias("ts"),
        F.col("block_number").cast("long").alias("block_number"),
        F.col("log_index").cast("long").alias("log_index"),
        out["type"].alias("type"),
        *[
            out[c].alias(c)
            for c in (
                "token_id", "condition_id", "qty", "usdc", "fee",
                "is_buy", "is_in", "outcome_token_ids", "payout_ratios",
            )
        ],
    )


def _usd(col: str) -> Column:
    return (F.col(col).cast("double") / SCALE).cast("double")


def normalize_trades(trades: DataFrame) -> DataFrame:
    """Each trade yields two wallet perspectives (maker + taker) — the
    wallet_trades union-relabel view (reference 001:352-377)."""
    trades = dedupe_by_id(trades)
    base = dict(
        type=F.lit("trade"),
        token_id=F.col("token_id"),
        qty=_usd("token_amount"),
        usdc=_usd("usdc_amount"),
        fee=_usd("fee"),
    )
    maker = _norm(trades, wallet=F.col("maker"), is_buy=F.col("is_maker_buy"), **base)
    taker = _norm(trades, wallet=F.col("taker"), is_buy=F.col("is_taker_buy"), **base)
    return maker.unionByName(taker)


def _with_outcome_tokens(df: DataFrame, market_metadata: DataFrame) -> DataFrame:
    """Join condition_id → token_ids (outcome-aligned) from the latest
    metadata version (reference market_metadata ReplacingMergeTree,
    001:435-448)."""
    meta = latest_by_key(market_metadata, ["condition_id"], ["updated_at"]).select(
        F.col("condition_id").alias("m_condition_id"),
        F.col("token_ids").alias("outcome_token_ids"),
    )
    return df.join(
        F.broadcast(meta), df.condition_id == meta.m_condition_id, "left"
    ).drop("m_condition_id")


def normalize_splits(splits: DataFrame, market_metadata: DataFrame) -> DataFrame:
    df = _with_outcome_tokens(dedupe_by_id(splits), market_metadata)
    return _norm(
        df,
        wallet=F.col("stakeholder"),
        type=F.lit("split"),
        condition_id=F.col("condition_id"),
        usdc=_usd("amount"),
        outcome_token_ids=F.col("outcome_token_ids"),
    )


def normalize_merges(merges: DataFrame, market_metadata: DataFrame) -> DataFrame:
    df = _with_outcome_tokens(dedupe_by_id(merges), market_metadata)
    return _norm(
        df,
        wallet=F.col("stakeholder"),
        type=F.lit("merge"),
        condition_id=F.col("condition_id"),
        usdc=_usd("amount"),
        outcome_token_ids=F.col("outcome_token_ids"),
    )


def _payout_ratios() -> Column:
    return F.when(
        F.col("payout_denominator").cast("double") > 0,
        F.transform(
            F.col("payout_numerators"),
            lambda n: n.cast("double") / F.col("payout_denominator").cast("double"),
        ),
    ).otherwise(F.lit(None).cast("array<double>"))


def normalize_redemptions(
    redemptions: DataFrame, market_metadata: DataFrame, conditions: DataFrame
) -> DataFrame:
    """Payout ratios come from the *resolved* conditions row (latest by
    height; reference conditions versioning 001:121-141)."""
    cond = latest_by_key(conditions, ["condition_id"], ["height"]).select(
        F.col("condition_id").alias("c_condition_id"),
        _payout_ratios().alias("payout_ratios"),
    )
    df = _with_outcome_tokens(dedupe_by_id(redemptions), market_metadata)
    df = df.join(
        F.broadcast(cond), df.condition_id == cond.c_condition_id, "left"
    ).drop("c_condition_id")
    return _norm(
        df,
        wallet=F.col("redeemer"),
        type=F.lit("redemption"),
        condition_id=F.col("condition_id"),
        outcome_token_ids=F.col("outcome_token_ids"),
        payout_ratios=F.col("payout_ratios"),
    )


def normalize_transfers(
    transfers: DataFrame,
    skip_tx_hashes: DataFrame | None = None,
    operator_whitelist: list[str] | None = None,
) -> DataFrame:
    """Plain ERC-1155 transfers, two perspectives. Mint/burn legs (zero
    address) and transfers already explained by a trade/split/merge tx are
    excluded via an anti-join on the skip set — the reference's
    tradeTxs/transferSkipTxs sets (ledger-engine.ts:972-1095) re-expressed
    as a distributed anti-join (SURVEY §2.3 J8)."""
    ZERO = "0x" + "0" * 40
    t = dedupe_by_id(transfers).filter(
        (F.col("from") != ZERO) & (F.col("to") != ZERO)
    )
    if operator_whitelist:
        t = t.filter(~F.col("operator").isin(operator_whitelist))
    if skip_tx_hashes is not None:
        t = t.join(
            skip_tx_hashes.select(F.col("tx_hash").alias("skip_tx")).distinct(),
            t.tx_hash == F.col("skip_tx"),
            "left_anti",
        )
    base = dict(
        type=F.lit("transfer"),
        token_id=F.col("token_id"),
        qty=_usd("value"),
    )
    out = _norm(t, wallet=F.col("from"), is_in=F.lit(False), **base)
    inn = _norm(t, wallet=F.col("to"), is_in=F.lit(True), **base)
    return out.unionByName(inn)


def normalize_fees(fee_refunds: DataFrame, fee_withdrawals: DataFrame) -> DataFrame:
    refunds = _norm(
        dedupe_by_id(fee_refunds),
        wallet=F.col("to"),
        type=F.lit("fee_refund"),
        usdc=_usd("refund"),
    )
    withdrawals = _norm(
        dedupe_by_id(fee_withdrawals),
        wallet=F.col("to"),
        type=F.lit("fee_withdrawal"),
        usdc=_usd("amount"),
    )
    return refunds.unionByName(withdrawals)


def resolution_events(
    conditions: DataFrame, market_metadata: DataFrame, wallet_events: DataFrame
) -> DataFrame:
    """Synthetic resolution events (reference injects them per resolved
    condition, ledger-engine.ts:1097-1107): one event per (wallet,
    resolved condition) for wallets that touched the condition's tokens."""
    resolved = latest_by_key(conditions, ["condition_id"], ["height"]).filter(
        F.col("is_resolved")
    )
    resolved = resolved.select(
        "condition_id",
        F.col("resolved_at").alias("ts"),
        F.col("created_block").alias("block_number"),
        _payout_ratios().alias("payout_ratios"),
    )
    meta = latest_by_key(market_metadata, ["condition_id"], ["updated_at"]).select(
        F.col("condition_id").alias("m_condition_id"),
        F.col("token_ids").alias("outcome_token_ids"),
    )
    resolved = resolved.join(
        F.broadcast(meta), resolved.condition_id == meta.m_condition_id
    ).drop("m_condition_id")

    # wallets that ever touched one of the condition's outcome tokens
    touched = (
        wallet_events.select(
            "wallet", F.explode_outer(F.coalesce(
                F.col("outcome_token_ids"),
                F.when(F.col("token_id") != "", F.array(F.col("token_id"))),
            )).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
        .distinct()
    )
    cond_tokens = resolved.select(
        "condition_id", F.explode("outcome_token_ids").alias("tok")
    )
    holders = (
        touched.join(cond_tokens, "tok")
        .select("wallet", "condition_id")
        .distinct()
    )
    ev = resolved.join(holders, "condition_id")
    return ev.select(
        F.col("wallet"),
        F.col("ts"),
        F.col("block_number").cast("long"),
        F.lit(2**31 - 1).cast("long").alias("log_index"),  # after all logs
        F.lit("resolution").alias("type"),
        F.lit("").alias("token_id"),
        F.col("condition_id"),
        F.lit(0.0).alias("qty"),
        F.lit(0.0).alias("usdc"),
        F.lit(0.0).alias("fee"),
        F.lit(False).alias("is_buy"),
        F.lit(False).alias("is_in"),
        F.col("outcome_token_ids"),
        F.col("payout_ratios"),
    )


def normalize_adapter_simple(
    table: DataFrame, market_metadata: DataFrame, kind: str
) -> DataFrame:
    """adapter_splits / adapter_merges (reference 001:183-213): same shape
    as CTF split/merge but via the negRisk adapter — stakeholder +
    condition_id + amount; legs resolved from metadata."""
    assert kind in ("adapter_split", "adapter_merge")
    df = _with_outcome_tokens(dedupe_by_id(table), market_metadata)
    return _norm(
        df,
        wallet=F.col("stakeholder"),
        type=F.lit(kind),
        condition_id=F.col("condition_id"),
        usdc=_usd("amount"),
        outcome_token_ids=F.col("outcome_token_ids"),
    )


def normalize_adapter_redemptions(
    redemptions: DataFrame, market_metadata: DataFrame, conditions: DataFrame
) -> DataFrame:
    """adapter_redemptions (reference 001:215-230) — same payout-ratio
    resolution as CTF redemptions, via the adapter."""
    cond = latest_by_key(conditions, ["condition_id"], ["height"]).select(
        F.col("condition_id").alias("c_condition_id"),
        _payout_ratios().alias("payout_ratios"),
    )
    df = _with_outcome_tokens(dedupe_by_id(redemptions), market_metadata)
    df = df.join(
        F.broadcast(cond), df.condition_id == cond.c_condition_id, "left"
    ).drop("c_condition_id")
    return _norm(
        df,
        wallet=F.col("redeemer"),
        type=F.lit("adapter_redemption"),
        condition_id=F.col("condition_id"),
        outcome_token_ids=F.col("outcome_token_ids"),
        payout_ratios=F.col("payout_ratios"),
    )


def normalize_adapter_conversions(
    conversions: DataFrame, legs: DataFrame
) -> DataFrame:
    """adapter_conversions (reference 001:232-247; engine semantics
    ledger-engine.ts:1670-1751): burn the selected NO legs, mint the
    complementary YES legs. ``legs`` resolves (market_id, index_set) →
    (burn_token_ids, mint_token_ids) — built by the caller from
    neg_risk_markets.question_count × market metadata (the reference's
    bit-twiddling over index sets, ledger-engine.ts:463-466,815-820).
    """
    c = dedupe_by_id(conversions)
    legs = legs.select(
        F.col("market_id").alias("l_market_id"),
        F.col("index_set").alias("l_index_set"),
        F.col("burn_token_ids"),
        F.col("mint_token_ids"),
    )
    joined = c.join(
        F.broadcast(legs),
        (c.market_id == legs.l_market_id) & (c.index_set == legs.l_index_set),
        "left",
    )
    # mint legs ride in an extra column beyond the normalized schema — the
    # engine's conversion handler reads ev["mint_token_ids"]
    return joined.select(
        F.col("stakeholder").alias("wallet"),
        F.col("block_timestamp").alias("ts"),
        F.col("block_number").cast("long").alias("block_number"),
        F.col("log_index").cast("long").alias("log_index"),
        F.lit("adapter_conversion").alias("type"),
        F.lit("").alias("token_id"),
        F.col("market_id").alias("condition_id"),
        _usd("amount").alias("qty"),
        F.lit(0.0).alias("usdc"),
        F.lit(0.0).alias("fee"),
        F.lit(False).alias("is_buy"),
        F.lit(False).alias("is_in"),
        F.col("burn_token_ids").alias("outcome_token_ids"),
        F.lit(None).cast("array<double>").alias("payout_ratios"),
        F.col("mint_token_ids"),
    )


def build_conversion_legs(
    neg_risk_markets: DataFrame, conversions: DataFrame
) -> DataFrame:
    """Resolve (market_id, index_set) → (burn_token_ids, mint_token_ids)
    for negRisk conversions from the engine's own metadata — the
    reference's no-transfers fallback (src/ledger-engine.ts:1688-1703):
    burn the NO token of every index-set-selected question, mint the YES
    token of the rest; token ids derived per computeNegRiskTokenIds
    (keccak over adapter/wrapped-collateral constants).

    Distributed shape: one pass over the DISTINCT (market_id, index_set)
    pairs (dimension-sized) joined to the latest question_count, keccak
    work in an Arrow-batched mapInPandas — no driver-side loop. Feeds
    :func:`normalize_adapter_conversions` directly.
    """
    import pandas as pd

    from ..functions.keccak import conversion_legs

    # version = (height, question_count): counts only grow, so the max
    # count wins among same-block updates (MarketPrepared + QuestionPrepared
    # land in one block at market creation)
    latest = latest_by_key(
        neg_risk_markets, ["market_id"], ["height", "question_count"]
    ).select("market_id", "question_count")
    pairs = (
        conversions.select("market_id", "index_set")
        .distinct()
        .join(F.broadcast(latest), "market_id")
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, iset, qc in zip(
                pdf["market_id"], pdf["index_set"], pdf["question_count"]
            ):
                burn, mint = conversion_legs(mid, int(iset), int(qc))
                rows.append((mid, iset, burn, mint))
            yield pd.DataFrame(
                rows,
                columns=[
                    "market_id", "index_set", "burn_token_ids", "mint_token_ids",
                ],
            )

    return pairs.mapInPandas(
        run,
        "market_id string, index_set decimal(38,0), "
        "burn_token_ids array<string>, mint_token_ids array<string>",
    )
