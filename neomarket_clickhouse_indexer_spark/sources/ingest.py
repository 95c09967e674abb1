"""EVM log ingest + ABI decode (S1/S2) — raw logs to typed bronze rows,
entirely JVM-side.

Reference: the Subsquid processor streams blocks, filters by
(address, topic0) and ABI-decodes 13 event types in TypeScript
(src/main.ts:149-219 filters, :227-635 decode loop; ABIs src/abi/*.ts).

Spark re-expression: raw logs are rows
  (block_number, block_timestamp, log_index, tx_hash, address,
   topics array<string>, data string)
from any source (file stream, Kafka, an RPC dump). Decoding static ABI
layouts is pure string slicing — 32-byte words at fixed offsets — so each
event type is a ``filter(topic0 == SIG) → select(slice…)`` projection that
whole-stage-codegens over the scan: no Python, no UDF in the hot path.
Dynamic arrays (TransferBatch) use sequence+transform over the counted
region.

Event id = tx_hash-log_index (batch entries append -i), duplicate ids from
re-ingest are collapsed by dedupe_by_id downstream (SURVEY §1.3).

uint256 handling: USDC/token *amounts* decode to DECIMAL(38,0) from the
low 128 bits (values ≥ 2^128 would overflow any engine decimal — the
reference converts to float64 Number() far below that). Keccak-derived
*ids* (token_id, condition_id) must keep full 256-bit range → hex string
form, converted to the reference's decimal-string form only at the edge
(functions/keccak.py handles derivation; hex↔decimal via vectorized
pandas_udf when parity output demands it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RAW_LOG_SCHEMA = (
    "block_number long, block_timestamp timestamp, log_index int, "
    "tx_hash string, address string, topics array<string>, data string"
)

# event signatures (keccak of the canonical ABI signature — public constants)
SIG_TRANSFER_SINGLE = "0xc3d58168c5ae7397731d063d5bbf3d657854427343f4c083240f7aacaa2d0f62"
SIG_TRANSFER_BATCH = "0x4a39dc06d4c0dbc64b70af90fd698a233a518aa5d07e595d983b8c0526c8f7fb"
SIG_POSITION_SPLIT = "0x2e6bb91f8cbcda0c93623c54d0403a43514fabc40084ec96b6d5379a74786298"
SIG_POSITIONS_MERGE = "0x6f13ca62553fcc2bcd2372180a43949c1e4cebba603901ede2f4e14f36b282ca"
SIG_PAYOUT_REDEMPTION = "0x2682012a4a4f1973119f1c9b90745d1bd91fa2bab387344f044cb3586864d18d"


def _word(data: Column, i: int) -> Column:
    """i-th 32-byte word of the data payload ('0x' prefix assumed)."""
    return F.substring(data, 3 + 64 * i, 64)


def _addr_from_topic(topic: Column) -> Column:
    return F.concat(F.lit("0x"), F.substring(topic, 27, 40))


def _uint128_dec(word: Column) -> Column:
    """Low 128 bits of a 64-hex word as DECIMAL(38,0):
    conv(hex16)→decimal per 64-bit chunk, exact decimal arithmetic."""
    hi = F.conv(F.substring(word, 33, 16), 16, 10).cast("decimal(38,0)")
    lo = F.conv(F.substring(word, 49, 16), 16, 10).cast("decimal(38,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(38,0)")  # 2^64
    return (hi * two64 + lo).cast("decimal(38,0)")


def _hex_id(word: Column) -> Column:
    """Full-range 256-bit id as 0x-hex string (no precision loss)."""
    return F.concat(F.lit("0x"), word)


def _common(logs: DataFrame) -> list[Column]:
    return [
        F.concat_ws("-", F.col("tx_hash"), F.col("log_index")).alias("id"),
        F.col("tx_hash"),
        F.col("log_index"),
        F.col("block_number"),
        F.col("block_timestamp"),
        F.col("block_number").alias("height"),
    ]


def decode_transfer_single(logs: DataFrame) -> DataFrame:
    """ERC-1155 TransferSingle(operator idx, from idx, to idx, id, value)
    → transfers rows (reference 001:160-178, main.ts TransferSingle arm)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_TRANSFER_SINGLE)
    return t.select(
        *_common(t),
        _addr_from_topic(F.element_at("topics", 2)).alias("operator"),
        _addr_from_topic(F.element_at("topics", 3)).alias("from"),
        _addr_from_topic(F.element_at("topics", 4)).alias("to"),
        _hex_id(_word(F.col("data"), 0)).alias("token_id"),
        _uint128_dec(_word(F.col("data"), 1)).alias("value"),
    )


def decode_transfer_batch(logs: DataFrame) -> DataFrame:
    """ERC-1155 TransferBatch: ids[] + values[] dynamic arrays → one row
    per (id, value) pair, event id suffixed -i (reference main.ts:466
    `"{id}-{i}"`). Array region: word0/word1 are the two array offsets;
    each array starts with a length word. posexplode over a sequence keeps
    the fan-out inside the executor."""
    t = logs.filter(F.element_at("topics", 1) == SIG_TRANSFER_BATCH)
    n = F.conv(F.substring(_word(F.col("data"), 2), 49, 16), 16, 10).cast("int")
    t = t.withColumn("n_items", n)
    idx = F.explode(F.sequence(F.lit(0), F.col("n_items") - 1)).alias("i")
    t = t.select("*", idx)
    ids_base = 3  # words: [ids_off, vals_off, ids_len, ids..., vals_len, vals...]
    id_word = F.expr(f"substring(data, 3 + 64 * ({ids_base} + i), 64)")
    val_word = F.expr(
        f"substring(data, 3 + 64 * ({ids_base} + n_items + 1 + i), 64)"
    )
    return t.select(
        F.concat_ws("-", F.col("tx_hash"), F.col("log_index"), F.col("i")).alias("id"),
        F.col("tx_hash"),
        F.col("log_index"),
        F.col("block_number"),
        F.col("block_timestamp"),
        F.col("block_number").alias("height"),
        _addr_from_topic(F.element_at("topics", 2)).alias("operator"),
        _addr_from_topic(F.element_at("topics", 3)).alias("from"),
        _addr_from_topic(F.element_at("topics", 4)).alias("to"),
        _hex_id(id_word).alias("token_id"),
        _uint128_dec(val_word).alias("value"),
    )


def decode_position_split(logs: DataFrame) -> DataFrame:
    """CTF PositionSplit(stakeholder idx, collateral idx, parentCollectionId,
    conditionId idx, partition[], amount) → splits rows (reference
    001:49-68)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_POSITION_SPLIT)
    n = F.conv(F.substring(_word(F.col("data"), 3), 49, 16), 16, 10).cast("int")
    t = t.withColumn("n_parts", n)
    part = F.transform(
        F.sequence(F.lit(0), F.col("n_parts") - 1),
        lambda i: _uint128_dec(_word_dyn(4, i)),
    )
    return t.select(
        *_common(t),
        _addr_from_topic(F.element_at("topics", 2)).alias("stakeholder"),
        _addr_from_topic(F.element_at("topics", 3)).alias("collateral_token"),
        _hex_id(_word(F.col("data"), 0)).alias("parent_collection_id"),
        _hex_id(F.substring(F.element_at("topics", 4), 3, 64)).alias("condition_id"),
        part.alias("partition"),
        _uint128_dec(_word(F.col("data"), 2)).alias("amount"),
    )


def _word_dyn(base: int, i: Column) -> Column:
    """Dynamic word access: word at (base + i) with i a column."""
    return F.expr("data").substr(
        (F.lit(3 + 64 * base) + i * 64).cast("int"), F.lit(64)
    )


def decode_positions_merge(logs: DataFrame) -> DataFrame:
    """CTF PositionsMerge — same layout as split (reference 001:73-92)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_POSITIONS_MERGE)
    n = F.conv(F.substring(_word(F.col("data"), 3), 49, 16), 16, 10).cast("int")
    t = t.withColumn("n_parts", n)
    part = F.transform(
        F.sequence(F.lit(0), F.col("n_parts") - 1), lambda i: _uint128_dec(_word_dyn(4, i))
    )
    return t.select(
        *_common(t),
        _addr_from_topic(F.element_at("topics", 2)).alias("stakeholder"),
        _addr_from_topic(F.element_at("topics", 3)).alias("collateral_token"),
        _hex_id(_word(F.col("data"), 0)).alias("parent_collection_id"),
        _hex_id(F.substring(F.element_at("topics", 4), 3, 64)).alias("condition_id"),
        part.alias("partition"),
        _uint128_dec(_word(F.col("data"), 2)).alias("amount"),
    )


def decode_payout_redemption(logs: DataFrame) -> DataFrame:
    """CTF PayoutRedemption(redeemer idx, collateral idx, parentCollectionId
    idx, conditionId, indexSets[], payout) (reference 001:97-116)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_PAYOUT_REDEMPTION)
    n = F.conv(F.substring(_word(F.col("data"), 2), 49, 16), 16, 10).cast("int")
    t = t.withColumn("n_sets", n)
    sets = F.transform(
        F.sequence(F.lit(0), F.col("n_sets") - 1), lambda i: _uint128_dec(_word_dyn(3, i))
    )
    return t.select(
        *_common(t),
        _addr_from_topic(F.element_at("topics", 2)).alias("redeemer"),
        _addr_from_topic(F.element_at("topics", 3)).alias("collateral_token"),
        _hex_id(F.substring(F.element_at("topics", 4), 3, 64)).alias("parent_collection_id"),
        _hex_id(_word(F.col("data"), 0)).alias("condition_id"),
        sets.alias("index_sets"),
        _uint128_dec(_word(F.col("data"), 1)).alias("payout"),
    )


SIG_ORDER_FILLED = "0xd0a08e8c493f9c94f29311604c9de1b4e8c8d4c06bd0c789af57f2d65bfec0f6"
SIG_CONDITION_PREPARATION = "0xab3760c3bd2bb38b5bcf54dc79802ed67338b4cf29f3054ded67ed24661e4177"
SIG_CONDITION_RESOLUTION = "0xb44d84d3289691f71497564b85d4233648d9dbae8cbdbb4329f301c3a0185894"


def decode_order_filled(logs: DataFrame) -> DataFrame:
    """CTF-Exchange OrderFilled(orderHash idx, maker idx, taker idx,
    makerAssetId, takerAssetId, makerAmountFilled, takerAmountFilled, fee)
    → trades rows with the derived trading fields (reference trades table
    001:9-44; decode arm src/main.ts:254-310). Asset id 0 is USDC — the
    non-zero side is the outcome token; is_maker_buy = (makerAssetId == 0);
    usdc/token amounts follow the paying side (both 6-decimals)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_ORDER_FILLED)
    maker_asset = _word(F.col("data"), 0)
    taker_asset = _word(F.col("data"), 1)
    maker_amt = _uint128_dec(_word(F.col("data"), 2))
    taker_amt = _uint128_dec(_word(F.col("data"), 3))
    is_maker_buy = F.conv(F.substring(maker_asset, 49, 16), 16, 10).cast(
        "decimal(38,0)"
    ).eqNullSafe(F.lit(0).cast("decimal(38,0)")) & (
        F.substring(maker_asset, 1, 48) == "0" * 48
    )
    return t.select(
        *_common(t),
        F.element_at("topics", 2).alias("order_hash"),
        _addr_from_topic(F.element_at("topics", 3)).alias("maker"),
        _addr_from_topic(F.element_at("topics", 4)).alias("taker"),
        _hex_id(maker_asset).alias("maker_asset_id"),
        _hex_id(taker_asset).alias("taker_asset_id"),
        maker_amt.alias("maker_amount"),
        taker_amt.alias("taker_amount"),
        _uint128_dec(_word(F.col("data"), 4)).alias("fee"),
        is_maker_buy.alias("is_maker_buy"),
        (~is_maker_buy).alias("is_taker_buy"),
        F.when(is_maker_buy, _hex_id(taker_asset))
        .otherwise(_hex_id(maker_asset))
        .alias("token_id"),
        F.when(is_maker_buy, maker_amt).otherwise(taker_amt).alias("usdc_amount"),
        F.when(is_maker_buy, taker_amt).otherwise(maker_amt).alias("token_amount"),
    )


def decode_condition_preparation(logs: DataFrame) -> DataFrame:
    """CTF ConditionPreparation(conditionId idx, oracle idx, questionId idx,
    outcomeSlotCount) → conditions version rows (is_resolved=false;
    reference 001:121-141, main.ts ConditionPreparation arm)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_CONDITION_PREPARATION)
    return t.select(
        *_common(t),
        _hex_id(F.substring(F.element_at("topics", 2), 3, 64)).alias("condition_id"),
        _addr_from_topic(F.element_at("topics", 3)).alias("oracle"),
        _hex_id(F.substring(F.element_at("topics", 4), 3, 64)).alias("question_id"),
        F.conv(F.substring(_word(F.col("data"), 0), 49, 16), 16, 10)
        .cast("int")
        .alias("outcome_slot_count"),
        F.lit(False).alias("is_resolved"),
        F.lit(None).cast("array<decimal(38,0)>").alias("payout_numerators"),
        F.lit(0).cast("decimal(38,0)").alias("payout_denominator"),
    )


def decode_condition_resolution(logs: DataFrame) -> DataFrame:
    """CTF ConditionResolution(conditionId idx, oracle idx, questionId idx,
    outcomeSlotCount, payoutNumerators[]) → resolved conditions version
    rows; denominator = Σ numerators (reference main.ts resolution arm +
    created_at backfill join handled in ledger/prep.py)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_CONDITION_RESOLUTION)
    n = F.conv(F.substring(_word(F.col("data"), 2), 49, 16), 16, 10).cast("int")
    t = t.withColumn("n_outcomes", n)
    nums = F.transform(
        F.sequence(F.lit(0), F.col("n_outcomes") - 1),
        lambda i: _uint128_dec(_word_dyn(3, i)),
    )
    return t.select(
        *_common(t),
        _hex_id(F.substring(F.element_at("topics", 2), 3, 64)).alias("condition_id"),
        _addr_from_topic(F.element_at("topics", 3)).alias("oracle"),
        _hex_id(F.substring(F.element_at("topics", 4), 3, 64)).alias("question_id"),
        F.col("n_outcomes").alias("outcome_slot_count"),
        F.lit(True).alias("is_resolved"),
        nums.alias("payout_numerators"),
        F.aggregate(
            nums,
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, x: (acc + x).cast("decimal(38,0)"),
        ).alias("payout_denominator"),
    )


# --- negRisk adapter events (reference src/abi/NegRiskAdapter.ts:6-13;
#     decode arms src/main.ts:484-585; tables 001:145-155,183-247)

SIG_MARKET_PREPARED = "0xf059ab16d1ca60e123eab60e3c02b68faf060347c701a5d14885a8e1def7b3a8"
SIG_QUESTION_PREPARED = "0xaac410f87d423a922a7b226ac68f0c2eaf5bf6d15e644ac0758c7f96e2c253f7"
SIG_ADAPTER_POSITION_SPLIT = "0xbbed930dbfb7907ae2d60ddf78345610214f26419a0128df39b6cc3d9e5df9b0"
SIG_ADAPTER_POSITIONS_MERGE = "0xba33ac50d8894676597e6e35dc09cff59854708b642cd069d21eb9c7ca072a04"
SIG_ADAPTER_PAYOUT_REDEMPTION = "0x9140a6a270ef945260c03894b3c6b3b2695e9d5101feef0ff24fec960cfd3224"
SIG_POSITIONS_CONVERTED = "0xb03d19dddbc72a87e735ff0ea3b57bef133ebe44e1894284916a84044deb367e"

# fee module events (reference src/abi/FeeModule.ts:6-7; src/main.ts:587-633)
SIG_FEE_REFUNDED = "0xb608d2bf25d8b4b744ba23ce2ea9802ea955e216c064a62f42152fbf98958d24"
SIG_FEE_WITHDRAWN = "0x6ce49f8691a80db5eb4f60cd55b14640529346a7ddf9bf8f77a423fa6a10bfdb"


def decode_market_prepared(logs: DataFrame) -> DataFrame:
    """NegRiskAdapter MarketPrepared(marketId idx, oracle idx, feeBips,
    data) → neg_risk_markets version rows with question_count=0 (reference
    src/main.ts:484-497; table 001:145-155)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_MARKET_PREPARED)
    return t.select(
        _hex_id(F.substring(F.element_at("topics", 2), 3, 64)).alias("market_id"),
        _addr_from_topic(F.element_at("topics", 3)).alias("oracle"),
        _uint128_dec(_word(F.col("data"), 0)).alias("fee_bips"),
        F.lit(0).cast("int").alias("question_count"),
        F.col("block_timestamp").alias("updated_at"),
        F.col("block_number").alias("height"),
    )


def decode_question_prepared(logs: DataFrame) -> DataFrame:
    """NegRiskAdapter QuestionPrepared(marketId idx, questionId idx, index,
    data) → neg_risk_markets version rows with question_count = index + 1
    (reference src/main.ts:499-512: the adapter numbers questions 0..n-1,
    so the latest row's count is index+1)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_QUESTION_PREPARED)
    idx = F.conv(F.substring(_word(F.col("data"), 0), 49, 16), 16, 10).cast("int")
    return t.select(
        _hex_id(F.substring(F.element_at("topics", 2), 3, 64)).alias("market_id"),
        _hex_id(F.substring(F.element_at("topics", 3), 3, 64)).alias("question_id"),
        (idx + F.lit(1)).alias("question_count"),
        F.col("block_timestamp").alias("updated_at"),
        F.col("block_number").alias("height"),
    )


def _decode_adapter_simple(logs: DataFrame, sig: str, who: str) -> DataFrame:
    """Shared arm for the adapter's PositionSplit / PositionsMerge
    (identical layout: stakeholder idx, conditionId idx, amount —
    reference src/main.ts:514-543; tables 001:183-213)."""
    t = logs.filter(F.element_at("topics", 1) == sig)
    return t.select(
        *_common(t),
        _addr_from_topic(F.element_at("topics", 2)).alias(who),
        _hex_id(F.substring(F.element_at("topics", 3), 3, 64)).alias("condition_id"),
        _uint128_dec(_word(F.col("data"), 0)).alias("amount"),
    )


def decode_adapter_position_split(logs: DataFrame) -> DataFrame:
    return _decode_adapter_simple(
        logs, SIG_ADAPTER_POSITION_SPLIT, "stakeholder"
    )


def decode_adapter_positions_merge(logs: DataFrame) -> DataFrame:
    return _decode_adapter_simple(
        logs, SIG_ADAPTER_POSITIONS_MERGE, "stakeholder"
    )


def decode_adapter_payout_redemption(logs: DataFrame) -> DataFrame:
    """NegRiskAdapter PayoutRedemption(redeemer idx, conditionId idx,
    amounts[], payout) (reference src/main.ts:545-563; table 001:215-230).
    ABI data head = [amounts_offset, payout]; tail = [len, items…]."""
    t = logs.filter(F.element_at("topics", 1) == SIG_ADAPTER_PAYOUT_REDEMPTION)
    n = F.conv(F.substring(_word(F.col("data"), 2), 49, 16), 16, 10).cast("int")
    t = t.withColumn("n_amounts", n)
    amounts = F.transform(
        F.sequence(F.lit(0), F.col("n_amounts") - 1),
        lambda i: _uint128_dec(_word_dyn(3, i)),
    )
    return t.select(
        *_common(t),
        _addr_from_topic(F.element_at("topics", 2)).alias("redeemer"),
        _hex_id(F.substring(F.element_at("topics", 3), 3, 64)).alias("condition_id"),
        F.when(F.col("n_amounts") > 0, amounts)
        .otherwise(F.array().cast("array<decimal(38,0)>"))
        .alias("amounts"),
        _uint128_dec(_word(F.col("data"), 1)).alias("payout"),
    )


def decode_positions_converted(logs: DataFrame) -> DataFrame:
    """NegRiskAdapter PositionsConverted(stakeholder idx, marketId idx,
    indexSet idx, amount) (reference src/main.ts:565-585; table
    001:232-247). index_set is a small bitmask — DECIMAL(38,0) is safe."""
    t = logs.filter(F.element_at("topics", 1) == SIG_POSITIONS_CONVERTED)
    return t.select(
        *_common(t),
        _addr_from_topic(F.element_at("topics", 2)).alias("stakeholder"),
        _hex_id(F.substring(F.element_at("topics", 3), 3, 64)).alias("market_id"),
        _uint128_dec(F.substring(F.element_at("topics", 4), 3, 64)).alias("index_set"),
        _uint128_dec(_word(F.col("data"), 0)).alias("amount"),
    )


def decode_fee_refunded(logs: DataFrame) -> DataFrame:
    """FeeModule FeeRefunded(orderHash idx, to idx, id, refund,
    feeCharged idx) (reference src/main.ts:587-610; table 001:252-270).
    The emitting module address distinguishes plain vs negRisk fee module."""
    t = logs.filter(F.element_at("topics", 1) == SIG_FEE_REFUNDED)
    return t.select(
        *_common(t),
        F.col("address").alias("module"),
        F.element_at("topics", 2).alias("order_hash"),
        _addr_from_topic(F.element_at("topics", 3)).alias("to"),
        _hex_id(_word(F.col("data"), 0)).alias("token_id"),
        _uint128_dec(_word(F.col("data"), 1)).alias("refund"),
        _uint128_dec(F.substring(F.element_at("topics", 4), 3, 64)).alias("fee_charged"),
    )


def decode_fee_withdrawn(logs: DataFrame) -> DataFrame:
    """FeeModule FeeWithdrawn(token, to, id, amount) — nothing indexed, all
    four words in data (reference src/main.ts:612-633; table 001:272-287)."""
    t = logs.filter(F.element_at("topics", 1) == SIG_FEE_WITHDRAWN)
    return t.select(
        *_common(t),
        F.col("address").alias("module"),
        _addr_from_topic(F.concat(F.lit("0x"), _word(F.col("data"), 0))).alias("token"),
        _addr_from_topic(F.concat(F.lit("0x"), _word(F.col("data"), 1))).alias("to"),
        _hex_id(_word(F.col("data"), 2)).alias("token_id"),
        _uint128_dec(_word(F.col("data"), 3)).alias("amount"),
    )
