"""ABI-decode round trip: logs encoded in Python (ground truth) must decode
to exact typed rows via the JVM-side slicing decoders (S1/S2)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from neomarket_clickhouse_indexer_spark.sources.ingest import (
    RAW_LOG_SCHEMA,
    SIG_PAYOUT_REDEMPTION,
    SIG_POSITION_SPLIT,
    SIG_TRANSFER_BATCH,
    SIG_TRANSFER_SINGLE,
    decode_payout_redemption,
    decode_position_split,
    decode_transfer_batch,
    decode_transfer_single,
)

T0 = dt.datetime(2024, 1, 1)


def w(value: int) -> str:
    return f"{value:064x}"


def topic_addr(addr: str) -> str:
    return "0x" + "0" * 24 + addr.removeprefix("0x")


def topic_hex(h: str) -> str:
    return "0x" + h.removeprefix("0x").rjust(64, "0")


A, B, OP = "0x" + "aa" * 20, "0x" + "bb" * 20, "0x" + "cc" * 20
COND = "11" * 32
TOKEN = 0xDEADBEEF_00112233_44556677_8899AABB  # 128-bit id


def log_row(topics, data_words, log_index=0, tx="0xt1"):
    return (
        100,
        T0,
        log_index,
        tx,
        "0x" + "ee" * 20,
        topics,
        "0x" + "".join(data_words),
    )


def test_transfer_single_roundtrip(spark):
    rows = [
        log_row(
            [SIG_TRANSFER_SINGLE, topic_addr(OP), topic_addr(A), topic_addr(B)],
            [w(TOKEN), w(5_000_000)],
        ),
        # a non-matching event type must be filtered out
        log_row([SIG_TRANSFER_BATCH, topic_addr(OP), topic_addr(A), topic_addr(B)], [w(0)]),
    ]
    df = spark.createDataFrame(rows, RAW_LOG_SCHEMA)
    out = decode_transfer_single(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["id"] == "0xt1-0"
    assert r["operator"] == OP and r["from"] == A and r["to"] == B
    assert r["token_id"] == "0x" + w(TOKEN)
    assert r["value"] == Decimal(5_000_000)


def test_transfer_batch_fanout_roundtrip(spark):
    ids = [TOKEN, TOKEN + 1, TOKEN + 2]
    vals = [1_000_000, 2_000_000, 3_000_000]
    # ABI: [ids_offset, vals_offset, ids_len, ids..., vals_len, vals...]
    data = [w(0x40), w(0x40 + 32 * (1 + len(ids))), w(len(ids))] + [w(i) for i in ids]
    data += [w(len(vals))] + [w(v) for v in vals]
    df = spark.createDataFrame(
        [log_row([SIG_TRANSFER_BATCH, topic_addr(OP), topic_addr(A), topic_addr(B)], data, log_index=7)],
        RAW_LOG_SCHEMA,
    )
    out = decode_transfer_batch(df).orderBy("id").collect()
    assert [r["id"] for r in out] == ["0xt1-7-0", "0xt1-7-1", "0xt1-7-2"]
    assert [int(r["value"]) for r in out] == vals
    assert [r["token_id"] for r in out] == ["0x" + w(i) for i in ids]


def test_position_split_roundtrip(spark):
    # data: [parentCollectionId, partition_offset, amount, part_len, parts...]
    data = [w(0), w(0x60), w(10_000_000), w(2), w(1), w(2)]
    df = spark.createDataFrame(
        [log_row(
            [SIG_POSITION_SPLIT, topic_addr(A), topic_addr(B), topic_hex(COND)],
            data,
        )],
        RAW_LOG_SCHEMA,
    )
    r = decode_position_split(df).collect()[0]
    assert r["stakeholder"] == A and r["collateral_token"] == B
    assert r["condition_id"] == "0x" + COND
    assert [int(x) for x in r["partition"]] == [1, 2]
    assert int(r["amount"]) == 10_000_000


def test_payout_redemption_roundtrip(spark):
    # data: [conditionId, payout, sets_offset?] — layout per decoder:
    # [condition_id, payout, sets_len, sets...]
    data = [w(int(COND, 16) % 2**128), w(7_500_000), w(2), w(1), w(2)]
    df = spark.createDataFrame(
        [log_row(
            [SIG_PAYOUT_REDEMPTION, topic_addr(A), topic_addr(B), topic_hex("00")],
            data,
        )],
        RAW_LOG_SCHEMA,
    )
    r = decode_payout_redemption(df).collect()[0]
    assert r["redeemer"] == A
    assert int(r["payout"]) == 7_500_000
    assert [int(x) for x in r["index_sets"]] == [1, 2]


def test_order_filled_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_ORDER_FILLED,
        decode_order_filled,
    )

    oh = topic_hex("77" * 32)
    # maker pays USDC (asset 0) → maker is buyer
    data = [w(0), w(TOKEN), w(5_000_000), w(10_000_000), w(25_000)]
    df = spark.createDataFrame(
        [log_row([SIG_ORDER_FILLED, oh, topic_addr(A), topic_addr(B)], data)],
        RAW_LOG_SCHEMA,
    )
    r = decode_order_filled(df).collect()[0]
    assert r["maker"] == A and r["taker"] == B
    assert r["is_maker_buy"] is True and r["is_taker_buy"] is False
    assert r["token_id"] == "0x" + w(TOKEN)
    assert int(r["usdc_amount"]) == 5_000_000
    assert int(r["token_amount"]) == 10_000_000
    assert int(r["fee"]) == 25_000

    # reverse: maker sells the token
    data2 = [w(TOKEN), w(0), w(10_000_000), w(5_000_000), w(0)]
    df2 = spark.createDataFrame(
        [log_row([SIG_ORDER_FILLED, oh, topic_addr(A), topic_addr(B)], data2)],
        RAW_LOG_SCHEMA,
    )
    r2 = decode_order_filled(df2).collect()[0]
    assert r2["is_maker_buy"] is False and r2["is_taker_buy"] is True
    assert int(r2["usdc_amount"]) == 5_000_000
    assert int(r2["token_amount"]) == 10_000_000


def test_condition_lifecycle_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_CONDITION_PREPARATION,
        SIG_CONDITION_RESOLUTION,
        decode_condition_preparation,
        decode_condition_resolution,
    )

    cond, oracle, qid = topic_hex(COND), topic_addr(A), topic_hex("99" * 32)
    prep = log_row([SIG_CONDITION_PREPARATION, cond, oracle, qid], [w(2)])
    reso = log_row(
        [SIG_CONDITION_RESOLUTION, cond, oracle, qid],
        [w(0x40), w(0), w(2), w(1), w(0)],  # offset-ish word, pad, len, [1, 0]
        log_index=1,
    )
    df = spark.createDataFrame([prep, reso], RAW_LOG_SCHEMA)
    p = decode_condition_preparation(df).collect()[0]
    assert p["outcome_slot_count"] == 2 and p["is_resolved"] is False
    assert p["condition_id"] == "0x" + COND
    r = decode_condition_resolution(df).collect()[0]
    assert r["is_resolved"] is True
    assert [int(x) for x in r["payout_numerators"]] == [1, 0]
    assert int(r["payout_denominator"]) == 1


# --- negRisk adapter + fee module arms (the 8 decoders completing S2;
#     reference src/main.ts:484-633, src/abi/NegRiskAdapter.ts:6-13,
#     src/abi/FeeModule.ts:6-7)

MARKET = "44" * 32
QID = "55" * 32


def test_market_prepared_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_MARKET_PREPARED,
        decode_market_prepared,
    )

    # data: [feeBips, bytes_offset, bytes_len] (trailing bytes unused)
    row = log_row(
        [SIG_MARKET_PREPARED, topic_hex(MARKET), topic_addr(A)],
        [w(200), w(0x40), w(0)],
    )
    r = decode_market_prepared(spark.createDataFrame([row], RAW_LOG_SCHEMA)).collect()[0]
    assert r["market_id"] == "0x" + MARKET
    assert r["oracle"] == A
    assert int(r["fee_bips"]) == 200
    assert r["question_count"] == 0
    assert r["updated_at"] == T0 and r["height"] == 100


def test_question_prepared_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_QUESTION_PREPARED,
        decode_question_prepared,
    )

    # data: [index, bytes_offset, bytes_len]; question_count = index + 1
    row = log_row(
        [SIG_QUESTION_PREPARED, topic_hex(MARKET), topic_hex(QID)],
        [w(3), w(0x40), w(0)],
    )
    r = decode_question_prepared(spark.createDataFrame([row], RAW_LOG_SCHEMA)).collect()[0]
    assert r["market_id"] == "0x" + MARKET
    assert r["question_id"] == "0x" + QID
    assert r["question_count"] == 4


def test_adapter_split_merge_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_ADAPTER_POSITION_SPLIT,
        SIG_ADAPTER_POSITIONS_MERGE,
        decode_adapter_position_split,
        decode_adapter_positions_merge,
    )

    rows = [
        log_row([SIG_ADAPTER_POSITION_SPLIT, topic_addr(A), topic_hex(COND)],
                [w(10_000_000)]),
        log_row([SIG_ADAPTER_POSITIONS_MERGE, topic_addr(B), topic_hex(COND)],
                [w(4_000_000)], log_index=1),
    ]
    df = spark.createDataFrame(rows, RAW_LOG_SCHEMA)
    s = decode_adapter_position_split(df).collect()
    m = decode_adapter_positions_merge(df).collect()
    assert len(s) == 1 and len(m) == 1
    assert s[0]["stakeholder"] == A and s[0]["condition_id"] == "0x" + COND
    assert int(s[0]["amount"]) == 10_000_000
    assert s[0]["id"] == "0xt1-0"
    assert m[0]["stakeholder"] == B and int(m[0]["amount"]) == 4_000_000


def test_adapter_payout_redemption_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_ADAPTER_PAYOUT_REDEMPTION,
        decode_adapter_payout_redemption,
    )

    # data head = [amounts_offset, payout]; tail = [len, items...]
    rows = [
        log_row(
            [SIG_ADAPTER_PAYOUT_REDEMPTION, topic_addr(A), topic_hex(COND)],
            [w(0x40), w(7_500_000), w(2), w(1_000_000), w(2_000_000)],
        ),
        # empty amounts array must decode to [] (not garbage words)
        log_row(
            [SIG_ADAPTER_PAYOUT_REDEMPTION, topic_addr(B), topic_hex(COND)],
            [w(0x40), w(9), w(0)],
            log_index=1,
        ),
    ]
    out = decode_adapter_payout_redemption(
        spark.createDataFrame(rows, RAW_LOG_SCHEMA)
    ).orderBy("log_index").collect()
    assert out[0]["redeemer"] == A
    assert [int(x) for x in out[0]["amounts"]] == [1_000_000, 2_000_000]
    assert int(out[0]["payout"]) == 7_500_000
    assert out[1]["amounts"] == [] and int(out[1]["payout"]) == 9


def test_positions_converted_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_POSITIONS_CONVERTED,
        decode_positions_converted,
    )

    row = log_row(
        [SIG_POSITIONS_CONVERTED, topic_addr(A), topic_hex(MARKET), topic_hex("05")],
        [w(6_000_000)],
    )
    r = decode_positions_converted(spark.createDataFrame([row], RAW_LOG_SCHEMA)).collect()[0]
    assert r["stakeholder"] == A
    assert r["market_id"] == "0x" + MARKET
    assert int(r["index_set"]) == 5
    assert int(r["amount"]) == 6_000_000


def test_fee_refunded_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_FEE_REFUNDED,
        decode_fee_refunded,
    )

    oh = topic_hex("77" * 32)
    row = log_row(
        [SIG_FEE_REFUNDED, oh, topic_addr(A), topic_hex("61A8")],  # feeCharged=25000
        [w(TOKEN), w(12_345)],
    )
    r = decode_fee_refunded(spark.createDataFrame([row], RAW_LOG_SCHEMA)).collect()[0]
    assert r["module"] == "0x" + "ee" * 20  # emitting contract address
    assert r["order_hash"] == oh
    assert r["to"] == A
    assert r["token_id"] == "0x" + w(TOKEN)
    assert int(r["refund"]) == 12_345
    assert int(r["fee_charged"]) == 25_000


def test_fee_withdrawn_roundtrip(spark):
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_FEE_WITHDRAWN,
        decode_fee_withdrawn,
    )

    usdc = "0x" + "dd" * 20
    row = log_row(
        [SIG_FEE_WITHDRAWN],
        [w(int(usdc, 16)), w(int(B, 16)), w(TOKEN), w(99_000_000)],
    )
    r = decode_fee_withdrawn(spark.createDataFrame([row], RAW_LOG_SCHEMA)).collect()[0]
    assert r["module"] == "0x" + "ee" * 20
    assert r["token"] == usdc
    assert r["to"] == B
    assert r["token_id"] == "0x" + w(TOKEN)
    assert int(r["amount"]) == 99_000_000


def test_decoded_adapter_frames_feed_ledger_prep(spark):
    """The decode layer's own output (no hand-built frames) must flow
    through ledger/prep's adapter + fee normalizers end-to-end — the gap
    round 1 flagged: raw logs of 5 of the 13 tables previously could not
    be produced by the engine's decode layer."""
    from decimal import Decimal as D

    from neomarket_clickhouse_indexer_spark.ledger.prep import (
        normalize_adapter_conversions,
        normalize_adapter_redemptions,
        normalize_adapter_simple,
        normalize_fees,
    )
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_ADAPTER_PAYOUT_REDEMPTION,
        SIG_ADAPTER_POSITION_SPLIT,
        SIG_ADAPTER_POSITIONS_MERGE,
        SIG_FEE_REFUNDED,
        SIG_FEE_WITHDRAWN,
        SIG_POSITIONS_CONVERTED,
        decode_adapter_payout_redemption,
        decode_adapter_position_split,
        decode_adapter_positions_merge,
        decode_fee_refunded,
        decode_fee_withdrawn,
        decode_positions_converted,
    )

    logs = spark.createDataFrame(
        [
            log_row([SIG_ADAPTER_POSITION_SPLIT, topic_addr(A), topic_hex(COND)],
                    [w(10_000_000)], log_index=0),
            log_row([SIG_ADAPTER_POSITIONS_MERGE, topic_addr(A), topic_hex(COND)],
                    [w(4_000_000)], log_index=1),
            log_row(
                [SIG_ADAPTER_PAYOUT_REDEMPTION, topic_addr(A), topic_hex(COND)],
                [w(0x40), w(7_500_000), w(2), w(1_000_000), w(2_000_000)],
                log_index=2,
            ),
            log_row(
                [SIG_POSITIONS_CONVERTED, topic_addr(A), topic_hex(MARKET), topic_hex("01")],
                [w(6_000_000)], log_index=3,
            ),
            log_row([SIG_FEE_REFUNDED, topic_hex("77" * 32), topic_addr(A), topic_hex("61A8")],
                    [w(TOKEN), w(12_345)], log_index=4),
            log_row([SIG_FEE_WITHDRAWN],
                    [w(0), w(int(A, 16)), w(TOKEN), w(99_000_000)], log_index=5),
        ],
        RAW_LOG_SCHEMA,
    )

    meta = spark.createDataFrame(
        [("0x" + COND, ["tok-yes", "tok-no"], T0)],
        "condition_id string, token_ids array<string>, updated_at timestamp",
    )
    conditions = spark.createDataFrame(
        [("0x" + COND, True, [D(1), D(0)], D(1), 100)],
        "condition_id string, is_resolved boolean, "
        "payout_numerators array<decimal(38,0)>, "
        "payout_denominator decimal(38,0), height long",
    )
    # legs resolved from the engine's own decoded metadata (MarketPrepared
    # + QuestionPrepared → question_count; keccak-derived token ids) — no
    # hand-built frame
    from neomarket_clickhouse_indexer_spark.ledger.prep import (
        build_conversion_legs,
    )
    from neomarket_clickhouse_indexer_spark.sources.ingest import (
        SIG_MARKET_PREPARED,
        SIG_QUESTION_PREPARED,
        decode_market_prepared,
        decode_question_prepared,
    )

    meta_logs = spark.createDataFrame(
        [
            log_row([SIG_MARKET_PREPARED, topic_hex(MARKET), topic_addr(A)],
                    [w(200), w(0x40), w(0)], log_index=6),
            log_row([SIG_QUESTION_PREPARED, topic_hex(MARKET), topic_hex(QID)],
                    [w(1), w(0x40), w(0)], log_index=7),  # index 1 → count 2
        ],
        RAW_LOG_SCHEMA,
    )
    nrm = decode_market_prepared(meta_logs).unionByName(
        decode_question_prepared(meta_logs), allowMissingColumns=True
    )
    legs = build_conversion_legs(nrm, decode_positions_converted(logs))

    split_n = normalize_adapter_simple(
        decode_adapter_position_split(logs), meta, "adapter_split"
    ).collect()
    merge_n = normalize_adapter_simple(
        decode_adapter_positions_merge(logs), meta, "adapter_merge"
    ).collect()
    red_n = normalize_adapter_redemptions(
        decode_adapter_payout_redemption(logs), meta, conditions
    ).collect()
    conv_n = normalize_adapter_conversions(
        decode_positions_converted(logs), legs
    ).collect()
    fee_n = normalize_fees(
        decode_fee_refunded(logs), decode_fee_withdrawn(logs)
    ).collect()

    assert split_n[0]["type"] == "adapter_split"
    assert split_n[0]["wallet"] == A
    assert split_n[0]["outcome_token_ids"] == ["tok-yes", "tok-no"]
    assert split_n[0]["usdc"] == 10.0
    assert merge_n[0]["type"] == "adapter_merge" and merge_n[0]["usdc"] == 4.0
    assert red_n[0]["type"] == "adapter_redemption"
    assert red_n[0]["payout_ratios"] == [1.0, 0.0]
    from neomarket_clickhouse_indexer_spark.functions.keccak import (
        neg_risk_token_ids,
    )

    toks = neg_risk_token_ids("0x" + MARKET, 2)
    assert conv_n[0]["type"] == "adapter_conversion"
    # index_set=1 selects question 0: burn its NO leg, mint question 1's YES
    assert conv_n[0]["outcome_token_ids"] == [toks[0]["no"]]
    assert conv_n[0]["mint_token_ids"] == [toks[1]["yes"]]
    assert conv_n[0]["qty"] == 6.0
    types = sorted(r["type"] for r in fee_n)
    assert types == ["fee_refund", "fee_withdrawal"]
    assert {r["usdc"] for r in fee_n} == {0.012345, 99.0}
