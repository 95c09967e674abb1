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
