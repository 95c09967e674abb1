"""Pure-Python Keccak-256 (the pre-FIPS Ethereum variant) + the reference's
token-id derivation.

The reference derives outcome token ids on the fly with
``keccak256(encodePacked(...))`` — collectionId → positionId → tokenId
(reference src/ledger-engine.ts:441-491). Python's ``hashlib.sha3_256`` is
FIPS-202 SHA3 (domain-separation suffix 0x06) — NOT what Ethereum uses
(suffix 0x01), so we implement Keccak-f[1600] from the public specification.

Exposed two ways: driver-side (build the token dimension once per condition
set — it's metadata-sized), and as a pandas UDF for inline derivation. Both
are pure CPU, deterministic, no dependencies.
"""

from __future__ import annotations

_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_MASK = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[list[int]]) -> None:
    for rc in _RC:
        # theta
        c = [state[x][0] ^ state[x][1] ^ state[x][2] ^ state[x][3] ^ state[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(state[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        state[0][0] ^= rc


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    state = [[0] * 5 for _ in range(5)]
    # pad10*1 with the Keccak (0x01) domain byte, not SHA3's 0x06
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    for block_start in range(0, len(padded), rate):
        block = padded[block_start : block_start + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        _keccak_f(state)
    out = bytearray()
    for i in range(4):  # 32 bytes from the first lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)


def keccak256_hex(data: bytes) -> str:
    return "0x" + keccak256(data).hex()


# --- reference token-id derivation (src/ledger-engine.ts:441-491) ----------


def _pack_uint(value: int, bits: int = 256) -> bytes:
    return value.to_bytes(bits // 8, "big")


def collection_id(parent_collection_id: str, condition_id: str, index_set: int) -> str:
    """keccak(encodePacked(bytes32 parent, bytes32 conditionId, uint256
    indexSet)) — the reference's collection derivation
    (computeCollectionId, src/ledger-engine.ts:441-446; the zero parent is
    still 32 zero bytes in the packed preimage)."""
    parent = (
        bytes.fromhex(parent_collection_id.removeprefix("0x").rjust(64, "0"))
        if parent_collection_id
        else b"\x00" * 32
    )
    cond = bytes.fromhex(condition_id.removeprefix("0x"))
    return "0x" + keccak256(parent + cond + _pack_uint(index_set)).hex()


def position_id(collateral_token: str, coll_id: str) -> str:
    """tokenId = uint256(keccak(collateral ++ collectionId)) as decimal
    string — token ids exceed Decimal(38) so they stay strings (SURVEY
    §1.2)."""
    collateral = bytes.fromhex(collateral_token.removeprefix("0x"))
    digest = keccak256(collateral + bytes.fromhex(coll_id.removeprefix("0x")))
    return str(int.from_bytes(digest, "big"))


def outcome_token_ids(
    collateral_token: str, condition_id: str, outcome_slot_count: int = 2
) -> list[str]:
    """One token id per outcome (index sets 1, 2, 4, ... — bit per slot)."""
    return [
        position_id(
            collateral_token, collection_id("0x0", condition_id, 1 << i)
        )
        for i in range(outcome_slot_count)
    ]


# --- negRisk id bit-twiddling (reference src/ledger-engine.ts:463-466,
#     815-820): a negRisk market id is the question id with the low byte
#     zeroed; question i's id sets the low byte to i; index-set bit tests
#     select which questions a conversion burns.


def neg_risk_market_id(question_id: str) -> str:
    """Zero the low byte of a 32-byte question id."""
    v = int(question_id, 16)
    return "0x" + f"{(v >> 8) << 8:064x}"


def neg_risk_question_id(market_id: str, question_index: int) -> str:
    """market id | question index (low byte)."""
    if not 0 <= question_index < 256:
        raise ValueError("question_index must fit one byte")
    v = int(market_id, 16)
    return "0x" + f"{((v >> 8) << 8) | question_index:064x}"


def index_set_questions(index_set: int, question_count: int) -> list[int]:
    """Bit test: which question indices an index set selects."""
    return [i for i in range(question_count) if (index_set >> i) & 1]


# public Polygon contract addresses (reference src/constants.ts:19-20)
NEGRISK_ADAPTER = "0xd91E80cF2E7be2e162c6513ceD06f1dD0dA35296"
NEGRISK_WRAPPED_COLLATERAL = "0x3A3BD7bb9528E159577F7C2e685CC81A765002E2"
ZERO_BYTES32 = "0x" + "00" * 32


def condition_id_from_question(
    oracle: str, question_id: str, outcome_slot_count: int
) -> str:
    """keccak(encodePacked(address, bytes32, uint256)) — the CTF condition
    id derivation (reference computeConditionIdFromQuestion,
    src/ledger-engine.ts:475-480)."""
    oracle_b = bytes.fromhex(oracle.removeprefix("0x"))
    qid = bytes.fromhex(question_id.removeprefix("0x"))
    return "0x" + keccak256(oracle_b + qid + _pack_uint(outcome_slot_count)).hex()


def neg_risk_token_ids(market_id: str, question_count: int) -> list[dict]:
    """Per-question (yes, no) outcome token ids of a negRisk market
    (reference computeNegRiskTokenIds, src/ledger-engine.ts:482-491):
    question i's id = market id with low byte i; condition = CTF derivation
    with the adapter as oracle and 2 slots; tokens under the zero parent
    collection and the wrapped collateral."""
    out = []
    for i in range(question_count):
        qid = neg_risk_question_id(market_id, i)
        cond = condition_id_from_question(NEGRISK_ADAPTER, qid, 2)
        yes, no = outcome_token_ids(NEGRISK_WRAPPED_COLLATERAL, cond, 2)
        out.append({"yes": yes, "no": no})
    return out


def conversion_legs(market_id: str, index_set: int, question_count: int) -> tuple:
    """(burn_token_ids, mint_token_ids) for a negRisk conversion
    (reference fallback path, src/ledger-engine.ts:1688-1703): burn the NO
    token of every question selected by the index set, mint the YES token
    of every question NOT selected."""
    tokens = neg_risk_token_ids(market_id, question_count)
    burn = [tokens[i]["no"] for i in index_set_questions(index_set, question_count)]
    selected = set(index_set_questions(index_set, question_count))
    mint = [tokens[i]["yes"] for i in range(question_count) if i not in selected]
    return burn, mint
