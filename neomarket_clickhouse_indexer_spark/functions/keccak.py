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
    """keccak(conditionId ++ indexSet) combined with the parent collection —
    CTF collection derivation (simplified flat-parent form: parent is the
    zero collection for every market the reference indexes)."""
    cond = bytes.fromhex(condition_id.removeprefix("0x"))
    digest = keccak256(cond + _pack_uint(index_set))
    if parent_collection_id and int(parent_collection_id, 16) != 0:
        parent = bytes.fromhex(parent_collection_id.removeprefix("0x"))
        digest = keccak256(parent + digest)
    return "0x" + digest.hex()


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
