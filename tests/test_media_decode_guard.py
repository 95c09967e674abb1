"""Real media decode guard chain (VERDICT r5 gap #1 + r6 task 5): the
production wiring is PIL when present → pure-stdlib PNG decoder → loud
NotImplementedError. The PNG branch makes the real-decode path executable
in THIS container (no imaging libs), so the end-to-end Spark test runs
everywhere; the loud-failure direction remains pinned for non-PNG
payloads without PIL."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from neomarket_clickhouse_indexer_spark.multimodal.media import (
    HAS_PIL,
    _decode_png_gray,
    decode_image,
    image_stats,
    synthesize_media,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def encode_png(px: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Tiny stdlib PNG writer (gray HxW or RGB HxWx3 uint8) with a chosen
    filter type per scanline — lets the tests exercise every decoder
    filter branch against independently-encoded bytes."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    channels = 1 if gray else 3
    bpp = channels
    filters = filters if filters is not None else [0] * h
    flat = px.reshape(h, w * channels).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int64)
    for y, f in zip(range(h), filters):
        line = flat[y]
        raw.append(f)
        for x in range(w * channels):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: _paeth(a, b, c)}[f]
            raw.append((int(line[x]) - pred) % 256)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_stdlib_png_all_filters_roundtrip():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 9), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
        got = _decode_png_gray(encode_png(px, filters))
        assert np.array_equal(got, px), filters


def test_stdlib_png_rgb_luma_matches_pil_formula():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    got = _decode_png_gray(encode_png(px, [0, 1, 3, 4]))
    r, g, b = (px[:, :, i].astype(np.int64) for i in range(3))
    want = ((19595 * r + 38470 * g + 7471 * b + 32768) >> 16).astype(np.uint8)
    assert np.array_equal(got, want)


def test_stdlib_png_rejects_unsupported_loudly():
    # 16-bit depth header → NotImplementedError, not a wrong answer
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        _decode_png_gray(payload)


@pytest.mark.skipif(HAS_PIL, reason="PIL present: it decodes any format")
def test_decode_raises_cleanly_for_non_png_without_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\xff\xd8\xff\xe0 not a png")


@pytest.mark.skipif(HAS_PIL, reason="PIL present: real path runs instead")
def test_real_decode_of_non_png_fails_loudly_in_spark(spark):
    # synthesize_media payloads are sha256 streams, not PNGs — a real
    # decode request must fail loudly, not silently fake
    media = synthesize_media(spark, 6)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        image_stats(media, real_decode=True).collect()


def test_real_decode_end_to_end(spark):
    # runs in EVERY environment now: PIL when present, stdlib PNG here
    rows = []
    for i in range(4):
        px = ((np.arange(64, dtype=np.int64).reshape(8, 8) + i) % 256).astype(
            np.uint8
        )
        rows.append(
            (i, "image", bytearray(encode_png(px, [0, 1, 2, 3, 4, 0, 2, 4])),
             ("png", 8, 8, 0))
        )
    media = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, "
        "meta struct<format:string, width:int, height:int, duration_ms:int>",
    )
    got = {r["media_id"]: r for r in image_stats(media, real_decode=True).collect()}
    assert len(got) == 4
    for i in range(4):
        px = ((np.arange(64, dtype=np.int64).reshape(8, 8) + i) % 256).ravel()
        assert got[i]["n_bytes"] == 64
        assert got[i]["mean_byte"] == pytest.approx(float(px.mean()))
