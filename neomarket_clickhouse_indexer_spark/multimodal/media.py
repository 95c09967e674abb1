"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` fan-out, partitioning discipline. Real decode is
IMPORT-GUARDED (``decode_image``: PIL when present — this container ships
no imaging/audio libraries, so here it raises ``NotImplementedError``
when a real decode is requested); every kernel also offers a
clearly-marked deterministic fake so pipelines are testable end-to-end
without the libraries (tests/test_media_decode_guard.py covers both
directions via skipif).

Design for 100 TB:
- media rides in ``binary`` columns next to typed metadata
  (struct<format,width,height,duration_ms>), so pruning/filtering happens
  on metadata without touching payload bytes (columnar pushdown);
- per-row kernels run in ``mapInPandas`` over Arrow batches — bytes never
  pass through Python row-by-row;
- frame sampling fans out (media → frames) inside the executor, so the
  shuffle moves only sampled frames, not whole videos.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<format:string, width:int, height:int, duration_ms:int>"
)

FEATURE_DIM = 16

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame binary"

FEATURE_SCHEMA = "media_id bigint, feature array<float>"


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake corpus: payload = sha256 stream keyed by id.
    (Generator, not a stub — the bytes are real, only meaningless.)"""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                ("png" if kind == "image" else "wav" if kind == "audio" else "mp4",
                 64 + i % 16, 48 + i % 8, 0 if kind == "image" else 1000 * (1 + i % 7)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# Real-decode wiring, import-guarded: the production kernel uses PIL when
# the library is present; this container ships without it, so the guard
# resolves at EXECUTOR import time (each Python worker re-evaluates it —
# no driver-side state is captured in the closure beyond the bool).
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_gray(payload: bytes) -> "np.ndarray":
    """Minimal pure-stdlib PNG decoder → grayscale uint8 array (r6 verdict
    task 5: PNG is zlib + struct; the real-decode branch must be
    executable in a container without imaging libraries).

    Supports the non-interlaced 8-bit cases a curation pipeline actually
    stores: color type 0 (grayscale) and color type 2 (RGB, converted to
    L with PIL's exact 16-bit fixed-point ITU-R 601-2 luma,
    ``(19595 R + 38470 G + 7471 B + 32768) >> 16``, so the two guard
    branches are bit-identical on RGB inputs). All five scanline filters
    (None/Sub/Up/Average/Paeth) are implemented; anything else —
    interlaced, paletted, 16-bit, alpha — raises NotImplementedError
    rather than guessing.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise NotImplementedError(
            "stdlib decoder handles PNG only; other formats require PIL"
        )
    pos, width, height, bit_depth, color_type, interlace = 8, 0, 0, 0, 0, 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if bit_depth != 8 or color_type not in (0, 2) or interlace != 0:
        raise NotImplementedError(
            f"stdlib PNG decoder supports non-interlaced 8-bit gray/RGB only "
            f"(got depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}); install PIL for the rest"
        )
    channels = 1 if color_type == 0 else 3
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT stream length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        cur = np.zeros(stride, dtype=np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        else:  # Sub / Average / Paeth carry a left dependency — per byte
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0  # left
                b = int(prev[x])  # up
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    c = int(prev[x - channels]) if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                cur[x] = (line[x] + pred) % 256
        out[y] = cur.astype(np.uint8)
        prev = out[y].astype(np.uint8)
    if channels == 1:
        return out
    rgb = out.reshape(height, width, 3).astype(np.int64)
    luma = (
        19595 * rgb[:, :, 0] + 38470 * rgb[:, :, 1] + 7471 * rgb[:, :, 2] + 32768
    ) >> 16
    return luma.astype(np.uint8)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an encoded image payload to a grayscale uint8 pixel array.

    Guard chain (r6 verdict task 5): PIL when present (any format, L-mode
    conversion) → pure-stdlib PNG decoder (zlib + struct, 8-bit gray/RGB)
    → NotImplementedError. The real-decode branch is therefore executable
    even in this PIL-less container for the format the fixtures use.
    """
    if HAS_PIL:
        import io

        img = _PILImage.open(io.BytesIO(payload)).convert("L")
        return np.asarray(img, dtype=np.uint8)
    try:
        return _decode_png_gray(payload)
    except NotImplementedError:
        raise
    except Exception as exc:
        raise NotImplementedError(
            f"stdlib PNG decode failed ({exc}); non-PNG or malformed "
            "payloads require PIL, not present in this environment"
        ) from exc


def image_stats(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Per-image stats over Arrow batches. Fake kernel: byte-level moments
    standing in for pixel moments (deterministic). With
    ``real_decode=True`` the same Arrow batch shape runs PIL decode per
    payload (import-guarded; raises where PIL is absent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf["payload"]
            if real_decode:
                arr = [decode_image(bytes(p)).ravel() for p in payloads]
            else:
                arr = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(a) for a in arr],
                    "mean_byte": [float(a.mean()) for a in arr],
                    "std_byte": [float(a.std()) for a in arr],
                }
            )

    return (
        media.filter(media.kind == "image")
        .select("media_id", "payload")
        .mapInPandas(run, "media_id bigint, n_bytes bigint, mean_byte double, std_byte double")
    )


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 frame_bytes: int = 256) -> DataFrame:
    """Video → sampled frames fan-out (media_id, frame_idx, frame). Fake
    kernel: frames are deterministic payload slices; a real kernel would
    seek/decode keyframes. The fan-out shape (one input row → many output
    rows inside the executor) is the part that matters at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for row in pdf.itertuples(index=False):
                duration = row.meta["duration_ms"] or 0
                n_frames = max(1, duration // every_ms)
                payload = bytes(row.payload)
                for f in range(int(n_frames)):
                    start = (f * frame_bytes) % max(1, len(payload))
                    out_ids.append(row.media_id)
                    out_idx.append(f)
                    out_frames.append(payload[start : start + frame_bytes])
            if out_ids:
                yield pd.DataFrame(
                    {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
                )

    return (
        media.filter(media.kind == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(run, FRAME_SCHEMA)
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Binary → fixed-dim float vector (fake embedding: seeded from a
    payload digest; real kernel would run a vision/audio encoder). Output
    plugs directly into functions/vectors.py similarity search."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(bytes(p)).digest()
                v = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16)
                feats.append((v.astype(np.float32) / 65535.0).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def binary_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    bytes_per_frame: int = 256,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Media→frame fan-out over Arrow batches (the video frame-sampling
    shape): one output row per ``bytes_per_frame`` chunk of the binary
    payload, with a per-frame content signature. The fan-out happens inside
    the executor, so a downstream shuffle moves only frames, never whole
    payloads — the 100 TB discipline from the module docstring.

    Used by the driver-gated ``multimodal_doc_frames`` query (payloads
    derived from the documents fixture), so the Arrow/mapInPandas plumbing
    is exercised end-to-end against a SQL oracle.
    """
    carry = list(carry_cols)
    schema = (
        f"{id_col} bigint, "
        + "".join(f"{c} string, " for c in carry)
        + "frame_idx int, frame_bytes int, frame_sig string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for tup in pdf[[id_col, *carry, payload_col]].itertuples(index=False):
                mid, *extra, payload = tup
                b = bytes(payload)
                n = (len(b) + bytes_per_frame - 1) // bytes_per_frame
                for i in range(n):
                    chunk = b[i * bytes_per_frame:(i + 1) * bytes_per_frame]
                    rows.append(
                        (
                            mid,
                            *extra,
                            i,
                            len(chunk),
                            hashlib.sha256(chunk).hexdigest()[:8],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, *carry, "frame_idx", "frame_bytes", "frame_sig"],
            )

    return df.select(id_col, *carry, payload_col).mapInPandas(run, schema)


def pcm_window_energy(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    window: int = 64,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Audio-style DSP plumbing: treat the binary payload as an 8-bit PCM
    sample stream and emit per-window INTEGER energy (sum of squared sample
    values) — the windowed feature-extraction shape (RMS/VAD/loudness) over
    Arrow batches. Integer energies keep the kernel bit-exact across
    engines (no float accumulation), so the gate can oracle-check the full
    fan-out. A real audio kernel would np.frombuffer(int16) and window at
    the sample rate; the batch shape, fan-out locality, and schema are
    identical.
    """
    carry = list(carry_cols)
    schema = (
        f"{id_col} bigint, "
        + "".join(f"{c} string, " for c in carry)
        + "window_idx int, n_samples int, energy bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for tup in pdf[[id_col, *carry, payload_col]].itertuples(index=False):
                mid, *extra, payload = tup
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                # empty payload → ZERO windows, matching the oracle's
                # generate_series over ceil(len/window) (ADVICE r4: the old
                # max(1, ...) emitted one degenerate window the SQL side
                # never produced)
                for w in range(0, len(samples), window):
                    chunk = samples[w : w + window].astype(np.int64)
                    rows.append(
                        (
                            mid,
                            *extra,
                            w // window,
                            int(chunk.size),
                            int(np.dot(chunk, chunk)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, *carry, "window_idx", "n_samples", "energy"],
            )

    return df.select(id_col, *carry, payload_col).mapInPandas(run, schema)


def image_patches(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    side: int = 32,
    patch: int = 8,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Vision-style preprocessing plumbing: treat the first ``side*side``
    payload bytes as an 8-bit grayscale ``side``×``side`` image (docs
    shorter than one full image are skipped — partial images have no
    stable grid) and emit one row per ``patch``×``patch`` patch with its
    INTEGER pixel sum and exact milli-mean (sum*1000 // patch²) — the
    ViT patch-embedding input shape. All integer, so the full fan-out is
    oracle-checkable; a real kernel would decode with PIL/cv2 first
    (import-guarded, see decode_image), but the grid arithmetic, Arrow
    batch shape, and executor-side fan-out are the production ones.
    """
    carry = list(carry_cols)
    npp = side // patch
    schema = (
        f"{id_col} bigint, "
        + "".join(f"{c} string, " for c in carry)
        + "patch_row int, patch_col int, pix_sum bigint, mean_milli bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for tup in pdf[[id_col, *carry, payload_col]].itertuples(index=False):
                mid, *extra, payload = tup
                b = bytes(payload)
                if len(b) < side * side:
                    continue
                img = np.frombuffer(b[: side * side], dtype=np.uint8).reshape(
                    side, side
                ).astype(np.int64)
                for pr in range(npp):
                    for pc in range(npp):
                        blk = img[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                        ]
                        s = int(blk.sum())
                        rows.append(
                            (
                                mid,
                                *extra,
                                pr,
                                pc,
                                s,
                                s * 1000 // (patch * patch),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    *carry,
                    "patch_row",
                    "patch_col",
                    "pix_sum",
                    "mean_milli",
                ],
            )

    return df.select(id_col, *carry, payload_col).mapInPandas(run, schema)


def phash_codes(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    ctab: "list[list[int]]",
    side: int = 16,
) -> DataFrame:
    """DCT-based 64-bit PERCEPTUAL HASH (pHash — the industry-standard
    near-dup-image primitive) over the first ``side``×``side`` payload
    bytes as an 8-bit grayscale image; images shorter than one full
    grid are skipped (the image_patches rule).

    EXACT INTEGER pipeline so the hash is oracle-checkable
    cross-engine: ``ctab`` is a fixed-point DCT-II basis (8 rows ×
    ``side`` cols, cos values pre-scaled by 2^14 and floor(x+0.5)
    rounded ONCE in Python — the same literal table is inlined into
    the DuckDB oracle, so no engine ever evaluates cos()). The 8×8
    low-frequency block is C·P·Cᵀ in int64 (|X| ≤ 255·side²·2^28 —
    fits comfortably), the sign threshold is the LOWER MEDIAN (the
    32nd order statistic of the 64 coefficients — deterministic under
    ties), and the 64 sign bits pack into TWO 32-bit words (bit 63 of
    a single BIGINT overflows DuckDB's checked shift and wraps in
    Spark — the knn_bq_hamming parity rule). Bit index = u*8 + v.

    A real kernel would decode with PIL first (import-guarded, see
    decode_image) and downsample to the grid; the DCT/median/packing —
    the pHash itself — is the production arithmetic.
    """
    C = np.array(ctab, dtype=np.int64)
    n_px = side * side
    schema = f"{id_col} bigint, lo bigint, hi bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in pdf[[id_col, payload_col]].itertuples(
                index=False
            ):
                b = bytes(payload)
                if len(b) < n_px:
                    continue
                img = (
                    np.frombuffer(b[:n_px], dtype=np.uint8)
                    .reshape(side, side)
                    .astype(np.int64)
                )
                flat = (C @ img @ C.T).flatten()
                med = int(np.sort(flat)[31])
                lo = hi = 0
                for j in range(32):
                    if flat[j] > med:
                        lo |= 1 << j
                    if flat[j + 32] > med:
                        hi |= 1 << j
                rows.append((mid, lo, hi))
            yield pd.DataFrame(rows, columns=[id_col, "lo", "hi"])

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def audio_constellation_peaks(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    ctab: "list[list[int]]",
    window: int = 64,
) -> DataFrame:
    """Constellation-map feature extraction (the Shazam landmark shape,
    Wang ISMIR'03 §2): per FULL ``window``-sample PCM window, project
    onto a fixed-point AC filterbank (``ctab``: rows = bands u=1..7 of
    the 1-D DCT-II basis, cos pre-scaled by 2^14 and rounded ONCE in
    Python — the phash_codes doctrine, no engine evaluates cos()) and
    emit the PEAK band per window: argmax |response| with
    lowest-band tiebreaks (numpy argmax first-occurrence == the SQL
    ``ORDER BY ab DESC, u`` window rule). Partial tail windows are
    dropped (no stable spectrum — the image_patches partial-grid rule).
    Output: (id, w, u, amp) — all exact int64.

    A real kernel would np.frombuffer(int16) + STFT; the landmark
    selection, Arrow batch shape, and executor-side fan-out are the
    production ones.
    """
    C = np.array(ctab, dtype=np.int64)  # (7, window)
    schema = f"{id_col} bigint, w int, u int, amp bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in pdf[[id_col, payload_col]].itertuples(
                index=False
            ):
                b = bytes(payload)
                n_full = len(b) // window
                if n_full == 0:
                    continue
                s = (
                    np.frombuffer(b[: n_full * window], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(n_full, window)
                )
                resp = np.abs(s @ C.T)  # (n_full, 7)
                for w in range(n_full):
                    u = int(np.argmax(resp[w]))
                    rows.append((mid, w, u + 1, int(resp[w][u])))
            yield pd.DataFrame(rows, columns=[id_col, "w", "u", "amp"])

    return df.select(id_col, payload_col).mapInPandas(run, schema)
