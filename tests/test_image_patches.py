"""Planted full-grid checks for multimodal/media.py::image_patches —
the ViT patch fan-out kernel (r15, r14 verdict item 1: the gate was
vacuous because the fixture corpus never reaches 1024 bytes, and the
kernel had no planted-payload test). Expectations are computed with
plain Python loops, independent of the kernel's numpy path."""

from __future__ import annotations

from pyspark.sql import functions as F

from neomarket_clickhouse_indexer_spark.multimodal.media import image_patches
from neomarket_clickhouse_indexer_spark.queries.multimodal_q import (
    PATCH,
    PATCH_SIDE,
    multimodal_image_patches,
)

SF = "/root/testdata/sf0.001"


def _planted_df(spark, payload: bytes, doc_id: int = 7):
    return spark.createDataFrame(
        [(doc_id, bytearray(payload))], "doc_id bigint, payload binary"
    )


def test_full_grid_pixel_sums(spark):
    # img[r, c] = (r*32 + c) % 256 — closed-form expected sums per patch
    payload = bytes(range(256)) * 4  # exactly 32*32 = 1024 bytes
    out = image_patches(
        _planted_df(spark, payload), "doc_id", "payload",
        side=PATCH_SIDE, patch=PATCH,
    ).collect()
    assert len(out) == (PATCH_SIDE // PATCH) ** 2  # 4x4 grid
    got = {(r.patch_row, r.patch_col): (r.pix_sum, r.mean_milli) for r in out}
    for pr in range(PATCH_SIDE // PATCH):
        for pc in range(PATCH_SIDE // PATCH):
            s = sum(
                ((pr * PATCH + r) * PATCH_SIDE + pc * PATCH + c) % 256
                for r in range(PATCH)
                for c in range(PATCH)
            )
            assert got[(pr, pc)] == (s, s * 1000 // (PATCH * PATCH))


def test_short_payload_skipped(spark):
    # one byte below a full image: no partial-grid rows, ever
    out = image_patches(
        _planted_df(spark, b"x" * (PATCH_SIDE * PATCH_SIDE - 1)),
        "doc_id", "payload", side=PATCH_SIDE, patch=PATCH,
    )
    assert out.count() == 0


def test_trailing_bytes_ignored(spark):
    # only the first side*side bytes enter the grid
    base = bytes(range(256)) * 4
    a = image_patches(
        _planted_df(spark, base), "doc_id", "payload",
        side=PATCH_SIDE, patch=PATCH,
    ).collect()
    b = image_patches(
        _planted_df(spark, base + b"\xff" * 100), "doc_id", "payload",
        side=PATCH_SIDE, patch=PATCH,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_gate_not_vacuous_at_fixture_sf(spark):
    # the r15 payload expansion: every non-empty doc reaches >= 1024
    # bytes, so the gate emits a full 4x4 grid per doc at every SF
    out = multimodal_image_patches(spark, SF)
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.length("text") >= 1)
        .count()
    )
    assert out.count() == n_docs * (PATCH_SIDE // PATCH) ** 2
