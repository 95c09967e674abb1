"""Driver-gated multimodal query: binary payload → executor-side frame
fan-out → per-source aggregate, oracle-checked.

The reference has no media pipeline; this is the beyond-reference
LLM-training-data mandate (BASELINE.json): media rides as opaque binary +
typed metadata, kernels run over Arrow batches (multimodal/media.py). The
fixture has no binary table, so payloads are derived from ``documents.text``
(UTF-8 bytes — real bytes, deterministic): every doc becomes a "media" row,
chunked into 256-byte frames inside the executor, one sha256-signed row per
frame, then aggregated per source. The DuckDB oracle reproduces the chunking
arithmetic with substring/sha256 over the same (ASCII) corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.media import binary_frames
from ..sources.tables import load_table

FRAME_BYTES = 256


def multimodal_doc_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = binary_frames(
        docs, "doc_id", "payload", bytes_per_frame=FRAME_BYTES,
        carry_cols=("source",),
    )
    return frames.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_bytes").cast("long").alias("total_bytes"),
        F.countDistinct("frame_sig").alias("n_distinct_sigs"),
    )


# ASCII corpus (asserted: octet_length == length over the fixtures), so
# char positions == byte positions and sha256(VARCHAR) hashes UTF-8 bytes.
MULTIMODAL_DOC_FRAMES_SQL = f"""
WITH frames AS (
  SELECT doc_id, source,
         unnest(generate_series(1, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INT))) AS i
  FROM documents
),
sized AS (
  SELECT f.doc_id, f.source,
         length(substring(d.text, (f.i - 1) * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_bytes,
         substring(sha256(substring(d.text, (f.i - 1) * {FRAME_BYTES} + 1, {FRAME_BYTES})), 1, 8) AS frame_sig
  FROM frames f JOIN documents d USING (doc_id)
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_frames,
       CAST(SUM(frame_bytes) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT frame_sig) AS n_distinct_sigs
FROM sized
GROUP BY source
"""


# --- multimodal_audio_energy: the audio half of the media mandate —
#     windowed energy extraction over a PCM-style sample stream, fanned out
#     inside the executor (multimodal/media.py::pcm_window_energy). Sample
#     values are payload bytes (ASCII corpus → byte == code point), window
#     energies are exact integers, so the DuckDB oracle replays the same
#     windows via char-code lists and matches bit-for-bit.

ENERGY_WINDOW = 64


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.media import pcm_window_energy

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    wins = pcm_window_energy(
        docs, "doc_id", "payload", window=ENERGY_WINDOW, carry_cols=("source",)
    )
    # per-doc loudness profile: window count, peak- and total-energy
    return wins.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.max("energy").alias("peak_energy"),
        F.sum("energy").cast("long").alias("total_energy"),
        F.sum("n_samples").cast("long").alias("n_samples"),
    )


MULTIMODAL_AUDIO_ENERGY_SQL = f"""
WITH codes AS (
  SELECT doc_id, source,
         list_transform(string_split_regex(text, ''), c -> unicode(c)) AS cs
  FROM documents
),
wins AS (
  SELECT doc_id, source, cs,
         unnest(generate_series(0,
           CAST(ceil(len(cs) / {ENERGY_WINDOW}.0) AS INT) - 1)) AS w
  FROM codes
),
energies AS (
  SELECT doc_id, source,
         len(list_slice(cs, w * {ENERGY_WINDOW} + 1,
                        (w + 1) * {ENERGY_WINDOW})) AS n_samples,
         list_sum(list_transform(
           list_slice(cs, w * {ENERGY_WINDOW} + 1, (w + 1) * {ENERGY_WINDOW}),
           x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS energy
  FROM wins
)
SELECT doc_id, source,
       COUNT(*) AS n_windows,
       CAST(MAX(energy) AS BIGINT) AS peak_energy,
       CAST(SUM(energy) AS BIGINT) AS total_energy,
       CAST(SUM(n_samples) AS BIGINT) AS n_samples
FROM energies
GROUP BY doc_id, source
"""


# --- multimodal_scene_cuts: the video half of the media mandate — shot-
#     boundary detection over the per-window energy stream (the classic
#     frame-difference cut detector, run on the same windowed features the
#     audio gate extracts). A window is a CUT when its energy moved by at
#     least 1/CUT_DEN of the previous window's energy — an all-integer
#     rational test, so both engines agree bit-for-bit. A real pipeline
#     would difference decoded frame histograms; the windowing, lag state,
#     per-doc ordering, and cut accounting are identical (decode itself is
#     the one env-stubbed step, multimodal/media.py:61).

CUT_DEN = 5  # cut when |Δenergy| ≥ 20% of the previous window's energy


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..multimodal.media import pcm_window_energy

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    wins = pcm_window_energy(
        docs, "doc_id", "payload", window=ENERGY_WINDOW, carry_cols=("source",)
    )
    w = Window.partitionBy("doc_id").orderBy("window_idx")
    lagged = wins.withColumn("prev_e", F.lag("energy").over(w))
    is_cut = F.col("prev_e").isNotNull() & (
        F.abs(F.col("energy") - F.col("prev_e")) * CUT_DEN >= F.col("prev_e")
    )
    return lagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum(is_cut.cast("long")).alias("n_cuts"),
        F.min(F.when(is_cut, F.col("window_idx"))).cast("long").alias("first_cut_idx"),
    )


MULTIMODAL_SCENE_CUTS_SQL = f"""
WITH codes AS (
  SELECT doc_id, source,
         list_transform(string_split_regex(text, ''), c -> unicode(c)) AS cs
  FROM documents
),
wins AS (
  SELECT doc_id, source, cs,
         unnest(generate_series(0,
           CAST(ceil(len(cs) / {ENERGY_WINDOW}.0) AS INT) - 1)) AS w
  FROM codes
),
energies AS (
  SELECT doc_id, source, w,
         list_sum(list_transform(
           list_slice(cs, w * {ENERGY_WINDOW} + 1, (w + 1) * {ENERGY_WINDOW}),
           x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS energy
  FROM wins
),
lagged AS (
  SELECT doc_id, source, w, energy,
         LAG(energy) OVER (PARTITION BY doc_id ORDER BY w) AS prev_e
  FROM energies
)
SELECT doc_id, source,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN prev_e IS NOT NULL
                      AND abs(energy - prev_e) * {CUT_DEN} >= prev_e
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(MIN(CASE WHEN prev_e IS NOT NULL
                      AND abs(energy - prev_e) * {CUT_DEN} >= prev_e
                     THEN w END) AS BIGINT) AS first_cut_idx
FROM lagged
GROUP BY doc_id, source
"""


# --- multimodal_frame_dedup: cross-media duplicate-frame detection — the
#     video analog of exact document dedup (DD1): fan every payload out to
#     64-byte frames inside the executor (multimodal/media.py::
#     binary_frames — the shuffle moves frames, never payloads), then one
#     hash-groupBy on the per-frame content signature; a signature seen in
#     ≥ 2 distinct media objects is a duplicated segment (shared intro /
#     watermark / copied clip in a real corpus). 100 TB shape: frame
#     signatures are fixed-width, the groupBy is the only shuffle, and the
#     payload column never leaves the scan stage. 64-byte frames keep the
#     fixture differential populated (~97 duplicated signatures at sf0.01
#     vs 12 at 256 bytes).

DEDUP_FRAME_BYTES = 64


def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = binary_frames(
        docs, "doc_id", "payload", bytes_per_frame=DEDUP_FRAME_BYTES
    )
    return (
        frames.groupBy("frame_sig")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_frames"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


MULTIMODAL_FRAME_DEDUP_SQL = f"""
WITH frames AS (
  SELECT doc_id,
         unnest(generate_series(1,
           CAST(ceil(length(text) / {DEDUP_FRAME_BYTES}.0) AS INT))) AS i
  FROM documents
),
sized AS (
  SELECT f.doc_id,
         substring(sha256(substring(d.text,
           (f.i - 1) * {DEDUP_FRAME_BYTES} + 1, {DEDUP_FRAME_BYTES})), 1, 8)
           AS frame_sig
  FROM frames f JOIN documents d USING (doc_id)
)
SELECT frame_sig,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM sized
GROUP BY frame_sig
HAVING COUNT(DISTINCT doc_id) >= 2
"""


# --- multimodal_image_patches: the vision half of the media mandate —
#     ViT-style patch extraction: the first 32x32 payload bytes form an
#     8-bit grayscale grid, fanned out to 8x8 patches inside the
#     executor (multimodal/media.py::image_patches) with integer pixel
#     sums and exact milli-means. Docs shorter than one full image are
#     skipped by BOTH engines (length >= 1024 — no partial-grid
#     ambiguity). The DuckDB oracle replays the grid arithmetic over
#     char-code lists (ASCII corpus: byte == code point, pinned by
#     tests/test_multimodal_energy.py's fixture contract).

PATCH_SIDE = 32
PATCH = 8


def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.media import image_patches

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return image_patches(
        docs, "doc_id", "payload", side=PATCH_SIDE, patch=PATCH
    ).select(
        "doc_id",
        F.col("patch_row").cast("long").alias("patch_row"),
        F.col("patch_col").cast("long").alias("patch_col"),
        "pix_sum",
        "mean_milli",
    )


MULTIMODAL_IMAGE_PATCHES_SQL = f"""
WITH codes AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, ''), c -> unicode(c)) AS cs
  FROM documents
  WHERE length(text) >= {PATCH_SIDE * PATCH_SIDE}
),
grid AS (
  SELECT doc_id, cs, pr.p AS patch_row, pc.p AS patch_col
  FROM codes,
       (SELECT unnest(generate_series(0, {PATCH_SIDE // PATCH - 1})) AS p) pr,
       (SELECT unnest(generate_series(0, {PATCH_SIDE // PATCH - 1})) AS p) pc
),
patches AS (
  SELECT doc_id, patch_row, patch_col,
         CAST(list_sum(flatten(
           list_transform(generate_series(0, {PATCH - 1}), r ->
             list_transform(generate_series(0, {PATCH - 1}), c ->
               cs[(patch_row * {PATCH} + r) * {PATCH_SIDE}
                  + patch_col * {PATCH} + c + 1]))
         )) AS BIGINT) AS pix_sum
  FROM grid
)
SELECT doc_id, patch_row, patch_col, pix_sum,
       pix_sum * 1000 // {PATCH * PATCH} AS mean_milli
FROM patches
"""
