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

# --- the pHash tier (r11 verdict task 5): DCT-based 64-bit perceptual
#     hash — the industry-standard near-dup-IMAGE primitive — over the
#     first 16×16 payload bytes as a grayscale grid (docs >= 256 bytes;
#     the 1024-byte image_patches grid is empty on this corpus).
#     Fixed-point DCT: the cosine basis is pre-scaled by 2^14 and
#     floor(x+0.5)-rounded ONCE here in Python; the SAME literal table
#     is inlined into the Spark kernel (multimodal/media.py:phash_codes)
#     and the DuckDB oracle below, so the whole hash is exact int64
#     arithmetic — no engine ever evaluates cos(). Sign threshold = the
#     lower median (32nd order statistic, deterministic under ties);
#     codes pack into TWO 32-bit words (the knn_bq_hamming bit-63
#     parity rule). Near-dup pass = 4×16-bit Hamming BANDS (any shared
#     band → candidate, guaranteed for distance <= 3, the LSH-for-
#     Hamming trick) + exact xor/bit_count filter at PHASH_T.
#     100 TB: the code table is 16 bytes/image and the band join
#     buckets it — payloads never shuffle; measured at sf0.01: 291
#     images, 17 band candidates, 12 true pairs (all Hamming 0 —
#     identical prefixes; the one distance-12 pair is beyond any
#     4-band guarantee and is documented missed, the standard
#     banded-LSH recall trade).

PHASH_SIDE = 16
PHASH_SCALE = 16384  # 2^14 fixed-point cosine scale
PHASH_T = 10         # Hamming accept threshold

import math as _math  # noqa: E402

PHASH_CTAB = [
    [
        int(_math.floor(
            _math.cos(_math.pi * (2 * x + 1) * u / (2 * PHASH_SIDE))
            * PHASH_SCALE + 0.5
        ))
        for x in range(PHASH_SIDE)
    ]
    for u in range(8)
]


# r13: the pHash code table is driver-sized (16 bytes/image) and a pure
# function of (sf_dir) — memo one eager localCheckpointed copy per
# session (the _bpe_train_cached / NSW-memo doctrine) instead of paying
# the DCT kernel once in multimodal_frame_dedup and again in
# multimodal_caption_audit per full gate run.
import threading as _threading  # noqa: E402

_PHASH_MEMO: dict = {}
_PHASH_LOCK = _threading.Lock()


def _phash_codes_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    with _PHASH_LOCK:
        hit = _PHASH_MEMO.get(key)
    if hit is not None:
        return hit
    from ..multimodal.media import phash_codes

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    codes = phash_codes(
        docs, "doc_id", "payload", PHASH_CTAB, side=PHASH_SIDE
    ).localCheckpoint(eager=True)
    with _PHASH_LOCK:
        _PHASH_MEMO[key] = codes
    return codes


def _phash_pairs(codes: DataFrame) -> DataFrame:
    """Banded Hamming near-dup pairs over a (doc_id, lo, hi) pHash code
    table: 4×16-bit bands as join keys (the oracle's pband/pcand mirror
    the identical banding, so the candidate sets match exactly), exact
    xor/bit_count Hamming, kept at <= PHASH_T. Returns
    (id1, id2, hamming) with id1 < id2. Shared by
    multimodal_frame_dedup's 'pair' part and the r13 cross-modal
    caption audit."""
    band = codes.select(
        "doc_id", "lo", "hi",
        F.explode(F.array(
            F.struct(
                F.lit(0).alias("k"),
                F.col("lo").bitwiseAND(F.lit(65535)).alias("bv"),
            ),
            F.struct(
                F.lit(1).alias("k"),
                F.shiftright(F.col("lo"), 16).alias("bv"),
            ),
            F.struct(
                F.lit(2).alias("k"),
                F.col("hi").bitwiseAND(F.lit(65535)).alias("bv"),
            ),
            F.struct(
                F.lit(3).alias("k"),
                F.shiftright(F.col("hi"), 16).alias("bv"),
            ),
        )).alias("s"),
    ).select(
        "doc_id", "lo", "hi",
        F.col("s.k").alias("k"), F.col("s.bv").alias("bv"),
    )
    cand = (
        band.select(
            F.col("doc_id").alias("id1"),
            F.col("lo").alias("lo1"), F.col("hi").alias("hi1"),
            "k", "bv",
        )
        .join(
            band.select(
                F.col("doc_id").alias("id2"),
                F.col("lo").alias("lo2"), F.col("hi").alias("hi2"),
                "k", "bv",
            ),
            ["k", "bv"],
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "lo1", "hi1", "lo2", "hi2")
        .distinct()
    )
    return (
        cand.select(
            "id1", "id2",
            (
                F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2")))
                + F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_T)
    )


CM_TEXT_LO = 0.1  # text-cosine floor: image-dup pairs below it flag


def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound media-dedup gate, long format (part, frame_sig, a, b, v):
    part='exact'   — the original exact frame-signature dedup
                     (a=n_docs, b=n_frames, v=first_doc);
    part='code'    — per-image 64-bit pHash words (a=doc_id, b=lo, v=hi);
    part='pair'    — banded Hamming near-dup pairs at <= PHASH_T
                     (a=id1, b=id2, v=hamming);
    part='caption' — the r14 in-window rotation of the cross-modal
                     family: multimodal_caption_audit's imgdup_textdiff
                     leg executed verbatim off the memoized code table —
                     image near-dup pairs whose TEXT cosine <
                     CM_TEXT_LO (a=id1, b=id2, v=cosine in micro-units,
                     FLOOR(ts*1e6+0.5) on the identical 6dp double in
                     both engines — the fused-suite integerize rule)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = binary_frames(
        docs, "doc_id", "payload", bytes_per_frame=DEDUP_FRAME_BYTES
    )
    exact = (
        frames.groupBy("frame_sig")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_frames"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            F.lit("exact").alias("part"),
            "frame_sig",
            F.col("n_docs").cast("long").alias("a"),
            F.col("n_frames").cast("long").alias("b"),
            F.col("first_doc").cast("long").alias("v"),
        )
    )
    # eager-checkpointed memo: already materialized, so the band
    # self-join has no cold-cache race and nothing to unpersist here
    codes = _phash_codes_cached(spark, sf_dir)
    code_rows = codes.select(
        F.lit("code").alias("part"),
        F.lit("").alias("frame_sig"),
        F.col("doc_id").cast("long").alias("a"),
        F.col("lo").alias("b"),
        F.col("hi").alias("v"),
    )
    # pairs feed TWO parts ('pair' + 'caption'); join the text cosine on
    # in the SAME pass and checkpoint once, so the union's branches
    # re-run neither the band self-join nor the embedding joins
    from ..functions import vectors as VX

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", VX.norm(F.col("embedding")).alias("nn")
    )
    # LEFT joins: a coded doc without an embeddings row (sf0.1 has
    # 3000) must still emit its 'pair' row — only the caption flag
    # needs the text side (ts stays NULL, matching the oracle's inner
    # fdcap join)
    pairs = (
        _phash_pairs(codes)
        .join(
            emb.select(
                F.col("vec_id").alias("id1"),
                F.col("embedding").alias("emb_a"),
                F.col("nn").alias("nn_a"),
            ),
            "id1",
            "left",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("id2"),
                F.col("embedding").alias("emb_b"),
                F.col("nn").alias("nn_b"),
            ),
            "id2",
            "left",
        )
        .select(
            "id1",
            "id2",
            "hamming",
            F.round(
                VX.dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nn_a") * F.col("nn_b")),
                6,
            ).alias("ts"),
        )
        .localCheckpoint(eager=True)
    )
    pair_rows = pairs.select(
        F.lit("pair").alias("part"),
        F.lit("").alias("frame_sig"),
        F.col("id1").cast("long").alias("a"),
        F.col("id2").cast("long").alias("b"),
        F.col("hamming").alias("v"),
    )
    cap_rows = pairs.filter(
        F.col("ts").isNotNull() & (F.col("ts") < CM_TEXT_LO)
    ).select(
        F.lit("caption").alias("part"),
        F.lit("").alias("frame_sig"),
        F.col("id1").cast("long").alias("a"),
        F.col("id2").cast("long").alias("b"),
        F.expr("CAST(FLOOR(ts * 1000000 + 0.5) AS BIGINT)").alias("v"),
    )
    # Eager checkpoint (mirrors audio_fingerprint_frame): a lazy return
    # would keep recomputable lineage alive for the rest of a 250-entry
    # gate session (r9/r11 cache-pressure rule); the codes frame itself
    # is the session-wide memo and stays.
    return (
        exact.unionByName(code_rows)
        .unionByName(pair_rows)
        .unionByName(cap_rows)
        .localCheckpoint(eager=True)
    )


def _phash_oracle_ctes() -> str:
    """The pHash half of the oracle: recomputes the DCT sign codes
    INDEPENDENTLY (list-comprehension pixel lists + the same literal
    fixed-point basis as relational VALUES rows + SQL group-bys — a
    genuinely different algorithm from the numpy matmul kernel).

    ASCII invariant: this SQL indexes text per CHARACTER (ascii(),
    length()) while the Spark kernel consumes UTF-8 BYTES of
    encode(text) — parity holds because the fixture corpus is ASCII,
    pinned by tests/test_multimodal_energy.py::
    test_documents_text_is_nonempty_ascii (same contract as
    audio_energy and the constellation fingerprint)."""
    n_px = PHASH_SIDE * PHASH_SIDE
    ctab_rows = ",".join(
        f"({u},{x},{PHASH_CTAB[u][x]})"
        for u in range(8) for x in range(PHASH_SIDE)
    )
    return f"""
pimgs AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE length(text) >= {n_px}
),
ppx AS MATERIALIZED (
  SELECT doc_id,
         list_transform(generate_series(1, {n_px}),
           i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT))
           AS p
  FROM pimgs
),
pctab(u, x, c) AS (VALUES {ctab_rows}),
pys(y) AS (SELECT unnest(generate_series(0, {PHASH_SIDE - 1}))),
pr AS MATERIALIZED (
  SELECT ppx.doc_id, pctab.u, pys.y,
         SUM(pctab.c * ppx.p[pctab.x * {PHASH_SIDE} + pys.y + 1]) AS rv
  FROM ppx, pctab, pys
  GROUP BY ppx.doc_id, pctab.u, pys.y
),
pxc AS MATERIALIZED (
  SELECT pr.doc_id, pr.u, ct.u AS v, CAST(SUM(pr.rv * ct.c) AS BIGINT) AS xv
  FROM pr JOIN pctab ct ON ct.x = pr.y
  GROUP BY pr.doc_id, pr.u, ct.u
),
pmed AS MATERIALIZED (
  SELECT doc_id, xv AS m FROM (
    SELECT doc_id, xv,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY xv) AS rk
    FROM pxc
  ) WHERE rk = 32
),
pbits AS MATERIALIZED (
  SELECT x.doc_id, x.u * 8 + x.v AS bit,
         CASE WHEN x.xv > pmed.m THEN 1 ELSE 0 END AS b
  FROM pxc x JOIN pmed USING (doc_id)
),
pcodes AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN bit < 32 AND b = 1
             THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS lo,
    CAST(SUM(CASE WHEN bit >= 32 AND b = 1
             THEN 1::BIGINT << (bit - 32) ELSE 0 END) AS BIGINT) AS hi
  FROM pbits GROUP BY doc_id
),
pband AS MATERIALIZED (
  SELECT doc_id, lo, hi, k.k,
         CASE k.k WHEN 0 THEN lo & 65535
                  WHEN 1 THEN lo >> 16
                  WHEN 2 THEN hi & 65535
                  ELSE hi >> 16 END AS bv
  FROM pcodes, (SELECT unnest(generate_series(0, 3)) AS k) k
),
pcand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS id1, x.lo AS lo1, x.hi AS hi1,
                  y.doc_id AS id2, y.lo AS lo2, y.hi AS hi2
  FROM pband x JOIN pband y
    ON x.k = y.k AND x.bv = y.bv AND x.doc_id < y.doc_id
)"""


def _frame_dedup_sql() -> str:
    from .vectors_q import _ANORM, _DOT_AB

    cos = f"ROUND({_DOT_AB} / (a.nn * b.nn), 6)"
    return f"""
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
),{_phash_oracle_ctes()},
fdnrm AS MATERIALIZED (
  SELECT a.vec_id, a.embedding, {_ANORM} AS nn FROM embeddings a
),
fdpairs AS MATERIALIZED (
  SELECT id1, id2,
         bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2)) AS hamming
  FROM pcand
  WHERE bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2)) <= {PHASH_T}
),
fdcap AS MATERIALIZED (
  SELECT p.id1, p.id2, {cos} AS ts
  FROM fdpairs p
  JOIN fdnrm a ON a.vec_id = p.id1
  JOIN fdnrm b ON b.vec_id = p.id2
)
SELECT 'exact' AS part, frame_sig,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS a,
       CAST(COUNT(*) AS BIGINT) AS b,
       CAST(MIN(doc_id) AS BIGINT) AS v
FROM sized
GROUP BY frame_sig
HAVING COUNT(DISTINCT doc_id) >= 2
UNION ALL
SELECT 'code' AS part, '' AS frame_sig,
       CAST(doc_id AS BIGINT) AS a, lo AS b, hi AS v
FROM pcodes
UNION ALL
SELECT 'pair' AS part, '' AS frame_sig,
       CAST(id1 AS BIGINT) AS a, CAST(id2 AS BIGINT) AS b,
       CAST(hamming AS BIGINT) AS v
FROM fdpairs
UNION ALL
SELECT 'caption' AS part, '' AS frame_sig,
       CAST(id1 AS BIGINT) AS a, CAST(id2 AS BIGINT) AS b,
       CAST(FLOOR(ts * 1000000 + 0.5) AS BIGINT) AS v
FROM fdcap WHERE ts < {CM_TEXT_LO}
"""


MULTIMODAL_FRAME_DEDUP_SQL = _frame_dedup_sql()


# --- multimodal_caption_audit: CROSS-MODAL CONSISTENCY JOIN (r12
#     verdict task 5 — the LAION-style caption-image audit). The repo
#     owns image codes (pHash), and text embeddings over the SAME doc
#     ids (documents.doc_id == embeddings.vec_id, 1:1 in the fixture);
#     this composes them — no new kernels, both sides are existing
#     16-byte / 64-float states:
#       'pair'            — every banded image near-dup pair
#                           (Hamming <= PHASH_T) with its 6dp text
#                           cosine;
#       'imgdup_textdiff' — the flagged subset with text cosine <
#                           CM_TEXT_LO: near-identical media under
#                           unrelated captions = mislabeling
#                           candidates (the LAION-5B curation filter
#                           run in reverse);
#       'textdup_imgdiff' — the reverse audit: text near-dup pairs
#                           (cosine >= SIM_THRESHOLD, the
#                           near_dup_embeddings core) whose codes
#                           disagree (Hamming > PHASH_T) —
#                           re-captioned / substituted media.
#     100 TB: the image side shuffles only the banded 16-byte code
#     table (payloads never move); the text side is the brute-force
#     pair scan at gate SF — production swaps in the LSH/NSW candidate
#     tiers as the pair source, the audit joins are unchanged.
#     Reference has no media surface; beyond-ref (builder-brief
#     mandate).



def multimodal_caption_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as VX
    from .vectors_q import SIM_THRESHOLD

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    emb = None
    try:
        codes = _phash_codes_cached(spark, sf_dir)
        # norms factored ONCE per row (the near_dup_embeddings
        # discipline; dot/(na*nb) is bit-identical to the inline oracle)
        emb = (
            load_table(spark, sf_dir, "embeddings")
            .select(
                "vec_id", "embedding",
                VX.norm(F.col("embedding")).alias("nn"),
            )
            .persist()
        )
        emb.count()  # feeds both sides of the text pair join
        a = emb.select(
            F.col("vec_id").alias("id1"),
            F.col("embedding").alias("emb_a"),
            F.col("nn").alias("nn_a"),
        )
        b = emb.select(
            F.col("vec_id").alias("id2"),
            F.col("embedding").alias("emb_b"),
            F.col("nn").alias("nn_b"),
        )
        ts = F.round(
            VX.dot(F.col("emb_a"), F.col("emb_b"))
            / (F.col("nn_a") * F.col("nn_b")),
            6,
        ).alias("ts")
        # image near-dup pairs + their text cosine (feeds two parts)
        img = (
            _phash_pairs(codes)
            .join(a, "id1")
            .join(b, "id2")
            .select("id1", "id2", "hamming", ts)
            .localCheckpoint(eager=True)
        )
        # text near-dup pairs + their image Hamming (coded docs only)
        ti = (
            a.join(b, F.col("id1") < F.col("id2"))
            .select("id1", "id2", ts)
            .filter(F.col("ts") >= SIM_THRESHOLD)
            .join(
                codes.select(
                    F.col("doc_id").alias("id1"),
                    F.col("lo").alias("lo1"), F.col("hi").alias("hi1"),
                ),
                "id1",
            )
            .join(
                codes.select(
                    F.col("doc_id").alias("id2"),
                    F.col("lo").alias("lo2"), F.col("hi").alias("hi2"),
                ),
                "id2",
            )
            .select(
                "id1", "id2",
                (
                    F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2")))
                    + F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
                ).cast("long").alias("hamming"),
                "ts",
            )
        )

        def _part(df: DataFrame, name: str) -> DataFrame:
            return df.select(
                F.lit(name).alias("part"),
                F.col("id1").cast("long").alias("a"),
                F.col("id2").cast("long").alias("b"),
                F.col("hamming").cast("long").alias("c"),
                F.col("ts").alias("v"),
            )

        out = (
            _part(img, "pair")
            .unionByName(
                _part(img.filter(F.col("ts") < CM_TEXT_LO),
                      "imgdup_textdiff")
            )
            .unionByName(
                _part(ti.filter(F.col("hamming") > PHASH_T),
                      "textdup_imgdiff")
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        # unpersist in finally: an exception between persist() and here
        # must not leak the embeddings frame for the rest of the session
        if emb is not None:
            emb.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _cm_audit_sql() -> str:
    from .vectors_q import _ANORM, _DOT_AB, SIM_THRESHOLD

    ham_codes = (
        "bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))"
    )
    # norms precomputed ONCE in a MATERIALIZED CTE with the IDENTICAL
    # expression — bit-identical doubles, ~13x cheaper pair scoring
    # (the r10 nsw-oracle precedent); cosine computed once per pair
    cos = f"ROUND({_DOT_AB} / (a.nn * b.nn), 6)"
    return f"""
WITH {_phash_oracle_ctes().strip().rstrip(',')},
cmnrm AS MATERIALIZED (
  SELECT a.vec_id, a.embedding, {_ANORM} AS nn FROM embeddings a
),
cmip AS MATERIALIZED (
  SELECT id1, id2,
         bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2)) AS ham
  FROM pcand
  WHERE bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2))
        <= {PHASH_T}
),
cmit AS MATERIALIZED (
  SELECT p.id1, p.id2, p.ham, {cos} AS ts
  FROM cmip p
  JOIN cmnrm a ON a.vec_id = p.id1
  JOIN cmnrm b ON b.vec_id = p.id2
),
cmtp AS MATERIALIZED (
  SELECT id1, id2, ts FROM (
    SELECT a.vec_id AS id1, b.vec_id AS id2, {cos} AS ts
    FROM cmnrm a JOIN cmnrm b ON a.vec_id < b.vec_id
  ) WHERE ts >= {SIM_THRESHOLD}
),
cmti AS MATERIALIZED (
  SELECT t.id1, t.id2, {ham_codes} AS ham, t.ts
  FROM cmtp t
  JOIN pcodes x ON x.doc_id = t.id1
  JOIN pcodes y ON y.doc_id = t.id2
)
SELECT 'pair' AS part, CAST(id1 AS BIGINT) AS a,
       CAST(id2 AS BIGINT) AS b, CAST(ham AS BIGINT) AS c, ts AS v
FROM cmit
UNION ALL
SELECT 'imgdup_textdiff' AS part, CAST(id1 AS BIGINT) AS a,
       CAST(id2 AS BIGINT) AS b, CAST(ham AS BIGINT) AS c, ts AS v
FROM cmit WHERE ts < {CM_TEXT_LO}
UNION ALL
SELECT 'textdup_imgdiff' AS part, CAST(id1 AS BIGINT) AS a,
       CAST(id2 AS BIGINT) AS b, CAST(ham AS BIGINT) AS c, ts AS v
FROM cmti WHERE ham > {PHASH_T}
"""


MULTIMODAL_CAPTION_AUDIT_SQL = _cm_audit_sql()


# --- multimodal_image_patches: the vision half of the media mandate —
#     ViT-style patch extraction: the first 32x32 payload bytes form an
#     8-bit grayscale grid, fanned out to 8x8 patches inside the
#     executor (multimodal/media.py::image_patches) with integer pixel
#     sums and exact milli-means. The fixture corpus maxes out at ~577
#     chars — far below one full 1024-byte image — so the gate INJECTS a
#     deterministic payload expansion (text repeated to >= 1024 bytes by
#     integer ceil-division, identically in both engines — the
#     docs_pii_scrub injection precedent) standing in for real image
#     bytes; the kernel's own >= side*side skip rule stays untouched and
#     is pinned with a genuinely-short payload in
#     tests/test_image_patches.py. The DuckDB oracle replays the grid
#     arithmetic over char-code lists of the SAME expansion (ASCII
#     corpus: byte == code point, pinned by
#     tests/test_multimodal_energy.py's fixture contract).

PATCH_SIDE = 32
PATCH = 8


def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.media import image_patches

    need = PATCH_SIDE * PATCH_SIDE
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 1)
        .select(
            "doc_id",
            F.encode(
                F.expr(
                    f"repeat(text, ({need} + length(text) - 1)"
                    " DIV length(text))"
                ),
                "UTF-8",
            ).alias("payload"),
        )
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
         list_transform(
           string_split_regex(
             repeat(text, ({PATCH_SIDE * PATCH_SIDE} + length(text) - 1)
                          // length(text)),
             ''),
           c -> unicode(c)) AS cs
  FROM documents
  WHERE length(text) >= 1
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


# --- multimodal_audio_fingerprint: AUDIO near-dup matching — the audio
#     sibling of the pHash image tier (r12): constellation landmarks +
#     offset-voting hash matching (Wang, "An Industrial-Strength Audio
#     Search Algorithm", ISMIR'03). Pipeline, all exact int64:
#
#     1. LANDMARKS: per full 64-sample PCM window, the peak band of a
#        7-band fixed-point AC filterbank (media.py:
#        audio_constellation_peaks — the same inlined-cosine doctrine
#        as pHash; a real system uses STFT peaks).
#     2. HASHES: each landmark pairs with the next AFP_FAN landmarks;
#        h = (bands, Δt, quantized anchor loudness) where the loudness
#        quantizer is length(bin(amp)) — the integer log2 both engines
#        compute identically (bin() parity verified '0'/'1'-exact).
#     3. CAP: per-h md5-order cap at AFP_CAP (the MUTUAL_BUCKET_CAP
#        policy — at 100 TB the h-join is the only pair surface, and a
#        production hash space (real STFT bins, ~2^20) keeps buckets
#        small; the cap pins the worst case and is the documented
#        epsilon).
#     4. MATCH: join the capped hash table on h across docs, vote on
#        (pair, time-offset) — AFP_MIN_VOTES consistent-offset hits =
#        a matching segment (the Shazam histogram-peak step as one
#        groupBy).
#
#     Gate = long format: part='hash' is the capped deterministic hash
#     TABLE (the HLL gate-the-state doctrine), part='match' the voted
#     pairs. Fixture (sf0.01): 3569 hashes, 397 distinct h, max bucket
#     28 (< cap); 40 matches at votes >= 5 — the known identical-prefix
#     doc pairs score 9-15 votes at offset 0.

AFP_WINDOW = 64
AFP_FAN = 3        # each landmark pairs with the next 3
AFP_CAP = 64       # per-h md5-order candidate cap
AFP_MIN_VOTES = 5  # consistent-offset votes to call a match

AFP_CTAB = [
    [
        int(_math.floor(
            _math.cos(_math.pi * (2 * x + 1) * u / (2 * AFP_WINDOW))
            * PHASH_SCALE + 0.5
        ))
        for x in range(AFP_WINDOW)
    ]
    for u in range(1, 8)
]


def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        )
        return audio_fingerprint_frame(docs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def audio_fingerprint_frame(docs: DataFrame) -> DataFrame:
    """Core over any (doc_id, payload binary) frame — tests inject
    synthetic payloads with planted shared segments here."""
    from pyspark.sql import Window

    from ..multimodal.media import audio_constellation_peaks

    pk = audio_constellation_peaks(
        docs, "doc_id", "payload", AFP_CTAB, window=AFP_WINDOW
    ).persist()
    try:
        pk.count()  # feeds both sides of the landmark pairing (r10 rule)
        p2 = pk.select(
            F.col("doc_id").alias("doc_id"),
            F.col("w").alias("w2"),
            F.col("u").alias("u2"),
        )
        hashes = (
            pk.join(p2, "doc_id")
            .filter(
                (F.col("w2") - F.col("w") >= 1)
                & (F.col("w2") - F.col("w") <= AFP_FAN)
            )
            .select(
                "doc_id",
                "w",
                "amp",
                (
                    (
                        (
                            (F.col("u") - 1) * 7 + (F.col("u2") - 1)
                        ) * AFP_FAN
                        + (F.col("w2") - F.col("w") - 1)
                    ) * 33
                    + F.least(F.length(F.bin(F.col("amp"))), F.lit(32))
                ).alias("h"),
            )
        )
        wcap = Window.partitionBy("h").orderBy(
            F.md5(
                F.concat_ws(
                    "/",
                    F.col("doc_id").cast("string"),
                    F.col("w").cast("string"),
                )
            ),
            "doc_id",
            "w",
        )
        capped = (
            hashes.withColumn("r", F.row_number().over(wcap))
            .filter(F.col("r") <= AFP_CAP)
            .drop("r")
            .localCheckpoint(eager=True)
        )
    finally:
        # r15 (r14 verdict item 3): an exception between persist() and
        # the checkpoint must not leak the peak frame for the session
        pk.unpersist()
    hash_rows = capped.select(
        F.lit("hash").alias("part"),
        F.col("doc_id").cast("long").alias("a"),
        F.col("w").cast("long").alias("b"),
        F.col("h").cast("long").alias("c"),
        F.col("amp").cast("long").alias("v"),
    )
    a = capped.select(
        F.col("doc_id").alias("id_a"), F.col("w").alias("w_a"), "h"
    )
    b = capped.select(
        F.col("doc_id").alias("id_b"), F.col("w").alias("w_b"), "h"
    )
    match_rows = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy(
            "id_a", "id_b", (F.col("w_a") - F.col("w_b")).alias("offset")
        )
        .agg(F.count(F.lit(1)).alias("votes"))
        .filter(F.col("votes") >= AFP_MIN_VOTES)
        .select(
            F.lit("match").alias("part"),
            F.col("id_a").cast("long").alias("a"),
            F.col("id_b").cast("long").alias("b"),
            F.col("offset").cast("long").alias("c"),
            F.col("votes").cast("long").alias("v"),
        )
    )
    return hash_rows.unionByName(match_rows).localCheckpoint(eager=True)


def _afp_sql() -> str:
    W, FAN, CAP, MV = AFP_WINDOW, AFP_FAN, AFP_CAP, AFP_MIN_VOTES
    ctab_rows = ",".join(
        f"({u + 1},{x},{AFP_CTAB[u][x]})"
        for u in range(7) for x in range(W)
    )
    return f"""
WITH acodes AS MATERIALIZED (
  SELECT doc_id,
         list_transform(string_split_regex(text, ''), c -> unicode(c)) AS cs
  FROM documents
),
awins AS MATERIALIZED (
  SELECT doc_id, cs,
         unnest(generate_series(0,
           CAST(floor(len(cs) / {W}.0) AS INT) - 1)) AS w
  FROM acodes
),
actab(u, x, c) AS (VALUES {ctab_rows}),
abands AS MATERIALIZED (
  SELECT awins.doc_id, awins.w, actab.u,
         ABS(SUM(actab.c * awins.cs[awins.w * {W} + actab.x + 1])) AS ab
  FROM awins, actab
  GROUP BY awins.doc_id, awins.w, actab.u
),
apeaks AS MATERIALIZED (
  SELECT doc_id, w, u, ab FROM (
    SELECT doc_id, w, u, ab,
           ROW_NUMBER() OVER (PARTITION BY doc_id, w
                              ORDER BY ab DESC, u) AS rk
    FROM abands
  ) WHERE rk = 1
),
ah AS MATERIALIZED (
  SELECT p.doc_id, p.w, p.ab AS amp,
         (((p.u - 1) * 7 + (q.u - 1)) * {FAN} + (q.w - p.w - 1)) * 33
           + LEAST(length(bin(p.ab)), 32) AS h
  FROM apeaks p JOIN apeaks q
    ON q.doc_id = p.doc_id AND q.w - p.w BETWEEN 1 AND {FAN}
),
acap AS MATERIALIZED (
  SELECT doc_id, w, amp, h FROM (
    SELECT doc_id, w, amp, h,
           ROW_NUMBER() OVER (
             PARTITION BY h
             ORDER BY md5(CAST(doc_id AS VARCHAR) || '/'
                          || CAST(w AS VARCHAR)), doc_id, w) AS r
    FROM ah
  ) WHERE r <= {CAP}
)
SELECT 'hash' AS part,
       CAST(doc_id AS BIGINT) AS a, CAST(w AS BIGINT) AS b,
       CAST(h AS BIGINT) AS c, CAST(amp AS BIGINT) AS v
FROM acap
UNION ALL
SELECT 'match' AS part,
       CAST(id_a AS BIGINT) AS a, CAST(id_b AS BIGINT) AS b,
       CAST(toff AS BIGINT) AS c, CAST(votes AS BIGINT) AS v
FROM (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         x.w - y.w AS toff, COUNT(*) AS votes
  FROM acap x JOIN acap y ON x.h = y.h AND x.doc_id < y.doc_id
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= {MV}
)
"""


MULTIMODAL_AUDIO_FINGERPRINT_SQL = _afp_sql()
