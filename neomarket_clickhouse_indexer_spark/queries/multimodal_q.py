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
