"""multimodal_audio_energy parity guards (ADVICE r4).

The Spark kernel treats the payload as UTF-8 *bytes* while the DuckDB
oracle replays unicode *code points* — identical only while the corpus is
ASCII — and the two engines must agree on how many windows an empty payload
produces (zero). These tests pin both contracts so a driver-side corpus
change fails loudly here instead of as an opaque gate hash mismatch.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from neomarket_clickhouse_indexer_spark.multimodal.media import pcm_window_energy

from .conftest import SF_CORRECTNESS, SF_SMOKE


def test_empty_payload_emits_zero_windows(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "source": ["a", "b"], "payload": [b"", b"xyz"]}
    )
    out = (
        pcm_window_energy(
            spark.createDataFrame(pdf), "doc_id", "payload",
            window=64, carry_cols=("source",),
        )
        .toPandas()
    )
    # doc 1 (empty) contributes NO window rows — same as the oracle's
    # generate_series over ceil(0/window); doc 2 contributes one
    assert set(out["doc_id"]) == {2}
    assert len(out) == 1
    assert out.iloc[0]["energy"] == ord("x") ** 2 + ord("y") ** 2 + ord("z") ** 2


def test_documents_text_is_nonempty_ascii():
    """Fixture contract: the byte==code-point assumption holds only for
    non-empty ASCII text. If this fails after a testdata refresh, the
    char-indexed oracles must switch to octet positions: they cover
    multimodal_audio_energy, the pHash paths of multimodal_frame_dedup
    (ascii()/length() vs the Spark kernels' encode() bytes — both the
    pixel values AND the >= PHASH_SIDE^2 membership filter diverge on
    multi-byte text), and multimodal_audio_fingerprint's sample stream."""
    con = duckdb.connect()
    for sf in (SF_SMOKE, SF_CORRECTNESS):
        bad = con.execute(
            f"""
            SELECT COUNT(*) FROM read_parquet('{sf}/documents.parquet')
            WHERE len(text) = 0 OR octet_length(encode(text)) != length(text)
            """
        ).fetchone()[0]
        assert bad == 0, f"{sf}: {bad} empty or non-ASCII documents"
