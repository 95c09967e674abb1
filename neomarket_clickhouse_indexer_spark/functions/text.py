"""Text-analysis column functions for large-scale training-data pipelines.

All functions are pure Spark SQL expressions (JVM-side, codegen'd — no Python
UDFs in the hot path), so they survive a 100 TB scan: tokenization, quality
stats, language-ID scoring, shingling, MinHash signatures and fingerprints are
all per-row ``transform``/``filter``/``aggregate`` lambdas over split arrays.

Determinism: hashing uses md5 (identical in DuckDB) rather than xxhash64
(Spark-only), so every operator here has an exact cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared stopword list (language-agnostic quality scoring).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# Marker words per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "了", "在", "和"],
}
LANG_ORDER = ["en", "es", "fr", "de", "zh"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split — matches DuckDB
    string_split(text, ' ') exactly)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def in_list_count(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def avg_token_len(toks: Column) -> Column:
    """Exact integer arithmetic then one double division (deterministic)."""
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.round(total / F.size(toks), 4)


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: in_list_count(toks, words) for lang, words in LANG_MARKERS.items()}


def predict_lang(toks: Column) -> Column:
    """Argmax over language marker scores with a fixed precedence chain
    (en > es > fr > de > zh on ties) — mirrored as a CASE chain in the
    oracle so tie-breaking is bit-identical."""
    s = lang_scores(toks)
    best = s[LANG_ORDER[0]]
    pred = F.lit(LANG_ORDER[0])
    for lang in LANG_ORDER[1:]:
        cond = s[lang] > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, s[lang]).otherwise(best)
    return pred


def shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-grams (distinct by default). Documents shorter than n words
    fall back to the whole text as a single shingle.

    ``distinct=False`` skips the dedup — correct wherever the consumer is
    duplicate-invariant (min-hash: duplicates never change a min), and
    measurably cheaper on long docs.

    ``toks`` is bound ONCE per row via ``transform(array(toks), t -> …)[1]``
    before any per-gram work: an outer expression referenced inside a
    higher-order-function lambda is re-evaluated PER ELEMENT, so the usual
    ``split(text, ' ')`` argument would otherwise run once per gram per
    element_at — O(tokens²) per doc (measured 6.16s → 0.35s for the n=5
    distinct explode over sf0.1 documents; the r14 CollapseProject lesson,
    generalized to HOF lambda capture)."""

    def _per(t: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + k + 1) for k in range(n)]),
        )
        if distinct:
            grams = F.array_distinct(grams)
        return F.when(F.size(t) >= n, grams).otherwise(
            F.array(F.concat_ws(" ", t))
        )

    return F.element_at(F.transform(F.array(toks), _per), 1)


def _seeded_md5(prefix: str):
    # closure factory, NOT `lambda s, b=b:` — a two-parameter lambda makes
    # Spark's transform() pass the ARRAY INDEX as the second argument,
    # silently overriding the default (degenerate signatures)
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def hash_families(shingle_col: Column, num_families: int) -> list[Column]:
    """Per-shingle md5 arrays, one per seed family: family b =
    transform(sh, s -> md5(b ':' s)). Materialize these ONCE (alias them in
    a projection) before slicing permutations out — md5 is the expensive
    part."""
    return [
        F.transform(shingle_col, _seeded_md5(f"{b}:")).alias(f"hf{b}")
        for b in range(num_families)
    ]


PERMS_PER_MD5 = 4  # 128-bit digest → 4 × 32-bit (8 hex chars) sub-hashes


def minhash_from_families(family_cols: list[Column], num_perm: int) -> list[Column]:
    """MinHash signature: perm i = min over shingles of the i-th 8-hex-char
    slice of the (i // 4)-th family hash. One md5 per shingle yields FOUR
    permutations (uniform independent 32-bit slices), so 16 perms cost 4
    md5 passes instead of 16. Lexicographic min over fixed-width hex ==
    numeric min; engine-portable (DuckDB substring + list min)."""
    def slicer(off: int):
        return lambda h: F.substring(h, off, 8)

    sigs = []
    for i in range(num_perm):
        fam = family_cols[i // PERMS_PER_MD5]
        off = (i % PERMS_PER_MD5) * 8 + 1
        sigs.append(F.array_min(F.transform(fam, slicer(off))).alias(f"mh{i}"))
    return sigs


def fingerprint(text: Column) -> Column:
    """Document fingerprint: min rolling word-3-gram hash (minhash with one
    permutation) — stable under local edits far from the minimum shingle."""
    return F.array_min(
        F.transform(shingles(tokens(text), 3), lambda s: F.md5(s))
    )
