"""Vector/embedding column functions — similarity search building blocks.

Embeddings are ``array<float>`` columns. All arithmetic happens JVM-side via
higher-order functions (``zip_with`` + ``aggregate``): per-row sequential
folds are deterministic IEEE double chains, identical to the oracle's
in-order list reduction, so cosine similarities round-trip exactly at 6
decimals.

Scale path: brute-force top-k is a broadcast nested-loop of the (small) query
set against the corpus — linear in corpus size, embarrassingly parallel, no
shuffle of the corpus. The LSH/IVF variants (operators/minhash.py and the
random-hyperplane bucketing here) cut the candidate set before exact
re-scoring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, scale: int = 6) -> Column:
    return F.round(cosine(a, b), scale)


# NOTE (r10): an unrolled flat dim-term dot expression was tried for the
# NSW pair scorer and was 2x SLOWER than the zip_with+aggregate fold at
# sf0.1 (codegen compile blowup on the 64-term tree — the same failure
# mode that made _bucket_expr switch to compact folds). Keep the folds.
