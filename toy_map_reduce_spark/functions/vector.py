"""Vector column expressions over ``array<float|double>`` embeddings.

All folds are left-to-right double-precision — this exactly matches DuckDB
``list_reduce`` element order, which is what makes the similarity operators
hash-comparable cross-engine (the DuckDB builtin ``list_cosine_similarity``
computes in float32 and diverges by ~5e-8; never use it in oracles).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def as_double(col):
    """Cast an array<float> column elementwise to double (exact)."""
    return F.transform(col, lambda x: x.cast("double"))


def l2_norm(e):
    return F.sqrt(F.aggregate(F.transform(e, lambda x: x * x), F.lit(0.0), lambda a, b: a + b))


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a, b, a_norm, b_norm):
    return dot(a, b) / (a_norm * b_norm)
