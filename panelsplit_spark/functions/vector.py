"""Vector column functions over ``array<float|double>`` embeddings.

All JVM-side Catalyst higher-order functions (``zip_with`` /
``aggregate``) — the embedding hot path never crosses into Python. Inputs
are cast to double first so results are bit-compatible with a
double-precision SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["as_double", "dot", "l2_norm", "cosine_similarity"]


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) in double precision (oracle:
    ``list_cosine_similarity(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))``)."""
    a = as_double(a)
    b = as_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
