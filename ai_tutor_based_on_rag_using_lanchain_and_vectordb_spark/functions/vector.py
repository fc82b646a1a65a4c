"""Vector math over ``array<float>`` embedding columns as pure Column
expressions (`zip_with` + `aggregate` — JVM-side, no UDF). At scale the
per-row cost is a tight codegen loop over the 64-dim arrays; the heavy
k-NN paths additionally have a numpy ``mapInPandas`` variant in
``operators/knn.py`` for matrix-batched scoring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """Promote array<float> → array<double> so score math matches the
    float64 oracle bit-for-bit (modulo summation order)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 4) -> Column:
    return F.round(cosine(a, b), digits)
