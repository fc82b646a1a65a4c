"""Vector math over ``array<float>`` embedding columns.

Two tiers:

- ``dot_fixed``/``norm_fixed``/``cosine_fixed`` — for a known dimension,
  a *flat left-associated* sum of ``a[i]*b[i]`` terms. This stays inside
  WholeStageCodegen (plain arithmetic, zero per-row allocations), unlike
  the higher-order-function tier below which allocates intermediate
  arrays per evaluation (zip_with result + accumulators) and thrashes GC
  on million-pair joins. Left association keeps the summation order
  identical to the sequential fold, so scores are bit-identical to the
  generic tier and to the DuckDB oracle.
- ``dot``/``norm``/``cosine`` — generic `zip_with` + `aggregate`
  expressions for unknown dimensions (still JVM-side, no Python).

The heavy k-NN paths additionally have a numpy ``mapInPandas`` variant
in ``operators/knn.py`` for matrix-batched scoring at cluster scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 64  # driver testdata embedding dimension


def as_double(vec: Column) -> Column:
    """Promote array<float> → array<double> so score math matches the
    float64 oracle bit-for-bit (modulo summation order)."""
    return F.transform(vec, lambda x: x.cast("double"))


# ---------------------------------------------------------------- generic (HOF)


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


# ------------------------------------------------------- fixed-dim (codegen)


def _elem(vec: Column, i: int, cast: bool) -> Column:
    # element_at is 1-based
    e = F.element_at(vec, i + 1)
    return e.cast("double") if cast else e


def dot_fixed(a: Column, b: Column, dim: int = EMBEDDING_DIM, cast: bool = True) -> Column:
    """Flat left-associated dot product. Pass ``cast=False`` when the
    arrays are already array<double> (pre-cast per row with
    ``as_double``) — halves the expression size, which matters both for
    Janino compile time and per-pair evaluation."""
    terms = [_elem(a, i, cast) * _elem(b, i, cast) for i in range(dim)]
    # left-associated chain == sequential-fold summation order
    return reduce(lambda acc, t: acc + t, terms)


def norm_fixed(a: Column, dim: int = EMBEDDING_DIM, cast: bool = True) -> Column:
    return F.sqrt(dot_fixed(a, a, dim, cast))


def dot_const(vec: Column, consts, cast: bool = True) -> Column:
    """Flat dot product against a Python-side constant vector (e.g. a
    centroid): every c_i folds into the codegen as a literal — no
    array column, no HOF allocation."""
    terms = [_elem(vec, i, cast) * F.lit(float(c)) for i, c in enumerate(consts)]
    return reduce(lambda acc, t: acc + t, terms)


def cosine_fixed(a: Column, b: Column, dim: int = EMBEDDING_DIM) -> Column:
    return dot_fixed(a, b, dim) / (norm_fixed(a, dim) * norm_fixed(b, dim))


def cosine_rounded(a: Column, b: Column, digits: int = 4) -> Column:
    from .exact import pround

    return pround(cosine(a, b), digits)
