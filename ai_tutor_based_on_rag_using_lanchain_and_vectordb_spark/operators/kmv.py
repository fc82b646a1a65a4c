"""KMV (k-minimum-values / bottom-k theta) sketches: mergeable
distinct-count AND set-overlap estimation — the third mergeable-summary
family next to HLL (streaming/windows) and Misra-Gries (operators/
freq). HLL unions but cannot intersect; KMV keeps the k smallest
distinct hash values, so two sketches intersect by counting shared
values below the common threshold (the theta-sketch trick) — the
audience-overlap primitive at corpus scale.

Plan shape: hashing stays JVM-side (xxhash64, sign-bit-XORed so SIGNED
ordering equals unsigned hash ordering), each partition keeps its k
smallest distinct values in bounded state (mapInPandas), and the global
k smallest are read off the ≤ k·partitions summary rows — no shuffle
ever carries the distinct domain (the groupBy-distinct plan's shuffle
IS the job when the domain is billions of keys).

Exactness windows (the oracle hooks):

- ``merge(kmv(A), kmv(B)) == kmv(A ∪ B)`` EXACTLY (k smallest distinct
  values of a union are determined by the per-side k smallest) — the
  mergeability tests pin strict equality, not an error bound.
- With ``k ≥ |distinct|`` the sketch holds every distinct hash, so
  count and intersection are EXACT (modulo 64-bit hash collisions,
  ~1e-10 at 1e5 keys) — the exhaustive configuration the driver oracle
  checks against COUNT(DISTINCT), the knn_ivf_exhaustive move.

Estimator: with m = sketch size, distinct ≈ (m-1)/frac(m-th smallest)
when the sketch is full (m == k), exact m otherwise; rel. error is
O(1/sqrt(k)).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOPBIT = -(1 << 63)  # long with only the sign bit set (XOR flips it)
_SPAN = float(1 << 64)


def _frac(uk: int) -> float:
    """Position of a sign-flipped hash in [0, 1)."""
    return (uk + (1 << 63)) / _SPAN


def _kmin_partition(k: int, grouped: bool):
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        if grouped:
            state: dict = {}
            for pdf in batches:
                for g, sub in pdf.groupby("_g", sort=False):
                    u = np.unique(sub["uk"].to_numpy())
                    prev = state.get(g)
                    if prev is not None:
                        u = np.unique(np.concatenate([prev, u]))
                    state[g] = u[:k]
            yield pd.DataFrame(
                {
                    "_g": np.repeat(
                        np.array(list(state), dtype=object),
                        [len(v) for v in state.values()],
                    ),
                    "uk": np.concatenate(list(state.values()))
                    if state
                    else np.array([], dtype=np.int64),
                }
            )
        else:
            acc = np.array([], dtype=np.int64)
            for pdf in batches:
                u = np.unique(pdf["uk"].to_numpy())
                acc = np.unique(np.concatenate([acc, u]))[:k]
            yield pd.DataFrame({"uk": acc})

    return run


def kmv_sketch(df: DataFrame, col: str, k: int) -> DataFrame:
    """The sketch as a DataFrame of ≤ k rows (uk long, ascending order
    = unsigned hash order). Bounded state everywhere: k values per
    partition, k·partitions summary rows, k output rows."""
    hashed = df.select(
        F.xxhash64(col).bitwiseXOR(F.lit(_TOPBIT)).alias("uk")
    ).where(F.col(col).isNotNull())
    summaries = hashed.mapInPandas(_kmin_partition(k, grouped=False), "uk long")
    return summaries.dropDuplicates(["uk"]).orderBy("uk").limit(k)


def kmv_sketch_grouped(
    df: DataFrame, group_col: str, col: str, k: int
) -> DataFrame:
    """Per-group sketches (group, uk): per-partition per-group bounded
    state, then a WindowGroupLimit over the small summary set."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col).alias("_g"),
        F.xxhash64(col).bitwiseXOR(F.lit(_TOPBIT)).alias("uk"),
    ).where(F.col(col).isNotNull() & F.col("_g").isNotNull())
    gtype = df.schema[group_col].dataType.simpleString()
    summaries = hashed.mapInPandas(
        _kmin_partition(k, grouped=True), f"_g {gtype}, uk long"
    )
    w = Window.partitionBy("_g").orderBy("uk")
    return (
        summaries.dropDuplicates(["_g", "uk"])
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(F.col("_g").alias(group_col), "uk")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """merge(kmv(A), kmv(B)) == kmv(A ∪ B), exactly."""
    return (
        a.select("uk")
        .unionByName(b.select("uk"))
        .dropDuplicates(["uk"])
        .orderBy("uk")
        .limit(k)
    )


def kmv_estimate(uks: list, k: int) -> float:
    """Distinct-count estimate from a COLLECTED sketch (≤ k values,
    bounded by construction). Exact when the sketch isn't full."""
    m = len(uks)
    if m < k:
        return float(m)
    theta = _frac(max(uks))
    return (m - 1) / theta if theta > 0 else float(m)


def kmv_intersection(a_uks: list, b_uks: list, k: int) -> float:
    """|A ∩ B| estimate from two collected sketches: count shared
    values below the common threshold θ = min(θ_A, θ_B), scale by 1/θ.
    Exact when both sketches are un-full (they hold every value)."""
    sa, sb = set(a_uks), set(b_uks)
    if len(sa) < k and len(sb) < k:
        return float(len(sa & sb))
    # θ_X = frac(max) only for FULL sketches (an un-full sketch kept
    # everything — its implicit θ is 1)
    full_maxes = [max(s) for s in (sa, sb) if len(s) >= k]
    theta_uk = min(full_maxes)
    theta = _frac(theta_uk)
    common = sum(1 for v in sa & sb if v <= theta_uk)
    return common / theta if theta > 0 else float(common)
