"""Heavy hitters (frequent items) at corpus scale: EXACT answers
without shuffling the full distinct domain.

The obvious plan — groupBy(key).count() then filter > phi*n — shuffles
every distinct key. At the 100 TB design point the distinct domain
(urls, user ids, shingles) can be billions of keys, so that shuffle IS
the job. The two-pass plan here shuffles only a provably bounded
candidate set:

1. **Candidate pass** — each partition maintains a Misra-Gries summary
   of k counters over its rows (mapInPandas, batch-merged: add the
   batch's value counts, then subtract the (k+1)-th largest weight and
   drop non-positives — the classic mergeable-summaries merge, Agarwal
   et al., PODS'12). Per-partition error ≤ n_p/(k+1); summed over
   partitions the global undercount of any key is ≤ n/(k+1).
2. **Merge + threshold** — summaries union (≤ k rows per partition),
   groupBy(key).sum(weight): any key with true count > phi*n has
   merged weight ≥ phi*n − n/(k+1) > 0 for k ≥ 1/phi, so filtering at
   that bound yields a SUPERSET of the true heavy hitters with at most
   1/(phi − 1/(k+1)) keys — a constant, independent of n.
3. **Exact recount** — broadcast the candidate keys back over the data
   (map-side hash semi-aggregation: only candidate keys enter the
   shuffle), count exactly, filter > phi*n. Output is EXACT — same
   rows as the naive plan, verifiable by a plain SQL oracle.

The total over n is a 1-row scalar aggregate (broadcast), never a
driver-side count action.

Domain: NON-NULL keys only. pandas ``value_counts`` excludes None/NaN,
and the streaming variant reuses the null key as the partition-row-
count sentinel, so NULL can never be a counter — rather than diverge
silently, every entry point (the MG pass, the naive baseline, the
driver oracle) filters ``col IS NOT NULL`` explicitly and the total n
is the non-null row count.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_trim(counters: dict, k: int) -> dict:
    """The mergeable-summaries reduction (Agarwal et al., PODS'12):
    if more than k counters, subtract the (k+1)-th largest weight from
    everything and drop non-positives. Applying it after adding two
    summaries IS the MG merge; the ε·n error bound survives arbitrary
    merge trees — which is what makes the streaming variant sound."""
    if len(counters) <= k:
        return counters
    w = sorted(counters.values(), reverse=True)[k]
    return {v: c - w for v, c in counters.items() if c - w > 0}


def _domain_filter(df: DataFrame, col: str) -> DataFrame:
    """Restrict to the operator's key domain: non-null AND (for float
    keys) non-NaN. Spark's isNotNull keeps NaN, but the pandas fold's
    value_counts drops it AND the None sentinel of the part_rows path
    stores as NaN in a float column — so a NaN key could neither be
    counted consistently nor represented. Excluding it on EVERY path
    (fold, recount, naive baseline, streaming) keeps them
    row-for-row comparable."""
    dt = df.schema[col].dataType.simpleString()
    cond = F.col(col).isNotNull()
    if dt in ("float", "double"):
        cond = cond & ~F.isnan(F.col(col))
    return df.where(cond)


def _mg_summaries(col: str, k: int, emit_part_rows: bool = False):
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            # non-null domain (module docstring): n counts only rows a
            # counter could ever represent, keeping the stream total
            # consistent with the batch operator's filtered total
            s = pdf[col].dropna()
            n_rows += len(s)
            for v, c in s.value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            counters = mg_trim(counters, k)
        if emit_part_rows:
            # one summary row per counter (part_rows 0) plus one
            # null-key row carrying the partition's row count — both
            # facts from a single pass over the partition
            yield pd.DataFrame(
                {
                    col: list(counters) + [None],
                    "mg_weight": list(counters.values()) + [0],
                    "part_rows": [0] * len(counters) + [n_rows],
                }
            )
        else:
            yield pd.DataFrame(
                {col: list(counters), "mg_weight": list(counters.values())}
            )

    return run


def heavy_hitters(df: DataFrame, col: str, phi: float, k: int | None = None) -> DataFrame:
    """Keys of ``df[col]`` whose frequency exceeds ``phi`` of the total
    row count, with their EXACT counts (columns: col, cnt). ``k`` is
    the per-partition counter budget; the default 2/phi keeps the
    candidate bound at 2/phi keys while guaranteeing the superset
    property (any k ≥ 1/phi is sound). NULL keys are outside the
    domain (module docstring): they are filtered here and the total n
    is the non-null row count. Float NaN keys are likewise outside the
    domain (see _domain_filter)."""
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if k is None:
        k = int(math.ceil(2.0 / phi))
    if k < int(math.ceil(1.0 / phi)):
        raise ValueError(
            f"k={k} breaks the superset guarantee: need k >= 1/phi = "
            f"{math.ceil(1.0 / phi)}"
        )

    df = _domain_filter(df, col)
    dtype = df.schema[col].dataType.simpleString()
    summaries = df.select(col).mapInPandas(
        _mg_summaries(col, k), f"{col} {dtype}, mg_weight long"
    )
    total = df.groupBy().agg(F.count(F.lit(1)).alias("n_total"))

    candidates = (
        summaries.groupBy(col)
        .agg(F.sum("mg_weight").alias("w"))
        .crossJoin(F.broadcast(total))
        # merged weight ≥ phi*n − n/(k+1) for every true heavy hitter
        .where(F.col("w") >= F.col("n_total") * (phi - 1.0 / (k + 1)))
        .select(col)
    )

    return (
        df.join(F.broadcast(candidates), col)  # candidate set is O(1/phi)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.col("n_total") * phi)
        .select(col, "cnt")
    )


def exact_heavy_hitters_naive(df: DataFrame, col: str, phi: float) -> DataFrame:
    """The full-domain-shuffle plan, kept as the equivalence baseline
    for tests (NOT the scale path). Same non-null non-NaN domain as
    heavy_hitters so the two are row-for-row comparable."""
    df = _domain_filter(df, col)
    total = df.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.col("n_total") * phi)
        .select(col, "cnt")
    )
