"""Skew-aware aggregation: two-phase salted groupBy.

When one key dominates (a viral session, an empty-string file_hash), a
plain groupBy sends the whole hot key to one reducer. Salting splits
each key into ``salt_n`` sub-keys for a partial aggregate, then a second
(tiny) aggregate merges the partials — the standard treatment when
AQE's skew-join splitting doesn't apply (aggregations, not joins).

Only algebraic aggregates decompose this way; exposed here: count, sum,
min, max (avg = sum/count at the merge step).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """``aggs``: output_name -> (fn, input_col) with fn in
    {count,sum,min,max,avg}. Deterministic salt from a stable row
    attribute would break hot-key splitting, so the salt is random —
    fine because every exposed aggregate is order/partition-insensitive.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_n).cast("int"))

    partial_exprs: list[Column] = []
    merge_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col if col != "*" else F.lit(1)).alias(f"_p_{name}"))
            merge_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{name}"))
            merge_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{name}"))
            merge_exprs.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{name}"))
            merge_exprs.append(F.max(f"_p_{name}").alias(name))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"_ps_{name}"))
            partial_exprs.append(F.count(col).alias(f"_pc_{name}"))
            merge_exprs.append(
                (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
            )
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)
