"""Scalable grouped prefix sums — running totals over a per-group
order WITHOUT one window task per group.

``sum(v) OVER (PARTITION BY g ORDER BY o)`` puts ALL of one group's
rows in a single window task: for corpus-scaled groups (a dominant
language, one hot tenant) that is the same single-task straggler an
unpartitioned window has, just per group. This module two-phases it
exactly like operators/ranks.py does for global ranks:

1. value-derived range buckets on the order column (approximate global
   quantile cuts — one bounded driver collect of the cuts, never data);
2. per-(group, bucket) partial sums — a map-side-combinable groupBy;
3. per-group cumulative bucket offsets via a window over the SMALL
   partial-sum table (≤ n_buckets rows per group task, bounded by
   construction);
4. join the offsets back and finish with a running sum windowed by
   (group, bucket) — per-task state is one group's slice of one
   quantile bucket, never a whole group.

Used by the sequence-packing stage (plans/trainprep.py): concat-and-
chunk packing needs each document's running token offset within its
shard, on shards whose size is corpus-scaled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import default_parallelism
from .ranks import bucket_key_expr


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value: Column,
    out_col: str = "cum_before",
    n_buckets: int | None = None,
    accuracy: int = 10_000,
    exact: bool = False,
) -> DataFrame:
    """Add ``out_col`` = the EXCLUSIVE running sum of ``value`` over
    rows strictly before this one in ``order_col`` order within the
    row's ``group_cols`` group (the standard packing/offset shape).

    ``order_col`` must uniquely order rows within a group (a stable id
    — the usual case); ``value`` is any numeric expression computable
    from the row. One bounded driver collect (the quantile cuts);
    everything else is distributed.

    ``exact=True`` accumulates in DECIMAL(38,0) instead of double —
    required for INTEGER values whose running totals can exceed 2⁵³
    (corpus-scale counts/cents), where a double sum silently drifts
    from an integer-exact oracle. ``out_col`` is then decimal(38,0);
    callers cast it back (``.cast("long")``) as needed. The default
    double mode remains for genuinely-float values (their sums carry
    the usual fp semantics either way).
    """
    n_buckets = n_buckets or 4 * default_parallelism()
    ocol = bucket_key_expr(df, order_col)

    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = df.select(
        F.percentile_approx(ocol, probs, accuracy).alias("c")
    ).first()
    raw_cuts = (cuts_row["c"] if cuts_row else None) or []
    cuts = sorted({float(c) for c in raw_cuts if c is not None})
    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(cut_arr, lambda c: c < ocol))
    else:
        bucket = F.lit(0)

    g = list(group_cols)
    acc_type = "decimal(38,0)" if exact else "double"
    zero = F.lit(0).cast(acc_type)
    tagged = df.withColumn("_pv", value.cast(acc_type)).withColumn(
        "_pbkt", bucket
    )

    # per-(group, bucket) partials: map-side combine collapses each
    # task's slice before the shuffle
    partials = tagged.groupBy(*g, "_pbkt").agg(F.sum("_pv").alias("_bsum"))
    # cumulative offsets across buckets WITHIN each group: the window
    # input is the partial table — ≤ n_buckets rows per group
    w_off = (
        Window.partitionBy(*g)
        .orderBy("_pbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        *g, "_pbkt", F.coalesce(F.sum("_bsum").over(w_off), zero).alias("_boff")
    )

    # running sum inside one (group, bucket) slice + the bucket offset
    w_run = (
        Window.partitionBy(*g, "_pbkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL-SAFE join back: a NULL group key is a legitimate group for
    # groupBy, but an equi-join would silently drop its rows
    off = offsets.select(
        *[F.col(c).alias(f"_o_{c}") for c in g],
        F.col("_pbkt").alias("_o_pbkt"),
        "_boff",
    )
    cond = F.col("_pbkt").eqNullSafe(F.col("_o_pbkt"))
    for c in g:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_o_{c}"))
    return (
        tagged.join(off, cond)
        .withColumn(
            out_col,
            F.col("_boff") + F.coalesce(F.sum("_pv").over(w_run), zero),
        )
        # restore the caller's column order, plus the running-sum column
        .select(*df.columns, out_col)
    )
