"""Scalable global ranking: exact row numbers / ntile over a total
order WITHOUT the single-task `Window.orderBy(...)` global sort.

The classic plan for ``row_number() OVER (ORDER BY ...)`` (no
PARTITION BY) funnels the entire input through ONE window task — the
canonical straggler at 100 TB. This module replaces it with the
standard two-phase range-bucketed rank:

1. one small aggregate computes ~``n_buckets`` approximate quantile cut
   points of the primary sort key (a bounded driver collect: the cuts,
   not the data);
2. every row gets a VALUE-derived bucket id by comparison against the
   cuts (codegen, deterministic across re-evaluations — unlike
   ``spark_partition_id()`` after a repartition, which can renumber
   between the count job and the rank job);
3. per-bucket counts (a second small aggregate) become cumulative
   offsets, and the global row number is
   ``offset[bucket] + row_number() OVER (PARTITION BY bucket ...)`` —
   every window task owns one quantile-balanced bucket.

Ties on the primary key all land in the same bucket (value-derived),
so the in-bucket tie-break columns order them exactly as the global
sort would. Skew bound: a single value that dominates the distribution
collapses into one bucket (duplicate cuts are deduped) — the same
bound any value-based split has; the tie-break window then sorts that
one hot value's rows in a single task, which is still strictly better
than sorting ALL rows in one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import default_parallelism


def bucket_key_expr(df: DataFrame, name: str) -> Column:
    """The primary sort key as a double for quantile bucketing —
    validated: a non-castable type (string, date, array) would turn
    every bucket id into NULL and silently collapse the operator back
    into the one-task window it exists to avoid (r7 advisor finding).
    """
    dt = df.schema[name].dataType
    if not isinstance(dt, (T.NumericType, T.TimestampType, T.TimestampNTZType)):
        raise TypeError(
            f"bucketed rank/prefix key {name!r} has type {dt.simpleString()}; "
            "a numeric or timestamp key is required (cast dates with "
            "to_timestamp, or hash string keys to a numeric surrogate first)"
        )
    return F.col(name).cast("double")


def global_row_number(
    df: DataFrame,
    primary: str,
    tiebreaks: Sequence[str] = (),
    primary_desc: bool = False,
    n_buckets: int | None = None,
    out_col: str = "rn",
    accuracy: int = 10_000,
) -> tuple[DataFrame, int]:
    """Exact global ``row_number`` over
    (primary asc|desc, *tiebreaks asc) as ``out_col``.

    Returns ``(df_with_rn, total_rows)`` — the total is known for free
    from the per-bucket counts (callers like ntile need it). Runs two
    bounded driver actions (cut points, bucket counts) at plan-build
    time; both collect O(n_buckets) values, never data rows.
    """
    n_buckets = n_buckets or 4 * default_parallelism()
    pcol = bucket_key_expr(df, primary)

    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = df.select(
        F.percentile_approx(pcol, probs, accuracy).alias("c")
    ).first()
    raw_cuts = (cuts_row["c"] if cuts_row else None) or []
    cuts = sorted({float(c) for c in raw_cuts if c is not None})

    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        if primary_desc:
            # bucket = #cuts strictly above the value: largest values
            # get bucket 0, ties share a bucket
            bucket = F.size(F.filter(cut_arr, lambda c: c > pcol))
        else:
            bucket = F.size(F.filter(cut_arr, lambda c: c < pcol))
    else:
        bucket = F.lit(0)
    # NULL primary sorts last in both engines' default for our usage:
    # pin NULLs to the final bucket so the in-bucket orderBy decides
    bucket = F.when(pcol.isNull(), F.lit(len(cuts))).otherwise(bucket)

    bucketed = df.withColumn("_gbkt", bucket)
    counts = {
        r["_gbkt"]: r["cnt"]
        for r in bucketed.groupBy("_gbkt").agg(F.count("*").alias("cnt")).collect()
    }
    total = int(sum(counts.values()))
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    # NULLS LAST on the primary in BOTH directions: the null rows were
    # pinned to the final bucket above, so the in-bucket order must put
    # them after that bucket's non-null values too (one consistent
    # global contract: nulls sort last)
    order: list[Column] = [
        F.desc_nulls_last(primary) if primary_desc else F.asc_nulls_last(primary)
    ] + [F.asc(t) for t in tiebreaks]
    w = Window.partitionBy("_gbkt").orderBy(*order)
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        rn = F.element_at(off_map, F.col("_gbkt")) + F.row_number().over(w)
    else:  # empty input: keep a well-typed column
        rn = F.row_number().over(w).cast("long")
    return bucketed.withColumn(out_col, rn.cast("long")).drop("_gbkt"), total


def grouped_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    primary: str,
    tiebreaks: Sequence[str] = (),
    primary_desc: bool = False,
    n_buckets: int | None = None,
    out_col: str = "rn",
    count_col: str | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact PER-GROUP row numbers over (primary asc|desc, *tiebreaks
    asc) without one window task per group — the grouped analog of
    :func:`global_row_number` for low-cardinality groups whose members
    are corpus-scaled (25 nations over 10⁹ customers: a plain
    ``Window.partitionBy(nation)`` caps parallelism at 25 and sorts a
    whole nation per task).

    Buckets come from GLOBAL quantile cuts of the primary (one bounded
    driver collect, shared across groups); per-(group, bucket) counts
    turn into per-group cumulative offsets via a window over the SMALL
    partial table (≤ n_buckets rows per group); the final row number is
    offset + row_number within one (group, bucket) slice. Ties on the
    primary stay inside one bucket, so tie-breaks order them exactly as
    the single-window plan would.

    ``count_col``: when set, also attach the group's total row count
    (what percent_rank / cume_dist denominators need) — it falls out of
    the same partial table for free."""
    n_buckets = n_buckets or 4 * default_parallelism()
    pcol = bucket_key_expr(df, primary)

    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = df.select(
        F.percentile_approx(pcol, probs, accuracy).alias("c")
    ).first()
    raw_cuts = (cuts_row["c"] if cuts_row else None) or []
    cuts = sorted({float(c) for c in raw_cuts if c is not None})
    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        if primary_desc:
            bucket = F.size(F.filter(cut_arr, lambda c: c > pcol))
        else:
            bucket = F.size(F.filter(cut_arr, lambda c: c < pcol))
    else:
        bucket = F.lit(0)
    bucket = F.when(pcol.isNull(), F.lit(len(cuts))).otherwise(bucket)

    g = list(group_cols)
    tagged = df.withColumn("_gbkt", bucket)
    partials = tagged.groupBy(*g, "_gbkt").agg(F.count("*").alias("_bcnt"))
    w_off = (
        Window.partitionBy(*g)
        .orderBy("_gbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        *g,
        "_gbkt",
        F.coalesce(F.sum("_bcnt").over(w_off), F.lit(0)).alias("_boff"),
        F.sum("_bcnt").over(Window.partitionBy(*g)).alias("_gtot"),
    )

    order: list[Column] = [
        F.desc_nulls_last(primary) if primary_desc else F.asc_nulls_last(primary)
    ] + [F.asc(t) for t in tiebreaks]
    w_run = Window.partitionBy(*g, "_gbkt").orderBy(*order)
    # NULL-SAFE join back: a NULL group key is a legitimate group for
    # groupBy, but an equi-join would silently drop its rows
    off = offsets.select(
        *[F.col(c).alias(f"_o_{c}") for c in g],
        F.col("_gbkt").alias("_o_gbkt"),
        "_boff",
        "_gtot",
    )
    cond = F.col("_gbkt").eqNullSafe(F.col("_o_gbkt"))
    for c in g:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_o_{c}"))
    out = tagged.join(off, cond).withColumn(
        out_col, (F.col("_boff") + F.row_number().over(w_run)).cast("long")
    )
    keep = [*df.columns, out_col]
    if count_col is not None:
        out = out.withColumn(count_col, F.col("_gtot").cast("long"))
        keep.append(count_col)
    return out.select(*keep)


def ntile_no_global_sort(
    df: DataFrame,
    n_tiles: int,
    primary: str,
    tiebreaks: Sequence[str] = (),
    primary_desc: bool = False,
    out_col: str = "tile",
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n)`` over (primary asc|desc, *tiebreaks asc)
    without an unpartitioned window: global row numbers via
    :func:`global_row_number`, then the positional tile boundaries
    (first ``total % n`` tiles get the extra row, exactly like SQL
    ntile) assigned by comparison."""
    ranked, total = global_row_number(
        df, primary, tiebreaks, primary_desc, n_buckets, out_col="_grn"
    )
    base, rem = divmod(total, n_tiles)
    bounds: list[int] = []
    acc = 0
    for i in range(n_tiles - 1):
        acc += base + (1 if i < rem else 0)
        bounds.append(acc)
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        tile = F.lit(1) + F.size(F.filter(barr, lambda b: b < F.col("_grn")))
    else:
        tile = F.lit(1)
    return ranked.withColumn(out_col, tile.cast("int")).drop("_grn")
