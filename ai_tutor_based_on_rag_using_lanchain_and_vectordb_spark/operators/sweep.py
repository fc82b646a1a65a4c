"""Sweep-rank counting: for every probe row, the number of values from
another column that are ≤ (or <) the probe's key — WITHOUT enumerating
(probe, value) pairs.

Why it exists: round 10's 100× distinct-content probe caught the
interval-overlap COUNT query growing 566× — the grid pair-join
(operators/intervaljoin.py) is the right tool when the PAIRS are the
answer, but a pure overlap COUNT touches Θ(density²) candidate pairs
for an answer of linear size. The sweep identity

    #overlaps(a) = #(starts ≤ a.end) − #(ends < a.start)

(valid because ``end < a.start`` implies ``start ≤ a.end``, so the two
subtracted sets partition the non-overlaps) needs only order
statistics, and those are computable with the repo's two-phase
bucketed-rank pattern (operators/ranks.py): quantile cut points, per-
bucket partial counts, cumulative offsets over the TINY partial table,
and one balanced per-bucket merge window. Total cost O(n log n) — the
566× collapses to ~K (re-measured in BENCH_SF10 after the rewrite).

Exactness: keys are compared as their native integer/long values
(callers pass ``unix_micros`` for timestamps — a double cast could
collapse adjacent microseconds and flip a strict boundary); the
quantile cuts only BALANCE buckets, they never decide a comparison.
Tie semantics are encoded in the merge order: values sort before
equal-keyed probes for ≤, after them for < — so the running count a
probe row sees is exactly its answer regardless of how the window
breaks ties among identical (key, side) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import default_parallelism

__all__ = ["count_le_values", "interval_overlap_counts"]


def count_le_values(
    probes: DataFrame,
    probe_key: Column,
    values: DataFrame,
    value_key: Column,
    out_col: str,
    strict: bool = False,
    n_buckets: int | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """``probes`` + ``out_col`` = count of ``values`` rows whose key is
    ≤ the probe's key (``strict=True``: strictly <). Keys must be
    integral (long-comparable); NULL-keyed values are outside the
    domain, NULL-keyed probes count 0.

    Physical plan: union(values-as-counters, probes), value-derived
    quantile buckets (one bounded driver collect of the cuts), per-
    bucket counter partials + cumulative offsets over the ≤ n_buckets
    partial rows, then ONE window per balanced bucket whose running
    counter sum is the probe's in-bucket rank. No pair ever
    materializes; no global sort; no single-task exchange."""
    n_buckets = n_buckets or 4 * default_parallelism()

    v = values.select(
        value_key.cast("long").alias("_sk"), F.lit(1).alias("_cnt")
    ).where(F.col("_sk").isNotNull())
    p = probes.withColumn("_sk", probe_key.cast("long")).withColumn(
        "_cnt", F.lit(0)
    )
    u = v.unionByName(p, allowMissingColumns=True)

    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = u.select(
        F.percentile_approx(F.col("_sk").cast("double"), probs, accuracy).alias("c")
    ).first()
    raw_cuts = (cuts_row["c"] if cuts_row else None) or []
    cuts = sorted({float(c) for c in raw_cuts if c is not None})
    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(cut_arr, lambda c: c < F.col("_sk").cast("double")))
    else:
        bucket = F.lit(0)
    u = u.withColumn("_bkt", F.when(F.col("_sk").isNull(), F.lit(-1)).otherwise(bucket))

    partials = u.groupBy("_bkt").agg(F.sum("_cnt").alias("_bsum"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    # the window input is the partial table: ≤ n_buckets + 1 rows
    offsets = partials.select(
        "_bkt", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_boff")
    )

    # merge order inside a bucket: key asc, then counters before probes
    # for ≤ (a probe at key k must see counters AT k) and after them
    # for < (it must not). Ties among same-(key, side) rows cannot
    # change the counter sum a probe row sees.
    side = F.col("_cnt") if strict else (F.lit(1) - F.col("_cnt"))
    w_run = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_sk").asc(), side.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = u.withColumn("_rsum", F.sum("_cnt").over(w_run))
    out = (
        ranked.where(F.col("_cnt") == 0)
        .join(F.broadcast(offsets), "_bkt", "left")
        .withColumn(
            out_col,
            F.when(F.col("_sk").isNull(), F.lit(0)).otherwise(
                F.coalesce(F.col("_boff"), F.lit(0)) + F.col("_rsum")
            ).cast("long"),
        )
        .drop("_sk", "_cnt", "_bkt", "_rsum", "_boff")
    )
    return out


def interval_overlap_counts(
    df: DataFrame,
    start_key: Column,
    end_key: Column,
    out_col: str = "n_overlaps",
    n_buckets: int | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """``df`` + ``out_col`` = for each interval row, the number of rows
    of ``df`` (INCLUDING itself) whose closed interval [start, end]
    overlaps it — both sweeps of the identity

        #overlaps(a) = #(starts ≤ a.end) − #(ends < a.start)

    fused into ONE union + ONE cut-point preflight + ONE per-bucket
    window (the two-call :func:`count_le_values` form costs twice the
    job overhead; on short queries scheduling dominates). Keys must be
    integral; rows must be unique across ``df.columns`` (interval
    tables keyed by owner/start are). NULL keys are outside the domain.

    Union rows, merged in one (key, side-rank) order:
    - counters: every start (c_start=1, rank 0 — before equal-key ≤
      probes) and every end (c_end=1, rank 3 — after equal-key <
      probes);
    - probes: one ≤-probe at a.end reading the running start count
      (rank 2, after equal starts), one <-probe at a.start reading the
      running end count (rank 1, before equal ends).
    A groupBy over the original columns (unique by contract) stitches
    each row's two probe readings back together — no self-join, no
    synthetic row id."""
    n_buckets = n_buckets or 4 * default_parallelism()
    cols = list(df.columns)

    base = df.withColumn("_ks", start_key.cast("long")).withColumn(
        "_ke", end_key.cast("long")
    )
    nulls = [F.lit(None).alias(c) for c in cols]
    starts = base.select(
        F.col("_ks").alias("_sk"), F.lit(0).alias("_rank"),
        F.lit(1).alias("_cs"), F.lit(0).alias("_ce"), *nulls,
    ).where(F.col("_sk").isNotNull())
    ends = base.select(
        F.col("_ke").alias("_sk"), F.lit(3).alias("_rank"),
        F.lit(0).alias("_cs"), F.lit(1).alias("_ce"), *nulls,
    ).where(F.col("_sk").isNotNull())
    probe_le = base.select(
        F.col("_ke").alias("_sk"), F.lit(2).alias("_rank"),
        F.lit(0).alias("_cs"), F.lit(0).alias("_ce"), *cols,
    )
    probe_lt = base.select(
        F.col("_ks").alias("_sk"), F.lit(1).alias("_rank"),
        F.lit(0).alias("_cs"), F.lit(0).alias("_ce"), *cols,
    )
    u = starts.unionByName(ends).unionByName(probe_le).unionByName(probe_lt)

    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = u.select(
        F.percentile_approx(F.col("_sk").cast("double"), probs, accuracy).alias("c")
    ).first()
    raw_cuts = (cuts_row["c"] if cuts_row else None) or []
    cuts = sorted({float(c) for c in raw_cuts if c is not None})
    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(cut_arr, lambda c: c < F.col("_sk").cast("double")))
    else:
        bucket = F.lit(0)
    u = u.withColumn("_bkt", F.when(F.col("_sk").isNull(), F.lit(-1)).otherwise(bucket))

    partials = u.groupBy("_bkt").agg(
        F.sum("_cs").alias("_bs"), F.sum("_ce").alias("_be")
    )
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "_bkt",
        F.coalesce(F.sum("_bs").over(w_off), F.lit(0)).alias("_offs"),
        F.coalesce(F.sum("_be").over(w_off), F.lit(0)).alias("_offe"),
    )
    w_run = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_sk").asc(), F.col("_rank").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = u.withColumn("_rs", F.sum("_cs").over(w_run)).withColumn(
        "_re", F.sum("_ce").over(w_run)
    )
    probes = ranked.where(F.col("_rank").isin(1, 2)).join(
        F.broadcast(offsets), "_bkt", "left"
    )
    n_le = F.max(
        F.when(F.col("_rank") == 2,
               F.coalesce(F.col("_offs"), F.lit(0)) + F.col("_rs"))
    )
    n_lt = F.max(
        F.when(F.col("_rank") == 1,
               F.coalesce(F.col("_offe"), F.lit(0)) + F.col("_re"))
    )
    return probes.groupBy(*cols).agg(
        (n_le - n_lt).cast("long").alias(out_col)
    )
