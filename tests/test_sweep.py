"""Sweep-rank counting (operators/sweep.py): brute-force parity
including tie boundaries, null domains, and the session-overlap
rewrite's equivalence with the grid pair-join it replaced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.sweep import (
    count_le_values,
)

VALUES = [3, 7, 7, 7, 10, 15, 15, 22, None]
PROBES = [1, 3, 7, 8, 15, 14, 22, 23, None, 7]


@pytest.fixture(scope="module")
def frames(spark):
    v = spark.createDataFrame([(x,) for x in VALUES], "k long")
    p = spark.createDataFrame(
        [(i, x) for i, x in enumerate(PROBES)], "pid long, key long"
    )
    return v, p


@pytest.mark.parametrize("strict", [False, True])
def test_brute_force_parity_with_ties(spark, frames, strict):
    v, p = frames
    out = count_le_values(
        p, F.col("key"), v, F.col("k"), "n", strict=strict
    ).collect()
    vals = [x for x in VALUES if x is not None]
    for r in out:
        if r.key is None:
            assert r.n == 0
            continue
        want = sum(1 for x in vals if (x < r.key if strict else x <= r.key))
        assert r.n == want, (r.pid, r.key, strict, r.n, want)
    assert len(out) == len(PROBES)


def test_probe_columns_survive(spark, frames):
    v, p = frames
    out = count_le_values(p, F.col("key"), v, F.col("k"), "n")
    assert set(out.columns) == {"pid", "key", "n"}


def test_many_buckets_exact(spark):
    # forces real bucketing: 5000 probes over 5000 values, tiny buckets
    v = spark.range(0, 5000).select((F.col("id") * 3).alias("k"))
    p = spark.range(0, 5000).select(
        F.col("id").alias("pid"), (F.col("id") * 3 + 1).alias("key")
    )
    out = count_le_values(p, F.col("key"), v, F.col("k"), "n", n_buckets=64)
    # values are 0,3,6..; key=3i+1 → exactly i+1 values ≤ it
    bad = out.where(F.col("n") != F.col("pid") + 1).count()
    assert bad == 0


def test_plan_has_no_single_partition_data_exchange(spark):
    v = spark.range(0, 2000).select(F.col("id").alias("k"))
    p = spark.range(0, 2000).select(F.col("id").alias("pid"), F.col("id").alias("key"))
    df = count_le_values(p, F.col("key"), v, F.col("k"), "n", n_buckets=32)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition window is over the <= n_buckets partial
    # table; the data path must stay bucket-partitioned
    assert plan.count("SinglePartition") <= 1


def test_interval_overlap_counts_brute_force(spark):
    import random

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.sweep import (
        interval_overlap_counts,
    )

    rng = random.Random(3)
    rows = []
    for i in range(300):
        s = rng.randrange(0, 1000)
        rows.append((i, s, s + rng.randrange(0, 80)))
    df = spark.createDataFrame(rows, "rid long, s long, e long")
    got = {
        r.rid: r.n
        for r in interval_overlap_counts(
            df, F.col("s"), F.col("e"), out_col="n", n_buckets=16
        ).collect()
    }
    for rid, s, e in rows:
        want = sum(1 for _, bs, be in rows if bs <= e and be >= s)
        assert got[rid] == want, (rid, got[rid], want)


def test_interval_overlap_counts_degenerate_density(spark):
    # the adversarial shape that kills pair-based plans: every interval
    # identical, so the true pair multiplicity is n² — the sweep must
    # still answer (n per row) in linear work
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.sweep import (
        interval_overlap_counts,
    )

    n = 5000
    df = spark.range(0, n).select(
        F.col("id").alias("rid"), F.lit(100).alias("s"), F.lit(200).alias("e")
    )
    out = interval_overlap_counts(df, F.col("s"), F.col("e"), out_col="n")
    bad = out.where(F.col("n") != n).count()
    assert bad == 0
    assert out.count() == n


def test_session_overlap_sweep_equals_grid(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.relational import (
        session_overlap_counts,
        session_overlap_counts_grid,
    )

    sweep = {
        (r.user_id, r.session_start): r.n_concurrent
        for r in session_overlap_counts(spark, sf_dir).collect()
    }
    grid = {
        (r.user_id, r.session_start): r.n_concurrent
        for r in session_overlap_counts_grid(spark, sf_dir).collect()
    }
    assert sweep == grid
    assert sweep  # non-empty
