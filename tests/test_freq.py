"""Heavy hitters (operators/freq.py): exact equivalence with the naive
full-shuffle plan on uniform, skewed, and adversarial-below-threshold
distributions; the superset/bound invariants; parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.freq import (
    exact_heavy_hitters_naive,
    heavy_hitters,
)


def _check_equiv(df, col, phi, k=None):
    got = heavy_hitters(df, col, phi, k=k)
    want = exact_heavy_hitters_naive(df, col, phi)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    return got


def test_uniform_distribution(spark):
    # 100 keys × 10 rows: nobody above 5% — empty result, both plans
    df = spark.range(1000).select((F.col("id") % 100).alias("k"))
    got = _check_equiv(df, "k", 0.05)
    assert got.count() == 0


def test_skewed_distribution(spark):
    # one key holds 50% of rows, one 10%, rest uniform noise
    df = (
        spark.range(500).select(F.lit(7777).alias("k"))
        .union(spark.range(100).select(F.lit(8888).alias("k")))
        .union(spark.range(400).select((F.col("id") % 200).alias("k")))
        .repartition(8)  # scatter the hot key across partitions
    )
    got = _check_equiv(df, "k", 0.05)
    rows = {r.k: r.cnt for r in got.collect()}
    assert rows[7777] == 500 and rows[8888] == 100
    assert len(rows) == 2  # counts are exact, threshold strict


def test_adversarial_just_below_threshold(spark):
    # 21 keys at ~4.76% each with phi=5%: every key is near the bound,
    # none qualifies — the candidate pass may nominate them, the exact
    # recount must reject every one
    df = spark.range(21 * 48).select((F.col("id") % 21).alias("k")).repartition(8)
    got = _check_equiv(df, "k", 0.05)
    assert got.count() == 0


def test_exactly_at_threshold_excluded(spark):
    # phi=0.25 with a key at exactly 25%: strict > means excluded
    df = spark.range(100).select(
        F.when(F.col("id") < 25, 1).otherwise(F.col("id") + 100).alias("k")
    )
    got = _check_equiv(df, "k", 0.25)
    assert got.count() == 0
    got2 = _check_equiv(df, "k", 0.24)
    assert [(r.k, r.cnt) for r in got2.collect()] == [(1, 25)]


def test_string_keys(spark):
    df = spark.range(300).select(
        F.when(F.col("id") % 3 == 0, "hot").otherwise(
            F.concat(F.lit("u"), F.col("id"))
        ).alias("k")
    ).repartition(5)
    got = _check_equiv(df, "k", 0.2)
    assert [(r.k, r.cnt) for r in got.collect()] == [("hot", 100)]


def test_k_validation():
    with pytest.raises(ValueError):
        heavy_hitters(None, "k", phi=1.5)
    with pytest.raises(ValueError):
        heavy_hitters(None, "k", phi=0.01, k=10)  # k < 1/phi


def test_registered_query_matches_naive(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.misc import (
        event_heavy_hitters,
    )

    events = load_table(spark, sf_dir, "events")
    got = event_heavy_hitters(spark, sf_dir)
    want = exact_heavy_hitters_naive(events, "user_id", 0.008)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_null_keys_excluded_from_domain(spark):
    # NULL is outside the key domain (module docstring): both plans
    # filter it, the total n is the non-null row count, and a hot key's
    # qualification is judged against that filtered total.
    df = spark.range(400).select(
        F.when(F.col("id") < 120, None)                # 120 null rows
        .when(F.col("id") < 200, F.lit(1))             # 80 rows of key 1
        .otherwise(F.col("id") + 100)                  # 200 singletons
        .alias("k")
    ).repartition(6)
    got = _check_equiv(df, "k", 0.25)
    rows = [(r.k, r.cnt) for r in got.collect()]
    # 80 of 280 non-null rows = 28.6% > 25% qualifies; against the
    # unfiltered 400 it would be 20% and (wrongly) excluded
    assert rows == [(1, 80)]
    assert all(k is not None for k, _ in rows)


def test_float_nan_keys_outside_domain_on_every_path(spark):
    # NaN is not NULL in Spark, pandas value_counts drops it, and the
    # part-rows sentinel can't represent it in a float column — so the
    # operator excludes NaN from the key domain on EVERY path; the two
    # entry points must stay row-for-row comparable on NaN-heavy data
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.freq import (
        exact_heavy_hitters_naive,
        heavy_hitters,
    )

    rows = [(float("nan"),)] * 50 + [(1.0,)] * 30 + [(2.0,)] * 5 + [(None,)] * 10
    df = spark.createDataFrame(rows, "k double").repartition(5)
    got = sorted((r["k"], r["cnt"]) for r in heavy_hitters(df, "k", 0.25).collect())
    want = sorted(
        (r["k"], r["cnt"]) for r in exact_heavy_hitters_naive(df, "k", 0.25).collect()
    )
    assert got == want == [(1.0, 30)]
