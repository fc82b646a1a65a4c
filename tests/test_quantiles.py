"""Exact distributed quantiles (operators/quantiles.py): value-exact
vs a local sorted-multiset reference on adversarial distributions,
bounded-bracket refinement rounds, and the degenerate single/duplicate
cases that defeat naive pivoting."""

from __future__ import annotations

import numpy as np
import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.quantiles import (
    _near_rank_pivots,
    _thin,
    exact_quantiles,
    exact_quantiles_df,
)

PROBS = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10), ("p99", 99, 100)]


def _ref(xs, num, den):
    xs = sorted(xs)
    n = len(xs)
    k = max(1, (num * n + den - 1) // den)
    return xs[k - 1], k


def _check(spark, xs, **kw):
    df = spark.createDataFrame([(float(v),) for v in xs], "v double").repartition(8)
    got = exact_quantiles(df, "v", PROBS, sample_target=200, **kw)
    for lbl, num, den, k, val in got:
        want, wk = _ref(xs, num, den)
        assert (k, val) == (wk, want), (lbl, val, want)


@pytest.mark.parametrize(
    "dist",
    ["uniform", "lognorm", "heavy_dup", "single", "two_vals", "ints"],
)
def test_matches_sorted_multiset(spark, dist):
    rng = np.random.default_rng(11)
    xs = {
        "uniform": lambda: rng.uniform(0, 1e6, 20000),
        "lognorm": lambda: rng.lognormal(3, 2, 20000),
        "heavy_dup": lambda: np.repeat([1.0, 2.0, 3.0], [16000, 3500, 500]),
        "single": lambda: np.full(5000, 42.0),
        "two_vals": lambda: np.r_[np.full(9000, 5.0), np.full(9000, 9.0)],
        "ints": lambda: rng.integers(0, 50, 20000).astype(float),
    }[dist]()
    _check(spark, xs)


def test_forced_refinement_rounds(spark):
    """max_bracket far below n forces the in-bracket re-pivot loop
    (incl. the strict-count resolution for duplicate-heavy brackets)."""
    rng = np.random.default_rng(3)
    xs = np.r_[rng.uniform(0, 100, 15000), np.full(5000, 50.0)]
    _check(spark, xs, max_bracket=400)


def test_nulls_excluded_and_empty(spark):
    df = spark.createDataFrame([(None,), (1.0,), (2.0,), (3.0,)], "v double")
    got = exact_quantiles(df, "v", [("p50", 1, 2)])
    assert got[0][3:] == (2, 2.0)
    got = exact_quantiles(df.where("v > 99"), "v", [("p50", 1, 2)])
    assert got[0][4] is None


def test_df_wrapper_schema(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = exact_quantiles_df(spark, df, "v", [("p50", 1, 2)])
    rows = out.collect()
    assert [f.name for f in out.schema.fields] == ["pct", "k", "value"]
    assert rows[0]["pct"] == "p50" and rows[0]["k"] == 50 and rows[0]["value"] == 49.0


def test_pivot_sets_stay_narrow():
    """Every pivot becomes an aggregate expression — the count pass must
    stay a few dozen columns wide no matter the sample size."""
    sample = sorted(np.random.default_rng(0).uniform(0, 1, 20000).tolist())
    ks = [1, 5000, 10000, 18000, 19999]
    pivots = _near_rank_pivots(sample, ks, 20000)
    assert len(pivots) <= 17 * len(ks) + 2
    assert _thin(list(range(10000)), 128)[-1] == 9999
    assert len(_thin(list(range(10000)), 128)) <= 129


# -------------------------------------------------------------- grouped


def test_group_quantiles_match_reference(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    rng = np.random.default_rng(5)
    data = {
        "en": sorted(rng.lognormal(3, 1.5, 8000).tolist()),
        "de": sorted(rng.uniform(0, 100, 2000).tolist()),
        "fr": sorted(rng.uniform(0, 9, 77).tolist()),
        "zh": [42.0],
        "dup": sorted([7.0] * 1500 + [9.0] * 50),  # strict-count path
    }
    rows = [(g, float(v)) for g, xs in data.items() for v in xs]
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    probs = [("p50", 1, 2), ("p90", 9, 10)]
    for mb in (2_000_000, 300):  # default + forced refinement rounds
        got = exact_group_quantiles(
            df, "g", "v", probs, sample_target=100, max_bracket=mb
        )
        assert len(got) == len(data) * len(probs)
        for g, lbl, k, val in got:
            num, den = {"p50": (1, 2), "p90": (9, 10)}[lbl]
            xs = data[g]
            wk = max(1, (num * len(xs) + den - 1) // den)
            assert (k, val) == (wk, xs[wk - 1]), (g, lbl, mb)


def test_group_quantiles_null_group_and_value_excluded(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), (None, 9.0)],
        "g string, v double",
    )
    assert exact_group_quantiles(df, "g", "v", [("p50", 1, 2)]) == [
        ("a", "p50", 1, 1.0)
    ]


def test_open_ended_bracket_resolves(spark):
    """A sparse pivot sample that misses the upper tail leaves the top
    rank's bracket open-ended (hi=None); strict-count resolution must
    NOT fire on it (it would 'resolve' to None) — re-pivoting inside
    (lo, +inf) has to find the true maximum."""
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.quantiles import (
        exact_quantiles,
    )

    rng = np.random.default_rng(2)
    for shift in range(4):  # vary values → vary which ones hash-sample
        xs = np.r_[
            rng.uniform(0, 100, 20000), rng.uniform(900, 1000, 300)
        ] + 10000 * shift
        df = spark.createDataFrame([(float(v),) for v in xs], "v double")
        got = exact_quantiles(
            df, "v", [("p100", 1, 1), ("p999", 999, 1000)],
            sample_target=10, max_bracket=50,
        )
        srt = sorted(xs)
        for lbl, num, den, k, val in got:
            wk = max(1, (num * len(xs) + den - 1) // den)
            assert (k, val) == (wk, srt[wk - 1]), (shift, lbl)


# ------------------------------------------------- MAD robust outliers


def test_mad_outliers_flags_the_tail(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.tpch_extra import mad_outliers

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 100.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    got = mad_outliers(df, "event_id", "value", k=3.0).collect()
    # median = 10.0, |dev| = [0,1,1,.5,.5,0,90], MAD = .5 → only 100.0
    assert [(r["event_id"], r["value"]) for r in got] == [(6, 100.0)]
    assert got[0]["robust_z"] == 180.0


def test_mad_outliers_degenerate_mad_zero(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.tpch_extra import mad_outliers

    # >half identical → MAD = 0: every deviating row flagged, score null
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(5)] + [(9, 7.0)], "event_id long, value double"
    )
    got = mad_outliers(df, "event_id", "value", k=3.0).collect()
    assert [(r["event_id"], r["robust_z"]) for r in got] == [(9, None)]
