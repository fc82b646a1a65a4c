"""KMV bottom-k sketches (operators/kmv.py): estimation error
envelopes, STRICT merge equality (merge of sketches == sketch of
union), exhaustive-configuration exactness for counts and
intersections, grouped sketches, and the driver gate."""

from __future__ import annotations

import numpy as np
import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import kmv as K


@pytest.fixture(scope="module")
def vals():
    return np.random.default_rng(3).integers(0, 30000, 100000)


@pytest.fixture(scope="module")
def vdf(spark, vals):
    return spark.createDataFrame(
        [(int(v),) for v in vals], "v long"
    ).repartition(8)


def _uks(df):
    return [r["uk"] for r in df.collect()]


@pytest.mark.parametrize("k", [256, 1024])
def test_distinct_estimate_error(spark, vdf, vals, k):
    true_d = len(set(vals.tolist()))
    est = K.kmv_estimate(_uks(K.kmv_sketch(vdf, "v", k)), k)
    assert abs(est - true_d) / true_d < 10 / np.sqrt(k)


def test_exhaustive_is_exact(spark, vdf, vals):
    true_d = len(set(vals.tolist()))
    sk = _uks(K.kmv_sketch(vdf, "v", 10**6))
    assert K.kmv_estimate(sk, 10**6) == true_d == len(sk)


def test_strict_merge_equality(spark, vals):
    a = spark.createDataFrame(
        [(int(v),) for v in vals[:50000]], "v long"
    ).repartition(4)
    b = spark.createDataFrame(
        [(int(v),) for v in vals[50000:]], "v long"
    ).repartition(4)
    u = spark.createDataFrame([(int(v),) for v in vals], "v long").repartition(8)
    k = 512
    merged = sorted(
        _uks(K.kmv_merge(K.kmv_sketch(a, "v", k), K.kmv_sketch(b, "v", k), k))
    )
    direct = sorted(_uks(K.kmv_sketch(u, "v", k)))
    assert merged == direct  # exact, not approximate


def test_intersection_estimate_and_exhaustive(spark):
    rng = np.random.default_rng(7)
    xs = set(rng.integers(0, 100000, 40000).tolist())
    ys = set(rng.integers(50000, 150000, 40000).tolist())
    true_i = len(xs & ys)
    dfa = spark.createDataFrame([(int(v),) for v in xs], "v long")
    dfb = spark.createDataFrame([(int(v),) for v in ys], "v long")
    k = 2048
    ua, ub = _uks(K.kmv_sketch(dfa, "v", k)), _uks(K.kmv_sketch(dfb, "v", k))
    assert abs(K.kmv_intersection(ua, ub, k) - true_i) / true_i < 0.2
    ua = _uks(K.kmv_sketch(dfa, "v", 10**6))
    ub = _uks(K.kmv_sketch(dfb, "v", 10**6))
    assert K.kmv_intersection(ua, ub, 10**6) == true_i


def test_intersection_mixed_fullness(spark):
    # A full at k, B un-full (holds everything): θ must come from A
    big = spark.createDataFrame([(i,) for i in range(5000)], "v long")
    tiny = spark.createDataFrame([(i,) for i in range(100)], "v long")
    k = 256
    ua = _uks(K.kmv_sketch(big, "v", k))
    ub = _uks(K.kmv_sketch(tiny, "v", k))  # 100 < k → un-full
    est = K.kmv_intersection(ua, ub, k)
    assert abs(est - 100) / 100 < 0.6  # small-overlap envelope at k=256


def test_grouped_exhaustive_exact(spark, vals):
    import collections

    rows = [("a", int(v)) for v in vals[:60000]] + [
        ("b", int(v)) for v in vals[60000:]
    ]
    gdf = spark.createDataFrame(rows, "g string, v long").repartition(8)
    cnt = collections.Counter(
        r["g"] for r in K.kmv_sketch_grouped(gdf, "g", "v", 10**6).collect()
    )
    assert cnt["a"] == len(set(vals[:60000].tolist()))
    assert cnt["b"] == len(set(vals[60000:].tolist()))


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "v long")
    assert len(_uks(K.kmv_sketch(df, "v", 100))) == 2


def test_overlap_gate_passes(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.misc import kmv_overlap_gate

    rows = kmv_overlap_gate(spark, sf_dir).collect()
    assert rows and all(r["passed"] for r in rows)
