"""Count-Min sketch (operators/cms.py): never-undercount guarantee,
error envelope, merge ≡ one-shot build, bounded state, null domain."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)

W, D = 256, 4


def _skewed(spark):
    # one hot key (500), one warm (100), long tail of singletons
    return (
        spark.range(500).select(F.lit(7).alias("k"))
        .union(spark.range(100).select(F.lit(9).alias("k")))
        .union(spark.range(400).select((F.col("id") + 1000).alias("k")))
        .repartition(8)
    )


def test_never_undercounts_and_error_envelope(spark):
    df = _skewed(spark)
    sk = cms_build(df, "k", W, D)
    exact = {r.k: r.cnt for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    keys = df.select("k").distinct()
    est = {r.k: r.est for r in cms_estimate(sk, keys, "k", W, D).collect()}
    n = sum(exact.values())
    bound = math.e / W * n  # CMS envelope at the 1 − e^-D percentile
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k], (k, e, exact[k])  # NEVER undercounts
        assert e <= exact[k] + bound + 1

    # state bounded by construction
    assert sk.count() <= W * D
    assert sk.agg(F.sum("cnt")).first()[0] == n * D


def test_merge_equals_one_shot(spark):
    df = _skewed(spark)
    a = df.where(F.col("k") % 2 == 0)
    b = df.where(F.col("k") % 2 != 0)
    merged = cms_merge(cms_build(a, "k", W, D), cms_build(b, "k", W, D))
    whole = cms_build(df, "k", W, D)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_null_and_missing_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (None,)], "k int"
    )
    sk = cms_build(df, "k", W, D)
    # null rows don't enter counters
    assert sk.agg(F.sum("cnt")).first()[0] == 2 * D
    # a key the sketch never saw CAN still collide; on a near-empty
    # sketch its buckets are absent → estimate 0
    probe = spark.createDataFrame([(123456789,), (None,)], "k int")
    est = {r.k: r.est for r in cms_estimate(sk, probe, "k", W, D).collect()}
    assert est == {123456789: 0}  # null filtered from the probe too


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        cms_build(df, "k", width=0)
    with pytest.raises(ValueError):
        cms_build(df, "k", depth=0)
    with pytest.raises(ValueError, match="at least one sketch"):
        cms_merge()
