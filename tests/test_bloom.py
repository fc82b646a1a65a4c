"""Bloom membership sketches (operators/bloom.py): no false negatives,
bounded false positives, bit-exact mergeability, and the incremental
dedup gate's equality with the exact anti-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.bloom import (
    bloom_build,
    bloom_incremental_dedup,
    bloom_merge,
    bloom_params,
    bloom_probe,
)


def test_params_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000 and 5 <= k <= 10
    m2, _ = bloom_params(1000, 0.001)
    assert m2 > m  # tighter fpp → bigger bitmap
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        bloom_build(df, F.col("k"), m_bits=100, k_hashes=3)  # not mult of 64
    with pytest.raises(ValueError):
        bloom_build(df, F.col("k"), m_bits=64, k_hashes=0)
    with pytest.raises(ValueError, match="at least one sketch"):
        bloom_merge()


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias("k")
    )


def test_no_false_negatives(spark, keys):
    m, kh = bloom_params(2000, 0.02)
    sk = bloom_build(keys, F.col("k"), m, kh)
    probed = bloom_probe(keys, F.col("k"), sk, m, kh)
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_fpp_bounded(spark, keys):
    m, kh = bloom_params(2000, 0.02)
    sk = bloom_build(keys, F.col("k"), m, kh)
    absent = spark.range(0, 8000).select(
        F.concat(F.lit("other-"), F.col("id").cast("string")).alias("k")
    )
    fp = bloom_probe(absent, F.col("k"), sk, m, kh).where("bloom_hit").count()
    assert fp / 8000 <= 3 * 0.02


def test_merge_equals_one_shot(spark, keys):
    m, kh = bloom_params(2000, 0.02)
    whole = bloom_build(keys, F.col("k"), m, kh)
    a = keys.where(F.xxhash64("k") % 2 == 0)
    b = keys.subtract(a)
    merged = bloom_merge(
        bloom_build(a, F.col("k"), m, kh), bloom_build(b, F.col("k"), m, kh)
    )
    diff = (
        whole.unionByName(merged)
        .groupBy("word", "bits")
        .count()
        .where("count != 2")
        .count()
    )
    assert diff == 0


def test_null_keys_outside_domain(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    m, kh = 640, 4
    sk = bloom_build(df, F.col("k"), m, kh)
    # only "a"'s bits are set: k_hashes positions at most
    assert sk.agg(F.sum(F.expr("bit_count(bits)"))).first()[0] <= kh


def test_incremental_dedup_equals_exact_anti_join(spark):
    # engineered overlap: history texts h0..h499, batch reuses half
    hist = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )
    new = spark.range(1000, 1600).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("text-"), ((F.col("id") - 1000) % 1200).cast("string")
        ).alias("text"),
    )
    m, kh = bloom_params(500, 0.05)
    got = sorted(
        r.doc_id
        for r in bloom_incremental_dedup(
            new, hist, F.col("text"), F.col("text"), m, kh
        ).collect()
    )
    want = sorted(
        r.doc_id
        for r in new.join(hist.select("text"), "text", "left_anti").collect()
    )
    assert got == want
    assert 0 < len(got) < 600  # both classes present


def test_registered_queries(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import (
        bloom_fpp_gate,
        bloom_novel_docs,
    )

    assert bloom_novel_docs(spark, sf_dir).count() > 0
    gate = bloom_fpp_gate(spark, sf_dir).collect()
    assert len(gate) == 1 and gate[0].passed, gate[0]
