"""Approximate-path recall gates: the LSH strategies are rows-only for
the driver's oracle (not SQL-expressible), so these assertions are their
pass/fail check — recall vs the exact ground truth must hold ≥ 0.9."""

from __future__ import annotations

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.documents import (
    minhash_recall,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.vectors import (
    embedding_lsh_recall,
)


def test_minhash_lsh_recall_gate(spark, sf_dir):
    row = minhash_recall(spark, sf_dir).collect()[0]
    assert row["n_exact"] > 0, "fixture has no high-jaccard pairs to measure"
    assert row["passed"], f"minhash recall {row['recall']} < 0.9"


def test_embedding_lsh_recall_gate(spark, sf_dir):
    row = embedding_lsh_recall(spark, sf_dir).collect()[0]
    assert row["n_exact"] > 0, "fixture has no near-dup cosine pairs to measure"
    assert row["passed"], f"brp-lsh recall {row['recall']} < 0.9"
