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


def test_knn_ivf_recall_gate(spark, sf_dir):
    """IVF gate at the tightened bar: pass flag requires ≥ 0.7, and the
    measured value itself must clear it (0.88 at sf0.001/sf0.01 with
    nprobe=6 of 8) so a recall collapse fails here, not just in the
    driver artifact."""
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import (
        knn_ivf_recall,
    )

    row = knn_ivf_recall(spark, sf_dir).collect()[0]
    assert row["n_queries"] == 5
    assert row["mean_recall"] >= 0.7, f"ivf recall {row['mean_recall']} < 0.7"
    assert row["passed"]
