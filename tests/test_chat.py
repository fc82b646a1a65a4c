"""End-to-end RAG chat dataflow (§3.1) with the deterministic LLM stub."""

from __future__ import annotations

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.text import EMOTIONS
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans import chat


def test_rag_answers_end_to_end(spark, sf_dir):
    out = chat.rag_answers(spark, sf_dir, n_questions=5).toPandas()
    assert len(out) == 5
    assert out["answer"].notna().all()
    assert out["answer"].str.startswith("Based on the course material:").all()
    assert out["emotion"].isin(EMOTIONS).all()


def test_rag_answers_deterministic(spark, sf_dir):
    a = chat.rag_answers(spark, sf_dir, n_questions=3).toPandas().sort_values("question_id")
    b = chat.rag_answers(spark, sf_dir, n_questions=3).toPandas().sort_values("question_id")
    assert a["answer"].tolist() == b["answer"].tolist()
    assert a["emotion"].tolist() == b["emotion"].tolist()


def test_chunk_index_build(spark, sf_dir):
    chunks, vectors = chat.build_chunk_index(spark, sf_dir)
    n_chunks = chunks.count()
    assert n_chunks > 0
    assert vectors.count() == n_chunks
