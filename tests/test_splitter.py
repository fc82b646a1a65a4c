"""Property tests for the recursive character splitter (SURVEY.md §5.3
invariants; spec in operators/splitter.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.splitter import (
    split_documents,
    split_text,
)

CASES = [
    "",
    "short",
    "x" * 1000,
    "x" * 1001,
    "para one.\n\npara two is a bit longer.\n\n" + "word " * 400,
    "\n".join("line %d content" % i for i in range(200)),
    "nosep" * 500,  # separator-free: forces the ""-fallback
    "a b " * 600,
    "\n\n\n\nleading seps",
    "unicode ünïcode 中文 " * 100,
]


def _check_invariants(text: str, chunks, size=1000, overlap=200):
    if not text:
        assert chunks == []
        return
    # every chunk is a real substring with its offsets
    for c, s, e in chunks:
        assert text[s:e] == c
        assert 0 < e - s <= size, f"chunk size {e - s} out of (0, {size}]"
    # full coverage, ordered, bounded overlap
    assert chunks[0][1] == 0
    assert chunks[-1][2] == len(text)
    for (c1, s1, e1), (c2, s2, e2) in zip(chunks, chunks[1:]):
        assert s2 > s1 and e2 > e1, "chunks must advance"
        assert s2 <= e1, f"gap between chunks: {e1}..{s2}"
        assert e1 - s2 <= overlap, f"overlap {e1 - s2} > {overlap}"


@pytest.mark.parametrize("text", CASES)
def test_invariants_default(text):
    _check_invariants(text, split_text(text))


@pytest.mark.parametrize("size,overlap", [(100, 20), (50, 0), (1000, 200), (30, 10)])
def test_invariants_sizes(size, overlap):
    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta\n", "eps\n\n", "x" * 80]
    for _ in range(25):
        text = " ".join(rng.choice(words) for _ in range(rng.randrange(0, 300)))
        _check_invariants(text, split_text(text, size, overlap), size, overlap)


def test_short_text_single_chunk():
    assert split_text("hello world") == [("hello world", 0, 11)]


def test_spark_split_documents(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = split_documents(docs, text_col="text", id_col="doc_id", size=120, overlap=24)
    pdf = chunks.toPandas()
    assert len(pdf) > len(docs.toPandas())  # multi-chunk docs exist
    # ordinals: chunk_index is 0..total_chunks-1 per doc
    for doc_id, g in pdf.groupby("doc_id"):
        n = g["total_chunks"].iloc[0]
        assert sorted(g["chunk_index"]) == list(range(n))
        assert (g["total_chunks"] == n).all()
    assert (pdf["page_content"].str.len() <= 120).all()
    # spot-check offsets against the pure-python core
    docs_pd = docs.select("doc_id", "text").toPandas().set_index("doc_id")
    some = pdf[pdf["doc_id"].isin(list(docs_pd.index[:20]))]
    for _, r in some.iterrows():
        text = docs_pd.loc[r["doc_id"], "text"]
        assert text[r["char_start"]: r["char_end"]] == r["page_content"]


def test_splitter_invariants_gate_passes(spark, sf_dir):
    """The registered splitter_invariants self-check query must report
    zero violations over the fixture corpus."""
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import (
        splitter_invariants,
    )

    row = splitter_invariants(spark, sf_dir).first()
    assert row["passed"] is True, row.asDict()
    assert row["n_chunks"] > 0


def test_curation_pipeline_gate_all_green(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import (
        curation_pipeline_gate,
    )

    rows = curation_pipeline_gate(spark, "/root/testdata/sf0.001").collect()
    assert {r["check"] for r in rows} == {
        "unique_norm_hash", "one_survivor_per_cluster",
        "quality_floor", "scrub_length_conserved",
        "packing_offsets_consistent",
    }
    for r in rows:
        assert r["passed"], (r["check"], r["observed"], r["expected"])
