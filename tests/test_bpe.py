"""Distributed BPE training: exact agreement with the pure-Python
reference, classic-corpus merge order, non-overlapping merge semantics,
and the registered gate query."""

from __future__ import annotations

import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import bpe as B


@pytest.fixture()
def toy_wc(spark):
    rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    return spark.createDataFrame(rows, "word string, n long"), dict(rows)


def test_classic_corpus_merge_order(toy_wc):
    wc, counts = toy_wc
    merges = B.bpe_train(wc, n_merges=10)
    assert merges == B.bpe_reference(counts, n_merges=10)
    # the Sennrich running example: 'es' then 'est' lead
    assert merges[0][:2] == ("e", "s")
    assert merges[1][:2] == ("es", "t")
    assert merges[0][2] == 9  # newest(6) + widest(3)


def test_segment_applies_learned_merges(toy_wc):
    wc, _ = toy_wc
    merges = B.bpe_train(wc, n_merges=10)
    seg = {r["word"]: r["syms"] for r in B.bpe_segment(wc, merges).collect()}
    assert seg["low"] == ["low</w>"]
    assert seg["lower"] == ["low", "e", "r", "</w>"]
    assert seg["newest"] == ["newest</w>"]


def test_nonoverlapping_merge(spark):
    """'aaaa' with pair (a,a) must become [aa, aa, </w>] — leftmost
    non-overlapping, never a cascading re-merge within one round."""
    wc = spark.createDataFrame([("aaaa", 3)], "word string, n long")
    merges = B.bpe_train(wc, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    seg = B.bpe_segment(wc, merges[:1]).first()["syms"]
    assert seg == ["aa", "aa", "</w>"]
    assert merges == B.bpe_reference({"aaaa": 3}, n_merges=1)


def test_stops_when_no_repeated_pair(spark):
    wc = spark.createDataFrame([("ab", 1), ("cd", 1)], "word string, n long")
    assert B.bpe_train(wc, n_merges=5) == []


def test_gate_query(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import bpe_train_gate

    row = bpe_train_gate(spark, sf_dir).first()
    assert row["passed"], row
    assert row["n_merges"] == row["n_match"] == row["n_ref"] > 0
