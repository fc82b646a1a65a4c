"""Pseudo-relevance-feedback BM25 (operators/bm25.bm25_prf_search).
Oracle parity runs via the registry sweep; here: the recall property
(expansion retrieves docs sharing NO original query term), expansion
selection determinism, and the weight ordering."""

from __future__ import annotations

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.bm25 import (
    bm25_prf_search,
    bm25_search,
)


def _docs(spark):
    rows = [
        (1, "alpha beta beta gamma"),     # matches the query directly
        (2, "beta beta beta delta"),      # no query term: only PRF finds it
        (3, "delta epsilon zeta eta"),    # unrelated
        (4, "alpha theta iota kappa"),    # direct match, other terms
        (5, "beta gamma gamma gamma"),    # expansion-reachable
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_expansion_recalls_term_disjoint_docs(spark):
    docs = _docs(spark)
    queries = [("q", "alpha")]
    base = {r.doc_id for r in bm25_search(spark, docs, queries, k=5).collect()}
    assert 2 not in base  # shares no term with the query
    prf = {
        r.doc_id
        for r in bm25_prf_search(
            spark, docs, queries, k=5, fb_docs=2, fb_terms=2, fb_weight=0.4
        ).collect()
    }
    # feedback docs are 1 and 4 (the alpha docs); 'beta' (tf 2 in doc 1)
    # is a top expansion term, which pulls in docs 2 and 5
    assert 2 in prf and 5 in prf
    # and direct matches never drop out of the candidate set
    assert {1, 4} <= prf


def test_original_terms_outweigh_expansion(spark):
    docs = _docs(spark)
    out = bm25_prf_search(
        spark, _docs(spark), [("q", "alpha")], k=5,
        fb_docs=2, fb_terms=2, fb_weight=0.4,
    ).collect()
    rank = {r.doc_id: r.rank for r in out}
    # doc 1 matches alpha AND the expansion terms: rank 1; the
    # expansion-only docs rank below at least one direct match
    assert rank[1] == 1
    assert rank[2] > min(rank[1], rank[4])


def test_zero_feedback_weight_reduces_to_base_ranking(spark):
    docs = _docs(spark)
    queries = [("q", "alpha gamma")]
    base = sorted(
        (r.query_id, r.doc_id, r.rank)
        for r in bm25_search(spark, docs, queries, k=3).collect()
    )
    prf0 = sorted(
        (r.query_id, r.doc_id, r.rank)
        for r in bm25_prf_search(
            spark, docs, queries, k=3, fb_docs=2, fb_terms=2, fb_weight=0.0
        ).collect()
    )
    # weight 0: expansion contributes exactly 0 to every score, so the
    # top-k ORDER matches the base ranking (scores of docs matched only
    # by expansion terms are 0.0 and sort below any positive score)
    assert [x[1] for x in prf0 if x[2] <= len(base)][: len(base)] == [
        x[1] for x in base
    ]
