"""BM25 retrieval (operators/bm25.py): score-exact vs a local
reference implementation, ranking determinism, and the
query-term-filter plan shape."""

from __future__ import annotations

import math

import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.bm25 import (
    B,
    K1,
    bm25_postings,
    bm25_search,
)

DOCS = [
    (0, "spark shuffle join join join"),
    (1, "spark broadcast join"),
    (2, "filter scan scan"),
    (3, "window agg window window agg"),
    (4, "join"),
    (5, "totally unrelated words here"),
]


def _ref_bm25(query, k1=K1, b=B):
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in dict.fromkeys(query.split()):
        df = sum(1 for v in toks.values() if term in v)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                contrib = idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(v) / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + round(contrib, 6)
    return {d: round(s, 4) for d, s in scores.items()}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings(spark, docs_df):
    rows = {(r["doc_id"], r["term"]): r["tf"] for r in bm25_postings(docs_df).collect()}
    assert rows[(0, "join")] == 3 and rows[(3, "window")] == 3
    assert rows[(4, "join")] == 1 and (5, "join") not in rows


@pytest.mark.parametrize("query", ["spark join", "scan", "join window spark"])
def test_scores_match_reference(spark, docs_df, query):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_search(spark, docs_df, [("q", query)], k=10).collect()
    }
    want = _ref_bm25(query)
    assert got == pytest.approx(want)


def test_ranking_and_ties_deterministic(spark, docs_df):
    # docs 0/1 both match "spark"; equal-score ties break by doc_id
    rows = bm25_search(spark, docs_df, [("q", "spark join")], k=10).collect()
    ranks = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    want = _ref_bm25("spark join")
    assert ranks == sorted(want, key=lambda d: (-want[d], d))


def test_k_limits_and_unknown_terms(spark, docs_df):
    rows = bm25_search(spark, docs_df, [("q", "join zzz-notaterm")], k=2).collect()
    assert len(rows) == 2  # k bound holds; unknown term contributes nothing
    rows = bm25_search(spark, docs_df, [("q", "zzz-notaterm")], k=2).collect()
    assert rows == []  # no matched postings at all


def test_multiple_queries_independent(spark, docs_df):
    rows = bm25_search(
        spark, docs_df, [("a", "scan"), ("b", "window")], k=3
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert by_q["a"] == [2] and by_q["b"] == [3]


def test_plan_filters_postings_before_scoring(spark, docs_df):
    """The matched-postings semi-join on the broadcast query-term list
    must sit below the scoring joins (scoring cost O(matched), not
    O(corpus))."""
    plan = bm25_search(spark, docs_df, [("q", "spark")], k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
