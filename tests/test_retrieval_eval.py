"""Ranked-retrieval metrics (operators/retrieval_eval.py) — the
formulas on hand-computed fixtures; Q(retrieval_eval) parity runs via
the registry sweep."""

from __future__ import annotations

import math

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.retrieval_eval import (
    ranking_metrics,
)


def _dfs(spark, ranked_rows, rel_rows):
    ranked = spark.createDataFrame(
        ranked_rows, "query_id string, doc_id long, rank long"
    )
    rel = spark.createDataFrame(rel_rows, "query_id string, doc_id long")
    return ranked, rel


def test_metrics_hand_computed(spark):
    # q1: 5 ranked docs, relevant = {20 (rank 2), 50 (rank 5), 99 (not
    # retrieved)} -> hits=2 of n_rel=3
    ranked, rel = _dfs(
        spark,
        [("q1", 10, 1), ("q1", 20, 2), ("q1", 30, 3), ("q1", 40, 4),
         ("q1", 50, 5)],
        [("q1", 20), ("q1", 50), ("q1", 99)],
    )
    r = {x["query_id"]: x for x in ranking_metrics(ranked, rel, 5).collect()}
    m = r["q1"]
    assert m["n_rel"] == 3 and m["hits"] == 2
    assert abs(m["recall_at_k"] - 2 / 3) < 1e-5
    assert abs(m["precision_at_k"] - 2 / 5) < 1e-9
    assert abs(m["mrr"] - 1 / 2) < 1e-9
    dcg = 1 / math.log2(3) + 1 / math.log2(6)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(m["ndcg_at_k"] - dcg / idcg) < 1e-4


def test_no_relevant_and_no_hits_score_zero_not_null(spark):
    ranked, rel = _dfs(
        spark,
        [("q_none", 1, 1), ("q_none", 2, 2), ("q_miss", 3, 1)],
        [("q_miss", 99)],  # q_none: empty rel set; q_miss: rel not retrieved
    )
    r = {x["query_id"]: x for x in ranking_metrics(ranked, rel, 2).collect()}
    for qid in ("q_none", "q_miss"):
        m = r[qid]
        assert m["hits"] == 0
        for c in ("recall_at_k", "precision_at_k", "mrr", "ndcg_at_k"):
            assert m[c] == 0.0, (qid, c)
    assert r["q_none"]["n_rel"] == 0 and r["q_miss"]["n_rel"] == 1


def test_perfect_ranking_scores_one(spark):
    # all k slots relevant, n_rel == k -> every metric saturates
    ranked, rel = _dfs(
        spark,
        [("p", d, i + 1) for i, d in enumerate([7, 8, 9])],
        [("p", 7), ("p", 8), ("p", 9)],
    )
    m = ranking_metrics(ranked, rel, 3).collect()[0]
    assert m["recall_at_k"] == 1.0 and m["precision_at_k"] == 1.0
    assert m["mrr"] == 1.0 and m["ndcg_at_k"] == 1.0


def test_bounds_and_monotonicity(spark):
    # hits <= min(k, n_rel); metrics in [0, 1]; ndcg of a worse
    # ordering never exceeds a better one with the same hit set
    good, rel = _dfs(
        spark,
        [("g", 1, 1), ("g", 2, 2), ("g", 3, 3), ("g", 4, 4)],
        [("g", 1), ("g", 2)],
    )
    bad, _ = _dfs(
        spark,
        [("g", 3, 1), ("g", 4, 2), ("g", 1, 3), ("g", 2, 4)],
        [("g", 1)],
    )
    mg = ranking_metrics(good, rel, 4).collect()[0]
    mb = ranking_metrics(bad, rel, 4).collect()[0]
    for m in (mg, mb):
        assert m["hits"] <= min(4, m["n_rel"])
        for c in ("recall_at_k", "precision_at_k", "mrr", "ndcg_at_k"):
            assert 0.0 <= m[c] <= 1.0
    assert mb["ndcg_at_k"] < mg["ndcg_at_k"]
    assert mb["mrr"] < mg["mrr"]


def test_graded_ndcg_hand_computed(spark):
    import math

    # q1 ranked: docs 10,20,30 at ranks 1..3; graded truth: 10->1,
    # 20->3, 99->2 (99 not retrieved). k=3.
    ranked, rel = _dfs(
        spark,
        [("q1", 10, 1), ("q1", 20, 2), ("q1", 30, 3)],
        [("q1", 20)],  # binary truth independent of grades
    )
    graded = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 20, 3), ("q1", 99, 2)],
        "query_id string, doc_id long, grade long",
    )
    m = {
        x["query_id"]: x
        for x in ranking_metrics(ranked, rel, 3, graded=graded).collect()
    }["q1"]
    # DCG_g = 1/log2(2) + 3/log2(3); IDCG_g = grades sorted desc
    # (3,2,1) at positions 1..3
    dcg_g = 1 / math.log2(2) + 3 / math.log2(3)
    idcg_g = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert abs(m["ndcg_graded_at_k"] - dcg_g / idcg_g) < 1e-4
    # binary columns unchanged by the graded extension
    assert m["n_rel"] == 1 and m["hits"] == 1
    # a query with no graded rows scores 0, not NULL
    ranked2, rel2 = _dfs(spark, [("q2", 10, 1)], [("q2", 10)])
    m2 = {
        x["query_id"]: x
        for x in ranking_metrics(ranked2, rel2, 3, graded=graded).collect()
    }["q2"]
    assert m2["ndcg_graded_at_k"] == 0.0
