"""MMR re-ranking (operators/mmr.py + plans/vectors.knn_mmr_rerank).

Oracle parity runs via tests/test_oracle_parity.py's registry sweep;
here are the semantic properties: the diversity guarantee, the λ
degenerations, and pool-edge behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.mmr import (
    SIM_SCALE,
    mmr_rerank,
)

DIM = 64


def _vec(*head):
    v = list(head) + [0.0] * (DIM - len(head))
    return [float(x) for x in v]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


@pytest.fixture()
def corpus(spark):
    # query 0 points at e1; candidates: a near-duplicate PAIR (10, 11)
    # maximally relevant, a moderately relevant distinct doc (12), and
    # a weakly relevant orthogonal doc (13)
    return _df(
        spark,
        [
            (0, _vec(1.0)),                 # the query vector
            (10, _vec(0.95, 0.30)),         # relevant
            (11, _vec(0.95, 0.31)),         # near-dup of 10, relevant
            (12, _vec(0.60, -0.80)),        # distinct, mid relevance
            (13, _vec(0.10, 0.0, 0.99)),    # distinct, low relevance
        ],
    )


def _ranked(df):
    return [
        r.neighbor_id
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_mmr_demotes_the_near_duplicate(spark, corpus):
    qs = corpus.where("vec_id = 0")
    out = mmr_rerank(corpus, qs, k=3, fetch_c=4, lam_permille=500)
    picked = _ranked(out)
    # rank 1 = pure relevance (10 and 11 tie in direction; 10 wins by
    # id on the quantized grid or outranks outright); rank 2 must NOT
    # be the near-duplicate — diversity demotes it below 12 and 13
    assert picked[0] in (10, 11)
    dup = 11 if picked[0] == 10 else 10
    assert picked[1] != dup
    assert picked[1] == 12  # best relevance among the diverse rest
    # redundancy guarantee: no two SELECTED items are near-identical
    # when distinct candidates were still available
    assert set(picked[:3]) != {10, 11, 12} or picked.index(dup) > 2


def test_lambda_1000_degenerates_to_pure_topk(spark, corpus):
    qs = corpus.where("vec_id = 0")
    out = mmr_rerank(corpus, qs, k=4, fetch_c=4, lam_permille=1000)
    # λ=1: the redundancy term vanishes; order == relevance order
    rel = (
        mmr_rerank(corpus, qs, k=4, fetch_c=4, lam_permille=1000)
        .orderBy("rank")
        .select("relevance")
        .collect()
    )
    vals = [r.relevance for r in rel]
    assert vals == sorted(vals, reverse=True)
    assert len(_ranked(out)) == 4


def test_lambda_0_maximizes_diversity(spark, corpus):
    qs = corpus.where("vec_id = 0")
    out = mmr_rerank(corpus, qs, k=3, fetch_c=4, lam_permille=0)
    picked = _ranked(out)
    # after the relevance-seeded first pick, λ=0 picks the candidate
    # FARTHEST from the selected set: the orthogonal 13 jumps the queue
    assert picked[1] == 13
    # and the near-dup of the seed comes dead last among the three
    assert 10 in picked[:1] or 11 in picked[:1]
    assert set(picked[:3]) == {picked[0], 13, 12}


def test_pool_smaller_than_k_stops_cleanly(spark):
    df = _df(spark, [(0, _vec(1.0)), (10, _vec(0.9, 0.1)),
                     (11, _vec(0.1, 0.9))])
    out = mmr_rerank(df, df.where("vec_id = 0"), k=2, fetch_c=2)
    # only 2 candidates exist; both selected, ranks dense 1..2
    got = sorted((r.rank, r.neighbor_id) for r in out.collect())
    assert [r for r, _ in got] == [1, 2]
    assert {n for _, n in got} == {10, 11}


def test_selected_pairwise_similarity_bounded(spark, sf_dir):
    # production-shaped invariant on the real fixture: for every query,
    # any two SELECTED neighbors with cosine above the near-dup bar
    # (0.9) may co-occur ONLY if the pool offered no distinct
    # alternative — with C=16 >> k=5 that never happens, so assert the
    # clean form: no selected pair is a near-duplicate
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (
        load_table,
    )
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions import (
        vector as V,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = mmr_rerank(
        emb, emb.where(F.col("vec_id") < 5), k=5, fetch_c=16,
        lam_permille=500,
    )
    sel = out.select("query_id", "neighbor_id").join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            V.as_double("embedding").alias("v"),
            V.norm_fixed(F.col("embedding")).alias("n"),
        ),
        "neighbor_id",
    )
    a = sel.select("query_id", F.col("neighbor_id").alias("ia"),
                   F.col("v").alias("va"), F.col("n").alias("na"))
    b = sel.select(F.col("query_id").alias("qb"),
                   F.col("neighbor_id").alias("ib"),
                   F.col("v").alias("vb"), F.col("n").alias("nb"))
    pairs = a.join(
        b, (F.col("query_id") == F.col("qb")) & (F.col("ia") < F.col("ib"))
    ).withColumn(
        "cos",
        V.dot_fixed(F.col("va"), F.col("vb"), cast=False)
        / (F.col("na") * F.col("nb")),
    )
    worst = pairs.agg(F.max("cos")).first()[0]
    assert worst is not None and worst < 0.9, worst


def test_quantization_grid_is_portable(spark):
    # the greedy compares floor(cos*1e6+0.5) int64s — spot-check the
    # grid against python's reference on a handful of raw cosines
    import math

    df = spark.createDataFrame(
        [(0.123456789,), (-0.5,), (0.9999994,), (0.0000004,)], "x double"
    )
    got = [
        r.q for r in df.select(
            F.floor(F.col("x") * SIM_SCALE + F.lit(0.5)).cast("long").alias("q")
        ).collect()
    ]
    want = [math.floor(x * SIM_SCALE + 0.5)
            for x in [0.123456789, -0.5, 0.9999994, 0.0000004]]
    assert got == want


def test_candidates_path_with_exact_pool_equals_mmr_rerank(spark, sf_dir):
    # mmr_rerank_candidates is the SAME selection over a supplied pool:
    # feeding it the exact top-C scoring must reproduce mmr_rerank
    # row for row
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (
        load_table,
    )
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.knn import (
        knn_exact_expr,
    )
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.mmr import (
        mmr_rerank_candidates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 5)
    cand = knn_exact_expr(emb, qs, k=16).select(
        "query_id", "neighbor_id", "score"
    )
    via_cand = sorted(
        tuple(r)
        for r in mmr_rerank_candidates(
            cand, emb, k=5, fetch_c=16, lam_permille=500
        ).collect()
    )
    direct = sorted(
        tuple(r)
        for r in mmr_rerank(emb, qs, k=5, fetch_c=16, lam_permille=500)
        .collect()
    )
    assert via_cand == direct


def test_ivf_pool_gate_green(spark, sf_dir):
    import __spark_entry__ as E

    row = E.queries()["knn_mmr_ivf"](spark, sf_dir).collect()[0]
    assert row["passed"], row
    assert row["n_queries"] == 5
