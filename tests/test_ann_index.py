"""Persistent IVF layout: partition pruning happens, recall holds, and
co-located (bucketed) joins avoid shuffles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import ann_index
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import knn as KNN


def test_ivf_index_partition_pruning_and_recall(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, n_cells=8)

    queries = emb.where(F.col("vec_id") < 5)
    hits = ann_index.search_ivf_index(spark, path, queries, k=5, nprobe=3)

    # partition pruning: the scan's partition filters mention `cell`
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    got = hits.toPandas()
    exact = KNN.knn_exact_expr(emb, queries, k=5).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    g = got.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & g.get(q, set())) / len(e[q]) for q in e.index]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key co-locates them: the join
    plan has no Exchange (the write-time layout replaces the runtime
    shuffle — the chunks⋈vectors case at 100 TB)."""
    import shutil

    for t in ("docs_bucketed", "meta_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    meta = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(
        "docs_bucketed"
    )
    meta.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(
        "meta_bucketed"
    )
    # disable broadcast so the planner exercises the bucketed SMJ path
    # (at 100 TB neither side broadcasts; that's the case bucketing serves)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("docs_bucketed").join(
            spark.table("meta_bucketed"), "doc_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
