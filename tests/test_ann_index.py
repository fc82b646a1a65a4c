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


def test_ivf_incremental_upsert_matches_single_batch(spark, sf_dir, tmp_path):
    """Streaming maintenance invariant: upserting in N micro-batches
    leaves exactly the same stored index as one batch — and search over
    the incrementally-maintained index with nprobe=all equals exact
    brute force over the full corpus."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    base = emb.where(F.col("vec_id") < 240)
    rest = emb.where(F.col("vec_id") >= 240)

    path_inc = str(tmp_path / "ivf_inc")
    path_one = str(tmp_path / "ivf_one")
    for p in (path_inc, path_one):
        ann_index.build_ivf_index(base, p, n_cells=8)

    for lo, hi in ((240, 300), (300, 360), (360, 400)):
        info = ann_index.upsert_ivf_index(
            spark, path_inc,
            rest.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
        )
        assert info["added"] == hi - lo and info["replaced"] == 0
    one = ann_index.upsert_ivf_index(spark, path_one, rest)
    assert one["added"] == 160

    inc_rows = sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(path_inc + "/vectors").collect()
    )
    one_rows = sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(path_one + "/vectors").collect()
    )
    assert inc_rows == one_rows and len(inc_rows) == 400

    queries = emb.where(F.col("vec_id") < 3)
    got = ann_index.search_ivf_index(spark, path_inc, queries, k=5, nprobe=8).toPandas()
    exact = KNN.knn_exact_expr(emb, queries, k=5).toPandas()
    assert sorted(zip(got["query_id"], got["neighbor_id"])) == sorted(
        zip(exact["query_id"], exact["neighbor_id"])
    )


def test_ivf_upsert_replaces_matching_ids_and_tracks_growth(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    path = str(tmp_path / "ivf_up")
    ann_index.build_ivf_index(emb, path, n_cells=4)

    # re-upsert 10 existing ids with a different payload (vector of the
    # id+1 row) → replaced, not duplicated
    moved = (
        emb.where(F.col("vec_id") < 10)
        .alias("a")
        .join(
            emb.selectExpr("vec_id - 1 AS vec_id", "embedding AS new_emb").alias("b"),
            "vec_id",
        )
        .select("vec_id", F.col("new_emb").alias("embedding"))
    )
    info = ann_index.upsert_ivf_index(spark, path, moved)
    assert info["added"] == 0 and info["replaced"] == 10
    assert info["cur_n"] == 100
    stored = spark.read.parquet(path + "/vectors")
    assert stored.count() == 100
    assert stored.select("vec_id").distinct().count() == 100

    # growth trigger: doubling the corpus recommends a re-fit
    new_ids = emb.selectExpr("vec_id + 1000 AS vec_id", "embedding")
    info2 = ann_index.upsert_ivf_index(spark, path, new_ids, refit_growth=2.0)
    assert info2["cur_n"] == 200
    assert info2["refit_recommended"]
    ann_index.refit_ivf_index(spark, path, n_cells=4)
    stats = ann_index.read_stats(spark, path)
    assert stats["fit_n"] == 200 and stats["cur_n"] == 200


def test_ivf_upsert_removes_stale_row_on_cell_move(spark, sf_dir, tmp_path):
    """An update whose new embedding assigns to a DIFFERENT cell than the
    stored row must delete the stale row in the old cell — with enough
    cells that the batch does NOT touch every partition (the case a
    touched-cells-only anti-join silently corrupts)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    path = str(tmp_path / "ivf_move")
    ann_index.build_ivf_index(emb, path, n_cells=16)

    stored = {
        int(r["vec_id"]): int(r["cell"])
        for r in spark.read.parquet(path + "/vectors").collect()
    }
    # pick an id X and a donor Y stored in a different cell; re-upsert X
    # with Y's embedding so X's new assignment lands in Y's cell
    x = min(stored)
    y = next(v for v, c in sorted(stored.items()) if c != stored[x])
    donor = emb.where(F.col("vec_id") == y).select(
        F.lit(x).cast("long").alias("vec_id"), "embedding"
    )
    info = ann_index.upsert_ivf_index(spark, path, donor)
    assert info["replaced"] == 1 and info["added"] == 0
    assert stored[x] in info["touched_cells"]  # old cell rewritten

    after = spark.read.parquet(path + "/vectors")
    rows = after.where(F.col("vec_id") == x).collect()
    assert len(rows) == 1, "stale duplicate id survived the cell move"
    assert int(rows[0]["cell"]) == stored[y]
    assert after.count() == 400
    assert ann_index.read_stats(spark, path)["cur_n"] == 400


def test_ivf_upsert_quarantines_unassignable_vectors(spark, sf_dir, tmp_path):
    """Zero-norm and NULL embeddings have no nearest cell: they are
    skipped (reported in telemetry), not a batch-killing TypeError."""
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions import vector as V

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    path = str(tmp_path / "ivf_zero")
    ann_index.build_ivf_index(emb, path, n_cells=4)

    good = emb.where(F.col("vec_id") == 5).select(
        F.lit(1000).cast("long").alias("vec_id"), "embedding"
    )
    bad = spark.createDataFrame(
        [(1001, [0.0] * V.EMBEDDING_DIM), (1002, None)],
        "vec_id long, embedding array<float>",
    )
    info = ann_index.upsert_ivf_index(spark, path, good.unionByName(bad))
    assert info["added"] == 1 and info["skipped"] == 2
    after = spark.read.parquet(path + "/vectors")
    assert after.count() == 101
    assert after.where(F.col("vec_id").isin(1001, 1002)).count() == 0


def test_ivf_stream_maintenance(spark, sf_dir, tmp_path):
    """foreachBatch wiring: stream vector files into the index, then
    search results equal exact brute force (nprobe=all)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    base = emb.where(F.col("vec_id") < 120)
    path = str(tmp_path / "ivf_stream")
    ann_index.build_ivf_index(base, path, n_cells=4)

    src = str(tmp_path / "incoming")
    for lo, hi in ((120, 160), (160, 200)):
        (
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .select("vec_id", "embedding")
            .write.mode("append")
            .parquet(src)
        )
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(src)
    q = ann_index.stream_ivf_index(
        stream, path, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    assert spark.read.parquet(path + "/vectors").count() == 200
    queries = emb.where(F.col("vec_id") < 3)
    got = ann_index.search_ivf_index(spark, path, queries, k=5, nprobe=4).toPandas()
    exact = KNN.knn_exact_expr(emb, queries, k=5).toPandas()
    assert sorted(zip(got["query_id"], got["neighbor_id"])) == sorted(
        zip(exact["query_id"], exact["neighbor_id"])
    )


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
