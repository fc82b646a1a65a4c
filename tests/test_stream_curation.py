"""Streaming curation gates: the contamination check over a
continuously-ingesting document stream must agree with the batch
operator — native stream-static join for gram hits (stateless,
append-mode) and foreachBatch for per-doc scores."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.schemas import DRIVER_TABLES
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming import curation as C


def _stream_documents(spark, sf_dir):
    return (
        spark.readStream.schema(DRIVER_TABLES["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def _corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").where(
        F.pmod(F.col("doc_id"), F.lit(C.BENCH_MOD)) != 0
    )


def test_contamination_hits_stream_static_join(spark, sf_dir, tmp_path):
    bench = C.benchmark_grams(spark, sf_dir)
    batch_hits = C.contamination_hits_stream(_corpus(spark, sf_dir), bench)
    assert not batch_hits.isStreaming

    stream_df = C.contamination_hits_stream(
        _stream_documents(spark, sf_dir).where(
            F.pmod(F.col("doc_id"), F.lit(C.BENCH_MOD)) != 0
        ),
        bench,
    )
    assert stream_df.isStreaming
    # stateless join → append mode is legal (a stateful agg would not be)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("contam_hits")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM contam_hits").toPandas()
    want = batch_hits.toPandas()
    key = lambda pdf: sorted(map(tuple, pdf[["doc_id", "g"]].values.tolist()))
    assert key(got) == key(want)
    assert len(want) > 0  # the check is not vacuous


def test_score_documents_stream_matches_batch(spark, sf_dir, tmp_path):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.trainprep import contamination_overlap

    bench = C.benchmark_grams(spark, sf_dir)
    want = contamination_overlap(spark, sf_dir).toPandas()

    collected = []

    def sink(df, epoch_id):
        collected.append(df.toPandas())

    q = C.score_documents_stream(
        _stream_documents(spark, sf_dir).where(
            F.pmod(F.col("doc_id"), F.lit(C.BENCH_MOD)) != 0
        ),
        bench,
        sink,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    import pandas as pd

    got = pd.concat(collected, ignore_index=True)
    cols = ["doc_id", "n_grams", "n_hit", "contam_frac", "flagged"]
    key = lambda pdf: sorted(map(tuple, pdf[cols].astype(str).values.tolist()))
    assert key(got) == key(want)
