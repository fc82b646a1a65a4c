"""Storage layout: partition pruning and clustered row-group skipping
actually happen on the written layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import sinks


def test_partitioned_events_prune(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_part")
    sinks.write_events_partitioned(events, out, mode="overwrite")
    # hive-style partition dirs exist
    dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(dirs) > 1

    reread = spark.read.parquet(out)
    one_day = sorted(dirs)[0].split("=", 1)[1]
    q = reread.where(F.col("event_date") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter present → only one partition scanned
    assert "PartitionFilters" in plan
    assert q.count() == events.where(F.to_date("ts") == one_day).count()


def test_clustered_chunks_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.lit(0).alias("chunk_index"), "text"
    )
    out = str(tmp_path / "chunks")
    sinks.write_chunks_clustered(docs, out, n_files=4)
    reread = spark.read.parquet(out)
    assert reread.count() == docs.count()
    # predicate on the cluster key is pushed to the scan
    q = reread.where(F.col("doc_id") == 7)
    fmt = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in fmt and "doc_id" in fmt


def test_stream_append_foreachbatch(spark, sf_dir, tmp_path):
    from tests.test_streaming import _stream_events

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = sinks.append_stream_foreachbatch(_stream_events(spark, sf_dir), out, ckpt)
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    assert written.count() == load_table(spark, sf_dir, "events").count()
