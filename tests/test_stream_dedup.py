"""Streaming dedup (dropDuplicatesWithinWatermark): a duplicated stream
collapses back to the batch-distinct row set, with state bounded by the
watermark instead of growing with every key ever seen."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming import windows as W

from .test_streaming import _drain, _stream_events


def test_duplicated_stream_collapses_to_distinct(spark, sf_dir):
    batch_n = load_table(spark, sf_dir, "events").count()

    # Two readers of the same file = every event arrives twice.
    doubled = _stream_events(spark, sf_dir).union(_stream_events(spark, sf_dir))
    out = _drain(spark, W.dedup_stream(doubled), "dedup_stream_out", "append")

    assert len(out) == batch_n
    assert out["event_id"].is_unique


def test_batch_call_site_is_exact_dropduplicates(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    doubled = events.union(events)
    out = W.dedup_stream(doubled)
    assert not out.isStreaming
    assert out.count() == events.count()
    assert out.select(F.countDistinct("event_id")).first()[0] == events.count()
