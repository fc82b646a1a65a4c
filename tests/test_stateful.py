"""Custom stateful sessionizer: streaming output must reproduce the
batch gaps-and-islands sessionization exactly."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming.stateful import (
    sessionize_stream,
)
from tests.test_streaming import _stream_events


def _batch_islands(events, gap_minutes=60):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.col("ts")
            >= F.lag("ts").over(w) + F.expr(f"INTERVAL {gap_minutes} MINUTES"),
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    return flagged.withColumn(
        "session_index",
        (F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("int"),
    ).select("user_id", "event_id", "session_index")


def test_stateful_sessionizer_matches_batch(spark, sf_dir):
    out = sessionize_stream(_stream_events(spark, sf_dir), gap_minutes=60)
    q = (
        out.writeStream.format("memory")
        .queryName("sessionized")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sessionized").toPandas()

    events = load_table(spark, sf_dir, "events")
    want = _batch_islands(events).toPandas()

    assert len(got) == len(want)
    g = got.set_index("event_id")["session_index"].sort_index()
    w = want.set_index("event_id")["session_index"].sort_index()
    assert (g == w).all(), "streaming session indices diverge from batch islands"
    # session_start must equal min ts within each (user, session)
    starts = got.groupby(["user_id", "session_index"])
    assert (starts["session_start"].first() == starts["ts"].min()).all()


def test_stateful_sessionizer_multibatch(spark, sf_dir, tmp_path):
    """State must carry across micro-batches: split the events into two
    files processed as separate batches and compare again."""
    events = load_table(spark, sf_dir, "events").orderBy("ts")
    pdf = events.toPandas().sort_values("ts")
    mid = len(pdf) // 2
    src = tmp_path / "batches"
    src.mkdir()
    # single-file parquet (µs timestamps) so the file stream lists them
    # directly; b1 written first → older modTime → processed first
    pdf.iloc[:mid].to_parquet(
        str(src / "b1.parquet"), coerce_timestamps="us", allow_truncated_timestamps=True
    )
    pdf.iloc[mid:].to_parquet(
        str(src / "b2.parquet"), coerce_timestamps="us", allow_truncated_timestamps=True
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = sessionize_stream(stream, gap_minutes=60)
    q = (
        out.writeStream.format("memory")
        .queryName("sessionized_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("sessionized_mb").toPandas()
    want = _batch_islands(events).toPandas()
    assert len(got) == len(want)
    g = got.set_index("event_id")["session_index"].sort_index()
    w = want.set_index("event_id")["session_index"].sort_index()
    assert (g == w).all()
