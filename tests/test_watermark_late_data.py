"""Watermark semantics with genuinely late data: rows arriving after
the watermark has passed their window must be dropped from streaming
aggregations (the late-data contract of SURVEY §2.8)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F


def _write_batch(path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(str(path), coerce_timestamps="us", allow_truncated_timestamps=True)


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    """Two checkpointed availableNow runs = two micro-batches with the
    watermark persisted between them (watermarks only advance across
    batch boundaries, so single-batch tests can't observe dropping)."""
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")

    def run(name):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .parquet(str(src))
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")  # file sink: checkpoint-recoverable
            .option("path", out_dir)
            .outputMode("append")  # append emits only finalized windows
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir).toPandas()

    # run 1: events to 12:59 → watermark persists at 12:49
    _write_batch(
        src / "b1.parquet",
        [(1, t0, 1), (2, t0 + dt.timedelta(minutes=30), 1),
         (3, t0 + dt.timedelta(minutes=59), 1)],
    )
    run("late_r1")

    # run 2: one on-time event (13:10) + one VERY late event (11:00,
    # far behind the persisted watermark) that must be dropped
    _write_batch(
        src / "b2.parquet",
        [(4, t0 + dt.timedelta(minutes=70), 1),
         (5, t0 - dt.timedelta(minutes=60), 1)],
    )
    out2 = run("late_r2").set_index("window_start")["n"]

    # the 12:00 window finalizes with exactly events 1-3 (no late add),
    # and the 11:00 window must not be resurrected by the late row
    assert out2.get(pd.Timestamp(t0)) == 3
    assert pd.Timestamp(t0 - dt.timedelta(hours=1)) not in out2.index
