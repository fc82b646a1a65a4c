"""Streaming semantics (ST1-ST4): batch ≡ streaming equivalence via
availableNow over the fixture parquet, plus watermark behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (
    NANOS_TS_COLUMNS,
    _read_schema,
    ensure_nanos_conf,
    load_table,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming import windows as W


def _stream_events(spark, sf_dir):
    """events.parquet as a stream (nanos → timestamp, same as batch)."""
    ensure_nanos_conf(spark)
    schema, nanos = _read_schema("events", f"{sf_dir}/events.parquet")
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for c in nanos:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def _drain(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def test_rate_limit_batch_vs_stream(spark, sf_dir):
    batch = W.rate_limit_alerts(
        load_table(spark, sf_dir, "events"), threshold=2
    ).toPandas()
    stream = _drain(
        spark,
        W.rate_limit_alerts(_stream_events(spark, sf_dir), threshold=2),
        "rl_stream",
        "complete",
    )
    key = ["user_id", "window_start", "n_req"]
    assert sorted(map(tuple, batch[key].values.tolist())) == sorted(
        map(tuple, stream[key].values.tolist())
    )


def test_session_expiry_batch_vs_stream(spark, sf_dir):
    batch = W.session_expiry(
        load_table(spark, sf_dir, "events"), gap="60 minutes"
    ).toPandas()
    stream = _drain(
        spark,
        W.session_expiry(_stream_events(spark, sf_dir), gap="60 minutes",
                         watermark="61 minutes"),
        "se_stream",
        "complete",
    )
    key = ["user_id", "session_start", "n_events"]
    assert sorted(map(tuple, batch[key].values.tolist())) == sorted(
        map(tuple, stream[key].values.tolist())
    )


def test_active_users_gauge_runs_streaming(spark, sf_dir):
    stream = _drain(
        spark,
        W.active_users_gauge(_stream_events(spark, sf_dir)),
        "au_stream",
        "complete",
    )
    assert len(stream) > 0
    assert (stream["active_users"] > 0).all()


def test_active_users_approx_close_to_exact(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    approx = W.active_users_gauge(events).toPandas().set_index("window_start")
    exact = W.active_users_gauge(events, exact=True).toPandas().set_index("window_start")
    joined = approx.join(exact, lsuffix="_a", rsuffix="_e")
    rel_err = (
        (joined["active_users_a"] - joined["active_users_e"]).abs()
        / joined["active_users_e"]
    )
    assert rel_err.max() <= 0.1


def test_attribution_join_batch_vs_stream(spark, sf_dir):
    batch = W.click_purchase_attribution(
        load_table(spark, sf_dir, "events")
    ).toPandas()
    stream = _drain(
        spark,
        W.click_purchase_attribution(_stream_events(spark, sf_dir)),
        "attr_stream",
        "append",
    )
    assert len(batch) > 0
    key = ["click_id", "purchase_id"]
    assert sorted(map(tuple, batch[key].values.tolist())) == sorted(
        map(tuple, stream[key].values.tolist())
    )


def test_retention_filter_batch(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    kept = W.retention_filter(events, horizon="7 days")
    mx = events.agg(F.max("ts")).collect()[0][0]
    assert kept.count() == events.where(
        F.col("ts") >= F.lit(mx) - F.expr("INTERVAL 7 DAYS")
    ).count()
    assert kept.count() < events.count()


def test_retention_filter_streaming_sets_watermark(spark, sf_dir):
    s = W.retention_filter(_stream_events(spark, sf_dir), horizon="30 days")
    assert s.isStreaming
    # watermark present in the analyzed plan
    assert "EventTimeWatermark" in s._jdf.queryExecution().analyzed().toString()
