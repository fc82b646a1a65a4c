"""Incremental daily-rollup maintenance: N-batch ≡ 1-batch (HLL union is
associative/commutative), stream ≡ batch, range queries answered from
the rollup alone."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (
    _read_schema,
    ensure_nanos_conf,
    load_table,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming import rollup as R


def _expected(events):
    return (
        events.agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count("*").alias("n_events"),
        ).first()
    )


def test_nbatch_equals_onebatch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")

    R.upsert_daily_rollup(spark, one, events)
    # three uneven batches, overlapping days, out of order
    for cond in [
        F.col("event_id") % 3 == 1,
        F.col("event_id") % 3 == 2,
        F.col("event_id") % 3 == 0,
    ]:
        R.upsert_daily_rollup(spark, many, events.where(cond))

    a = R.rollup_estimate(spark, one).first()
    b = R.rollup_estimate(spark, many).first()
    assert a["distinct_users"] == b["distinct_users"]
    assert a["n_events"] == b["n_events"]

    exp = _expected(events)
    assert a["n_events"] == exp["n_events"]
    # HLL estimate within 5% of exact
    assert abs(a["distinct_users"] - exp["distinct_users"]) <= 0.05 * exp["distinct_users"]


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    ensure_nanos_conf(spark)
    schema, nanos = _read_schema("events", f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    for c in nanos:
        stream = stream.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))

    spath = str(tmp_path / "stream_rollup")
    q = R.stream_daily_rollup(stream, spath, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    bpath = str(tmp_path / "batch_rollup")
    R.upsert_daily_rollup(spark, bpath, events)

    a = R.rollup_estimate(spark, spath).first()
    b = R.rollup_estimate(spark, bpath).first()
    assert a["distinct_users"] == b["distinct_users"]
    assert a["n_events"] == b["n_events"]


def test_range_query_prunes_to_days(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup")
    R.upsert_daily_rollup(spark, path, events)
    r = R.rollup_estimate(spark, path, start="2024-01-02", end="2024-01-03").first()
    exp = _expected(
        events.where(F.to_date("ts").between("2024-01-02", "2024-01-03"))
    )
    assert r["n_events"] == exp["n_events"]
    assert abs(r["distinct_users"] - exp["distinct_users"]) <= max(
        1, 0.05 * exp["distinct_users"]
    )


def test_epoch_replay_skipped(spark, sf_dir, tmp_path):
    """A replayed micro-batch (same epoch_id, as foreachBatch delivers
    after a restart) must not double-count n_events."""
    events = load_table(spark, sf_dir, "events").limit(200)
    path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    assert R.merge_epoch(events, 0, path, ckpt) is True
    first = R.rollup_estimate(spark, path).first()
    # replay of epoch 0: skipped
    assert R.merge_epoch(events, 0, path, ckpt) is False
    replay = R.rollup_estimate(spark, path).first()
    assert replay["n_events"] == first["n_events"]
    assert replay["distinct_users"] == first["distinct_users"]
    # a genuinely new epoch still merges
    assert R.merge_epoch(events, 1, path, ckpt) is True
    after = R.rollup_estimate(spark, path).first()
    assert after["n_events"] == 2 * first["n_events"]


def test_overwrite_mode_restored(spark, sf_dir, tmp_path):
    """upsert_daily_rollup must not leak partitionOverwriteMode=dynamic
    into the shared session (ADVICE r4)."""
    key = "spark.sql.sources.partitionOverwriteMode"
    events = load_table(spark, sf_dir, "events").limit(100)
    path = str(tmp_path / "rollup")
    before = spark.conf.get(key, None)
    R.upsert_daily_rollup(spark, path, events)   # create
    R.upsert_daily_rollup(spark, path, events)   # merge (dynamic write)
    assert spark.conf.get(key, None) == before
