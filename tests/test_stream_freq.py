"""Streaming heavy hitters (streaming/freq.py): multi-micro-batch
availableNow drain + exact finalize ≡ the batch operator; restart
continuation via state_path + checkpoint; idempotent epoch replay."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.freq import (
    exact_heavy_hitters_naive,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming.freq import (
    MgState,
    finalize_exact,
    run_heavy_hitters_stream,
)

PHI = 0.008


def _multi_file_events(spark, sf_dir, tmp_path, n_files=4):
    src = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = str(tmp_path / "events_parts")
    src.repartition(n_files).write.mode("overwrite").parquet(out)
    return out, src


def _stream(spark, path):
    schema = None
    from pyspark.sql import SparkSession  # noqa: F401

    batch = SparkSession.getActiveSession().read.parquet(path)
    return (
        batch.sparkSession.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_stream_equals_batch_across_microbatches(spark, sf_dir, tmp_path):
    path, src = _multi_file_events(spark, sf_dir, tmp_path)
    state = run_heavy_hitters_stream(_stream(spark, path), "user_id", PHI)
    assert state.last_epoch >= 3  # maxFilesPerTrigger=1 → ≥4 batches
    got = finalize_exact(src, "user_id", PHI, state)
    want = exact_heavy_hitters_naive(src, "user_id", PHI)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # superset invariant of the sketch itself
    cands = set(state.candidates(PHI))
    true_hh = {r.user_id for r in want.collect()}
    assert true_hh <= cands
    assert state.total == src.count()


def test_restart_continues_from_state(spark, sf_dir, tmp_path):
    path, src = _multi_file_events(spark, sf_dir, tmp_path)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for f in files[:2]:
        shutil.copy(f, staged)
    ckpt = str(tmp_path / "ckpt")
    st_path = str(tmp_path / "mg.json")

    s1 = run_heavy_hitters_stream(
        _stream(spark, staged), "user_id", PHI,
        state_path=st_path, checkpoint=ckpt,
    )
    assert 0 < s1.total < src.count()

    for f in files[2:]:
        shutil.copy(f, staged)
    s2 = run_heavy_hitters_stream(
        _stream(spark, staged), "user_id", PHI,
        state_path=st_path, checkpoint=ckpt,
    )
    assert s2.total == src.count()  # no double count of the first half
    got = finalize_exact(src, "user_id", PHI, s2)
    want = exact_heavy_hitters_naive(src, "user_id", PHI)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_epoch_replay_is_idempotent():
    st = MgState(k=10)
    st.absorb([("a", 5), ("b", 2)], 7, epoch_id=0)
    before = (dict(st.counters), st.total)
    st.absorb([("a", 5), ("b", 2)], 7, epoch_id=0)  # redelivery
    assert (dict(st.counters), st.total) == before
    st.absorb([("a", 1)], 1, epoch_id=1)
    assert st.total == 8


def test_finalize_empty_candidates(spark):
    df = spark.range(100).select((F.col("id") % 100).alias("user_id"))
    st = MgState(k=300)
    st.total = 100  # nothing absorbed → no candidates
    out = finalize_exact(df, "user_id", 0.5, st)
    assert out.count() == 0
    assert out.columns == ["user_id", "cnt"]


def test_timeout_stops_query_and_raises(spark, sf_dir, tmp_path):
    import pytest

    path, _src = _multi_file_events(spark, sf_dir, tmp_path)
    n_before = len(spark.streams.active)
    # 1 ms: the 4-file drain cannot finish — a partial drain must raise
    # (not silently return under-counted state) and stop the query
    with pytest.raises(TimeoutError, match="did not drain"):
        run_heavy_hitters_stream(
            _stream(spark, path), "user_id", PHI, timeout=0.001
        )
    assert len(spark.streams.active) == n_before
