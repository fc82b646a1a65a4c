"""History-gated streaming bloom dedup (streaming/bloomdedup.py):
stream ≡ batch first-occurrence dedup, replay skip, and the
crash-before-commit window replaying byte-identically."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.bloom import (
    bloom_params,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming.bloomdedup import (
    BloomDedupState,
)


def _mkdocs(spark, lo, hi, text_mod):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t-"), (F.col("id") % text_mod).cast("string")).alias(
            "text"
        ),
    )


class _Collector:
    def __init__(self):
        self.calls = []

    def __call__(self, df, epoch):
        self.calls.append((epoch, sorted(r.doc_id for r in df.collect())))


def test_batches_dedupe_against_all_history(spark, tmp_path):
    m, k = bloom_params(300, 0.02)
    st = BloomDedupState(str(tmp_path / "state"), m, k)
    sink = _Collector()

    # 3 batches over a key space that wraps: later batches repeat keys
    b0 = _mkdocs(spark, 0, 100, 150)     # keys t-0..t-99      all novel
    b1 = _mkdocs(spark, 100, 200, 150)   # t-100..149 novel, t-0..49 dup
    b2 = _mkdocs(spark, 200, 300, 150)   # all dup (t-50..149)
    assert st.apply_batch(b0, 0, "text", sink)
    assert st.apply_batch(b1, 1, "text", sink)
    assert st.apply_batch(b2, 2, "text", sink)

    assert [e for e, _ in sink.calls] == [0, 1, 2]
    assert sink.calls[0][1] == list(range(0, 100))
    assert sink.calls[1][1] == list(range(100, 150))  # only novel texts
    assert sink.calls[2][1] == []
    # state: key log holds exactly the 150 distinct texts
    keys = st.keys(spark, st.last_epoch())
    assert keys.distinct().count() == 150


def test_committed_epoch_replay_is_skipped(spark, tmp_path):
    m, k = bloom_params(100, 0.02)
    st = BloomDedupState(str(tmp_path / "state"), m, k)
    sink = _Collector()
    b = _mkdocs(spark, 0, 50, 1000)
    assert st.apply_batch(b, 0, "text", sink) is True
    assert st.apply_batch(b, 0, "text", sink) is False  # redelivery
    assert len(sink.calls) == 1


def test_crash_before_commit_replays_identically(spark, tmp_path):
    m, k = bloom_params(200, 0.02)
    root = str(tmp_path / "state")
    st = BloomDedupState(root, m, k)
    sink = _Collector()
    st.apply_batch(_mkdocs(spark, 0, 100, 1000), 0, "text", sink)
    st.apply_batch(_mkdocs(spark, 50, 150, 1000), 1, "text", sink)
    first_epoch1 = sink.calls[1]
    keys_after = sorted(
        r.key for r in st.keys(spark, 1).collect()
    )

    # simulate the crash window: epoch 1's state dirs were written but
    # the marker move was lost
    with open(os.path.join(root, "last_committed_epoch.txt"), "w") as fh:
        fh.write("0")
    assert st.apply_batch(_mkdocs(spark, 50, 150, 1000), 1, "text", sink) is True
    assert sink.calls[2] == first_epoch1  # byte-identical redelivery
    assert sorted(r.key for r in st.keys(spark, 1).collect()) == keys_after


def test_within_batch_duplicates_pick_deterministically(spark, tmp_path):
    m, k = bloom_params(100, 0.02)
    # two rows per key with different doc_ids: the survivor must be the
    # same row on every (re)delivery
    dup = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t-"), (F.col("id") % 20).cast("string")).alias("text"),
    )
    picks = []
    for trial in range(2):
        st = BloomDedupState(str(tmp_path / f"s{trial}"), m, k)
        sink = _Collector()
        st.apply_batch(dup, 0, "text", sink)
        picks.append(sink.calls[0][1])
        assert len(picks[-1]) == 20
    assert picks[0] == picks[1]


def test_stream_end_to_end_equals_batch_first_occurrence(spark, tmp_path):
    import pandas as pd

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming.bloomdedup import (
        stream_bloom_dedup,
    )

    # stage the wrapped corpus as a rate-limited file stream
    src = str(tmp_path / "src")
    df = _mkdocs(spark, 0, 300, 150)
    df.repartition(6).write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    m, k = bloom_params(300, 0.02)
    got = []

    def sink(novel, epoch):
        got.extend((r.text, r.doc_id) for r in novel.collect())

    q = stream_bloom_dedup(
        stream, "text", str(tmp_path / "state"), str(tmp_path / "ckpt"),
        m, k, sink,
    )
    q.awaitTermination(120)

    # one row per distinct text survived, whatever the arrival order
    texts = [t for t, _ in got]
    assert len(texts) == 150 and len(set(texts)) == 150
