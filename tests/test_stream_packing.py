"""Streaming sequence packing: the stateful per-shard offset must make
the stream reproduce the batch concat-and-chunk operator exactly when
batches arrive in doc_id order, with state carrying across
micro-batches."""

from __future__ import annotations

import pandas as pd

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.trainprep import (
    sequence_packing,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming.packing import (
    pack_stream,
)

_KEY = ["doc_id", "lang", "n_tokens", "cum_before", "first_seq", "last_seq", "start_off"]


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf[_KEY].sort_values("doc_id").reset_index(drop=True)


def test_stream_packing_matches_batch_across_microbatches(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pdf = docs.toPandas().sort_values("doc_id")
    mid = len(pdf) // 2
    src = tmp_path / "docbatches"
    src.mkdir()
    # b1 written first → older modTime → processed first; a doc_id-ordered
    # split keeps per-shard arrival order equal to the batch operator's
    pdf.iloc[:mid].to_parquet(str(src / "b1.parquet"))
    pdf.iloc[mid:].to_parquet(str(src / "b2.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = pack_stream(stream, seq_len=2048)
    q = (
        out.writeStream.format("memory")
        .queryName("packed_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _normalize(spark.table("packed_stream").toPandas())

    want = _normalize(sequence_packing(spark, sf_dir).toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """A SECOND availableNow run (new files, fresh query, same
    checkpoint) must continue each shard's token offset where the
    first run committed it — the restart contract a long-lived corpus
    feed relies on."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pdf = docs.toPandas().sort_values("doc_id")
    mid = len(pdf) // 2
    src = tmp_path / "docfeed"
    src.mkdir()
    batches: list[pd.DataFrame] = []

    def run_once():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            pack_stream(stream, seq_len=2048)
            .writeStream.foreachBatch(
                lambda df, eid: batches.append(df.toPandas())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    pdf.iloc[:mid].to_parquet(str(src / "b1.parquet"))
    run_once()
    pdf.iloc[mid:].to_parquet(str(src / "b2.parquet"))
    run_once()

    got = _normalize(pd.concat(batches, ignore_index=True))
    want = _normalize(sequence_packing(spark, sf_dir).toPandas())
    pd.testing.assert_frame_equal(got, want)
