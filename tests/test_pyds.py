"""The `corpusdir` Python DataSource: batch read with per-file
partitions, kind-filter file pruning at planning time, and the
incremental streaming source (new files only, exact replay)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import pyds
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.pyds import (
    CorpusDirReader,
)

from .test_minidecode import make_docx, make_pdf


@pytest.fixture()
def corpus_dir(tmp_path):
    # subdirectory: tmp_path is shared with the streaming checkpoint,
    # which must NOT be inside the watched directory
    tmp_path = tmp_path / "corpus"
    tmp_path.mkdir()
    (tmp_path / "a.pdf").write_bytes(
        make_pdf([b"BT /F1 12 Tf (page one) Tj ET",
                  b"BT /F1 12 Tf (page two) Tj ET"])
    )
    (tmp_path / "b.docx").write_bytes(make_docx(["hello docx"]))
    (tmp_path / "c.html").write_bytes(b"<html><body><p>hi html</p></body></html>")
    (tmp_path / "d.txt").write_bytes(b"plain text")
    return str(tmp_path)


def _read(spark, path):
    pyds.register(spark)
    return spark.read.format("corpusdir").option("path", path).load()


def test_batch_read_all_kinds(spark, corpus_dir):
    rows = _read(spark, corpus_dir).orderBy("path", "page_no").collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert [r["page_text"] for r in by_kind["pdf"]] == ["page one", "page two"]
    assert [r["page_no"] for r in by_kind["pdf"]] == [0, 1]
    assert "hello docx" in by_kind["docx"][0]["page_text"]
    assert "hi html" in by_kind["html"][0]["page_text"]
    assert by_kind["txt"][0]["page_text"] == "plain text"
    assert all(r["file_size"] > 0 for r in rows)


def test_one_partition_per_file(spark, corpus_dir):
    df = _read(spark, corpus_dir)
    assert df.rdd.getNumPartitions() == 4


def test_kind_filter_prunes_files(spark, corpus_dir):
    df = _read(spark, corpus_dir).where(F.col("kind") == "pdf")
    assert sorted(r["page_text"] for r in df.collect()) == [
        "page one", "page two"
    ]
    # planning-time pruning: only the pdf file becomes a partition
    reader = CorpusDirReader({"path": corpus_dir})
    from pyspark.sql.datasource import EqualTo

    unsupported = list(reader.pushFilters([EqualTo(("kind",), "pdf")]))
    assert unsupported == []
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].path.endswith("a.pdf")


def test_unsupported_filters_returned(spark, corpus_dir):
    from pyspark.sql.datasource import EqualTo, GreaterThan

    reader = CorpusDirReader({"path": corpus_dir})
    other = GreaterThan(("file_size",), 10)
    unsupported = list(reader.pushFilters([EqualTo(("kind",), "txt"), other]))
    assert unsupported == [other]
    # correctness with a residual filter evaluated by Spark
    df = _read(spark, corpus_dir).where(
        (F.col("kind") == "txt") & (F.col("file_size") > 10)
    )
    assert df.count() == 0  # 'plain text' is 10 bytes — Spark filters it


def test_streaming_incremental_pickup(spark, corpus_dir, tmp_path):
    pyds.register(spark)
    stream = (
        spark.readStream.format("corpusdir")
        .option("path", corpus_dir)
        .load()
    )
    batches: list[list] = []

    def run_once():
        # memory sink cannot recover from a checkpoint — foreachBatch can
        q = (
            stream.writeStream.foreachBatch(
                lambda df, eid: batches.append(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = [r for b in batches for r in b]
    assert len(got1) == 5  # 2 pdf pages + docx + html + txt

    # a NEW file (sorts after the consumed ones) arrives → only it is read
    import os

    with open(os.path.join(corpus_dir, "e.txt"), "wb") as fh:
        fh.write(b"late arrival")
    batches.clear()
    run_once()
    got2 = [r for b in batches for r in b]
    assert [r["page_text"] for r in got2] == ["late arrival"]


def test_in_filter_pushdown_and_intersection(spark, corpus_dir):
    from pyspark.sql.datasource import EqualTo, In

    reader = CorpusDirReader({"path": corpus_dir})
    # pyspark 4.1's In dataclass carries its tuple in the `value` field
    unsupported = list(reader.pushFilters([In(("kind",), ("pdf", "docx"))]))
    assert unsupported == []
    assert {p.path.rsplit(".", 1)[-1] for p in reader.partitions()} == {
        "pdf", "docx"
    }
    # consumed filters INTERSECT — keeping only the last would drop one
    reader2 = CorpusDirReader({"path": corpus_dir})
    list(reader2.pushFilters([In(("kind",), ("pdf", "docx")),
                              In(("kind",), ("docx", "html"))]))
    assert {p.path.rsplit(".", 1)[-1] for p in reader2.partitions()} == {"docx"}
    # end-to-end through the engine
    df = _read(spark, corpus_dir).where(F.col("kind").isin("pdf", "txt"))
    assert sorted(r["kind"] for r in df.collect()) == ["pdf", "pdf", "txt"]


def test_unknown_extension_is_other_kind(spark, corpus_dir):
    import os

    with open(os.path.join(corpus_dir, "z.bin"), "wb") as fh:
        fh.write(b"\x00\x01binary payload")
    # kind='txt' must NOT open the binary payload …
    df = _read(spark, corpus_dir).where(F.col("kind") == "txt")
    assert [r["page_text"] for r in df.collect()] == ["plain text"]
    # … and the unknown file is separately addressable AND prunable
    reader = CorpusDirReader({"path": corpus_dir})
    from pyspark.sql.datasource import EqualTo

    list(reader.pushFilters([EqualTo(("kind",), "other")]))
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].path.endswith("z.bin")


def test_stream_offset_validates_listing_prefix(corpus_dir):
    import os

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.pyds import (
        CorpusDirStreamReader,
    )

    reader = CorpusDirStreamReader({"path": corpus_dir})
    rows, end = reader.read(reader.initialOffset())
    n = len(list(rows))
    assert n == 5 and end["index"] == 4 and end["last"].endswith("d.txt")

    # new file sorting BEFORE the watermark: indices shift → batch fails
    with open(os.path.join(corpus_dir, "0_early.txt"), "wb") as fh:
        fh.write(b"sorts first")
    with pytest.raises(RuntimeError, match="no longer matches"):
        reader.read(end)
    with pytest.raises(RuntimeError, match="no longer matches"):
        list(reader.readBetweenOffsets({"index": 0, "last": None}, end))
    os.remove(os.path.join(corpus_dir, "0_early.txt"))

    # a deleted consumed file also shifts the prefix → batch fails
    os.remove(os.path.join(corpus_dir, "b.docx"))
    with pytest.raises(RuntimeError, match="no longer matches"):
        reader.read(end)

    # pre-upgrade checkpoints (no 'last') skip validation, not crash
    rows, _end2 = reader.read({"index": 3})
    assert len(list(rows)) == 0  # 3 files remain → nothing new at index 3
