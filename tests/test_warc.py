"""WARC/WET source + sink (sources/warc.py): parser round-trips (plain,
per-record gzip, HTTP response splitting, header folding), fail-soft on
truncation, DataSource reads with record_type pushdown, and the
distributed re-shard → re-read round-trip behind Q(warc_roundtrip_docs).
"""

from __future__ import annotations

import gzip
import io
import os

import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import warc as W


def _recs():
    return [
        {
            "record_type": "warcinfo",
            "record_id": "<urn:uuid:info-1>",
            "date": "2026-01-01T00:00:00Z",
            "content_type": "application/warc-fields",
            "body": b"software: ai-tutor-spark\r\n",
        },
        {
            "record_type": "response",
            "record_id": "<urn:uuid:resp-1>",
            "date": "2026-01-01T00:00:01Z",
            "target_uri": "https://example.org/a",
            "content_type": "application/http; msgtype=response",
            "body": (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"\r\n"
                b"<html><body>hello <b>warc</b></body></html>"
            ),
        },
        {
            "record_type": "response",
            "record_id": "<urn:uuid:resp-2>",
            "date": "2026-01-01T00:00:02Z",
            "target_uri": "https://example.org/img",
            "content_type": "application/http; msgtype=response",
            "body": (
                b"HTTP/1.1 404 Not Found\r\n"
                b"Content-Type: image/png\r\n"
                b"\r\n"
                b"\x89PNG\x00binary"
            ),
        },
        {
            "record_type": "conversion",
            "record_id": "<urn:doc:42>",
            "date": "2026-01-01T00:00:03Z",
            "target_uri": "https://corpus.example/doc/42",
            "content_type": "text/plain",
            "extra_headers": (("WARC-Identified-Content-Language", "en"),),
            "body": "plain text é中".encode("utf-8"),
        },
    ]


def _roundtrip(gz: bool):
    buf = io.BytesIO()
    n = W.write_warc(_recs(), buf, gzip_per_record=gz)
    assert n == 4
    data = buf.getvalue()
    if gz:
        stream = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(data)))
    else:
        stream = io.BytesIO(data)
    return data, list(W.parse_warc(stream, strict=True))


@pytest.mark.parametrize("gz", [False, True])
def test_write_parse_roundtrip(gz):
    _, out = _roundtrip(gz)
    assert [r["headers"]["warc-type"] for r in out] == [
        "warcinfo", "response", "response", "conversion",
    ]
    assert out[3]["body"] == "plain text é中".encode("utf-8")
    assert out[3]["headers"]["warc-identified-content-language"] == "en"
    assert out[1]["headers"]["warc-target-uri"] == "https://example.org/a"
    # bodies framed by Content-Length survive exactly
    assert out[2]["body"].endswith(b"\x89PNG\x00binary")


def test_gzip_members_are_individually_valid():
    data, _ = _roundtrip(True)
    # first member alone must decompress to a full record (the resync
    # property Common Crawl relies on for random access)
    gz = gzip.GzipFile(fileobj=io.BytesIO(data))
    first = gz.readline()
    assert first.startswith(b"WARC/1.1")


def test_truncation_lax_stops_strict_raises():
    buf = io.BytesIO()
    W.write_warc(_recs(), buf)
    cut = buf.getvalue()[:-60]  # amputate inside the last body
    got = list(W.parse_warc(io.BytesIO(cut)))
    assert len(got) == 3  # lax: complete records only
    with pytest.raises(W.WarcFormatError):
        list(W.parse_warc(io.BytesIO(cut), strict=True))


def test_malformed_header_line():
    raw = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nbogus line\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    got = list(W.parse_warc(io.BytesIO(raw)))
    assert got[0]["body"] == b"ok"
    with pytest.raises(W.WarcFormatError):
        list(W.parse_warc(io.BytesIO(raw), strict=True))


def test_header_continuation_folding():
    raw = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Concurrent-To: <urn:a>\r\n <urn:b>\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    (rec,) = W.parse_warc(io.BytesIO(raw), strict=True)
    assert rec["headers"]["warc-concurrent-to"] == "<urn:a> <urn:b>"


def test_split_http_response():
    s, ct, body = W.split_http_response(
        b"HTTP/1.1 301 Moved\r\nLocation: /x\r\nContent-Type: text/html\r\n\r\nmoved"
    )
    assert (s, ct, body) == (301, "text/html", b"moved")
    # LF-only separator tolerated
    s, ct, body = W.split_http_response(b"HTTP/1.0 200 OK\nContent-Type: a/b\n\nX")
    assert (s, ct, body) == (200, "a/b", b"X")
    # non-HTTP passthrough
    assert W.split_http_response(b"raw") == (None, None, b"raw")


@pytest.fixture()
def segment_dir(tmp_path):
    for i, gz in ((0, False), (1, True)):
        ext = ".warc.gz" if gz else ".warc"
        with open(tmp_path / f"seg-{i}{ext}", "wb") as f:
            W.write_warc(_recs(), f, gzip_per_record=gz)
    (tmp_path / "ignore.txt").write_text("not a warc")
    return str(tmp_path)


def test_datasource_reads_all_segments(spark, segment_dir):
    W.register(spark)
    df = spark.read.format("warc").option("path", segment_dir).load()
    rows = df.collect()
    assert len(rows) == 8  # 4 records × 2 segments; .txt ignored
    by_type = {}
    for r in rows:
        by_type.setdefault(r.record_type, []).append(r)
    # HTTP split happened: status + entity payload, wire headers gone
    ok = [r for r in by_type["response"] if r.http_status == 200]
    assert len(ok) == 2
    assert ok[0].payload_type.startswith("text/html")
    assert ok[0].text.startswith("<html>")
    png = [r for r in by_type["response"] if r.http_status == 404]
    assert png[0].text is None and bytes(png[0].payload).startswith(b"\x89PNG")
    conv = by_type["conversion"][0]
    assert conv.text == "plain text é中"
    assert conv.content_language == "en"


def test_datasource_record_type_pushdown(spark, segment_dir):
    W.register(spark)
    df = (
        spark.read.format("warc").option("path", segment_dir).load()
        .where("record_type = 'conversion'")
    )
    rows = df.collect()
    assert len(rows) == 2 and all(r.record_type == "conversion" for r in rows)


def test_write_warc_shards_and_wet_documents(spark, sf_dir, tmp_path):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "wet")
    W.write_warc_shards(docs, out, n_shards=4, shard_key="doc_id")
    files = [f for f in os.listdir(out) if f.endswith(".wet.gz")]
    assert 1 <= len(files) <= 4
    got = W.wet_documents(spark, out)
    want = docs.select("doc_id", "lang", "text")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_shard_writes_are_deterministic(spark, sf_dir, tmp_path):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    W.write_warc_shards(docs, a, n_shards=2, shard_key="doc_id")
    W.write_warc_shards(docs, b, n_shards=2, shard_key="doc_id")
    fa = sorted(os.listdir(a))
    assert fa == sorted(os.listdir(b))
    for f in fa:
        with open(os.path.join(a, f), "rb") as x, open(os.path.join(b, f), "rb") as y:
            assert x.read() == y.read()


def test_roundtrip_query_matches_source(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans import pipeline

    got = pipeline.warc_roundtrip_docs(spark, sf_dir)
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table

    want = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


# ---------------------------------------------------------------------------
# property fuzz: arbitrary bodies/headers survive the writer->parser trip

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_hdr_val = st.text(
    alphabet=st.characters(blacklist_characters="\r\n", max_codepoint=0x2FF),
    max_size=40,
)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    bodies=st.lists(st.binary(max_size=300), min_size=1, max_size=8),
    uri=_hdr_val,
    gz=st.booleans(),
)
def test_fuzz_roundtrip_arbitrary_bodies(bodies, uri, gz):
    # bodies may contain CRLFCRLF, fake "WARC/" lines, gzip magic —
    # Content-Length framing must make the parser immune to all of it
    recs = [
        {
            "record_type": "resource",
            "record_id": f"<urn:fuzz:{i}>",
            "date": "2026-01-01T00:00:00Z",
            "target_uri": "u:" + uri.strip() if uri.strip() else None,
            "body": b,
        }
        for i, b in enumerate(bodies)
    ]
    buf = io.BytesIO()
    W.write_warc(recs, buf, gzip_per_record=gz)
    stream = (
        io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(buf.getvalue())))
        if gz
        else io.BytesIO(buf.getvalue())
    )
    out = list(W.parse_warc(stream, strict=True))
    assert [r["body"] for r in out] == bodies
    assert [r["headers"]["warc-record-id"] for r in out] == [
        f"<urn:fuzz:{i}>" for i in range(len(bodies))
    ]


def test_null_lang_written_and_roundtripped(spark, tmp_path):
    # a NULL lang row must write (language header omitted — optional
    # per WARC/1.1) and round-trip back as NULL, not crash the task
    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", None)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "nulllang")
    W.write_warc_shards(docs, out, n_shards=1, shard_key="doc_id")
    got = {r.doc_id: r.lang for r in W.wet_documents(spark, out).collect()}
    assert got == {1: "en", 2: None}
