"""Scalar function parity with the reference's defensive string
handling (F2, F6-F10, F16)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions import text as TX


def _one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "raw string")
    return df.select(col_expr(F.col("raw")).alias("out")).collect()[0]["out"]


def test_sanitize_filename_cases(spark):
    # reference backend/file_utils.py:30-57 behaviors
    cases = {
        "../evil.pdf": "evil.pdf",
        "dir/sub/naïve file.PDF": "na_ve_file.PDF",
        ".hidden.docx": "file_.hidden.docx",
        "": "unnamed_file",
        "ok-name_1.html": "ok-name_1.html",
        "sp ace.pdf": "sp_ace.pdf",
    }
    for raw, want in cases.items():
        assert _one(spark, TX.sanitize_filename, raw) == want, raw


def test_file_suffix_and_extension_gate(spark):
    assert _one(spark, TX.file_suffix, "A/B/Report.PDF") == ".pdf"
    assert _one(spark, TX.file_suffix, "noext") == ""
    df = spark.createDataFrame(
        [("a.pdf",), ("b.docx",), ("c.html",), ("d.exe",), ("e",)], "raw string"
    )
    ok = df.where(TX.has_allowed_extension(F.col("raw"))).collect()
    assert sorted(r["raw"] for r in ok) == ["a.pdf", "b.docx", "c.html"]


def test_parse_llm_response_fixtures(spark):
    # FIXTURES.md raw_llm_responses coverage
    cases = [
        ('{"answer": "Paris", "emotion": "happy"}', ("Paris", "happy")),
        ('```json\n{"answer": "42", "emotion": "thinking"}\n```', ("42", "thinking")),
        ("Here's the answer: {\"answer\": \"yes\", \"emotion\": \"explaining\"}",
         ("yes", "explaining")),
        ('noise before {"answer": "mid", "emotion": "encouraging"} noise after',
         ("mid", "encouraging")),
        ('{"answer": "no emotion given"}', ("no emotion given", "neutral")),
        ('{"answer": "bad emotion", "emotion": "furious"}', ("bad emotion", "neutral")),
        ("just plain text, unparseable", ("just plain text, unparseable", "neutral")),
    ]
    for raw, (want_answer, want_emotion) in cases:
        out = _one(spark, TX.parse_llm_response, raw)
        assert out["answer"] == want_answer, raw
        assert out["emotion"] == want_emotion, raw


def test_strip_markdown(spark):
    raw = "# Title\n\nSome **bold** and _em_ text with `code` and [link](http://x) \n> quote"
    out = _one(spark, TX.strip_markdown, raw)
    assert "**" not in out and "#" not in out and "`" not in out
    assert "link" in out and "http://x" not in out


def test_preview(spark):
    out = _one(spark, TX.preview, "x" * 80)
    assert out == "x" * 50 + "..."
