"""PII scrub + normalization unit behavior (functions/scrub.py); the
sf-corpus parity is covered by the doc_pii_scrub / doc_normalized
oracle rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions import scrub as SC


def _one(spark, text: str, col):
    return (
        spark.createDataFrame([(text,)], "t string")
        .select(col(F.col("t")).alias("out"))
        .collect()[0]["out"]
    )


def test_scrub_all_categories(spark):
    raw = (
        "mail a.b+c%d@sub.example.co.uk call +1-555-123-9876 "
        "ssn 123-45-6789 host 192.168.0.1 see https://x.io/p?q=1 done"
    )
    out = _one(spark, raw, SC.scrub_pii)
    assert out == (
        "mail [EMAIL] call [PHONE] ssn [SSN] host [IP] see [URL] done"
    )


def test_scrub_email_before_phone_order(spark):
    # digits inside a mailbox name must vanish with the email, not be
    # half-eaten by the phone/ssn rules
    out = _one(spark, "x 555-12-3456789@corp.org y", SC.scrub_pii)
    assert out == "x [EMAIL] y"


def test_scrub_leaves_clean_text_alone(spark):
    clean = "nothing sensitive here just words and 42 numbers"
    assert _one(spark, clean, SC.scrub_pii) == clean


def test_normalize_text(spark):
    out = _one(spark, "  Hello,   WORLD!! (it's fine)  ", SC.normalize_text)
    assert out == "hello world it s fine"


def test_normalized_dedup_key_collapses_variants(spark):
    a = _one(spark, "The quick brown fox.", SC.normalize_text)
    b = _one(spark, "  the QUICK  brown fox ", SC.normalize_text)
    assert a == b == "the quick brown fox"
