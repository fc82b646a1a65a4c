"""Edge-corpus parity for the corpus-preparation queries: documents the
synthetic testdata never produces — empty text, whitespace-only, single
token, unicode, exact duplicates at volume — must give identical
results from the Spark plans and their DuckDB oracles."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

from .oracle_harness import compare

EDGE_DOCS = (
    [(0, "", "en", "edge", 0),
     (1, "   ", "en", "edge", 3),
     (2, "one", "en", "edge", 3),
     (3, "two words", "en", "edge", 9),
     (4, "a b a b a b a b", "en", "edge", 15),
     (5, "naïve café déjà vu naïve café", "fr", "edge", 29),
     (97, "the bench mark gram set lives here", "en", "edge", 34),
     # a 60-char run shared by two docs (> SPAN_L): the keep-first
     # span-scrub must cut it from doc 201 (the later copy) only
     (200, "the quick brown fox jumps over the lazy dog again and again"
           " alpha", "en", "edge", 66),
     (201, "prefix text the quick brown fox jumps over the lazy dog"
           " again and again", "en", "edge", 72)]
    # duplicate-heavy block: the same text 60 times (hot grams, one
    # giant exact-dup group) across two languages
    + [(100 + i, "copy pasta boiler plate text", "en" if i % 2 else "de",
        "dup", 28) for i in range(60)]
    # self-overlapping (periodic) duplicates: the sharp case where the
    # WINDOW-granular scrub destroys even the kept-first copy (keeps 1
    # char of doc 300) while the extents form keeps the full first
    # 40-char gram intact
    + [(300, "z" * 160, "en", "periodic", 160),
       (301, "z" * 80, "en", "periodic", 80)]
)

TRAINPREP = [
    "gopher_repetition",
    "corpus_boilerplate",
    "contamination_overlap",
    "lang_temperature_sample",
    "bigram_lm_score",
    "duplicate_spans",
    "doc_span_scrubbed",
    "doc_span_scrubbed_sa",
    "dsir_importance_sample",
    "quality_classifier_filter",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", TRAINPREP)
def test_edge_corpus_matches_oracle(spark, edge_dir, name):
    sdf = E.queries()[name](spark, edge_dir)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    oracle_pdf = con.sql(E.oracle_sql()[name]).df()
    problems = compare(sdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_span_scrub_keep_first_copy(spark, edge_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in E.queries()["doc_span_scrubbed"](spark, edge_dir).collect()
    }
    # doc 200 holds the corpus-first copy of the shared 60-char run:
    # untouched; doc 201's copy is cut, leaving only its unique prefix
    assert rows[200]["n_spans"] == 0
    assert rows[200]["scrubbed"].startswith("the quick brown fox")
    assert rows[201]["n_spans"] == 1
    assert rows[201]["removed_chars"] > 0
    assert "lazy dog" not in rows[201]["scrubbed"]
    assert rows[201]["scrubbed"].startswith("prefix text")
    # length conservation on every doc: scrubbed + removed == the
    # normalized input length (lower(trim(text)) is the scrub domain)
    norm_len = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{edge_dir}/documents.parquet")
        .select(
            "doc_id",
            F.length(F.lower(F.trim("text"))).alias("n"),
        )
        .collect()
    }
    for r in rows.values():
        assert (
            len(r["scrubbed"]) + r["removed_chars"] == norm_len[r["doc_id"]]
        ), r["doc_id"]


def test_dsir_prefers_target_like_docs(spark, edge_dir):
    # the target slice (doc_id % 11 == 0) is dominated by the
    # "copy pasta" dup block (ids 110..154) - raw dup-block docs share
    # its grams, so they must out-rank the unrelated edge docs
    out = E.queries()["dsir_importance_sample"](spark, edge_dir).collect()
    assert out, "sample is empty"
    llr = {r["doc_id"]: r["llr"] for r in out}
    dup_block = [d for d in llr if 100 <= d < 160]
    other = [d for d in llr if d < 100]
    assert dup_block, "no dup-block docs sampled"
    if other:
        assert min(llr[d] for d in dup_block) > max(llr[d] for d in other)


def test_span_scrub_domain_guards_are_loud(spark):
    import pytest

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.trainprep import (
        _SPAN_MAX_DOC_ID,
        span_scrub,
    )

    # doc_id outside the packing domain must raise, not silently
    # mis-order the keep-first rule. Two docs sharing a 60-char run so
    # the guarded key expression is actually evaluated.
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(_SPAN_MAX_DOC_ID + 1, shared + " alpha"), (1, "pre " + shared)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    # under ANSI (Spark 4 default) the packing multiply itself
    # overflows loudly before the assert evaluates; under non-ANSI the
    # multiply wraps and the in-plan assert fires — either way the run
    # FAILS instead of silently mis-ordering
    with pytest.raises(
        Exception, match="keep-first key packing|ARITHMETIC_OVERFLOW"
    ):
        span_scrub(df).collect()


def test_span_scrub_extents_protects_first_copy(spark, edge_dir):
    # the divergence fixture: periodic text where the window form
    # destroys the kept copy and the extents form preserves it
    win = {
        r["doc_id"]: r.asDict()
        for r in E.queries()["doc_span_scrubbed"](spark, edge_dir).collect()
    }
    ext = {
        r["doc_id"]: r.asDict()
        for r in E.queries()["doc_span_scrubbed_sa"](spark, edge_dir).collect()
    }
    # window form: doc 300 keeps only the first char — the duplicated
    # 40-gram "z"*40 vanishes from the whole corpus
    assert win[300]["scrubbed"] == "z"
    assert "z" * 40 not in win[300]["scrubbed"] + win[301]["scrubbed"]
    # extents form: the corpus-first copy of the gram survives INTACT
    assert ext[300]["scrubbed"] == "z" * 40
    assert ext[300]["removed_chars"] == 120
    assert ext[301]["scrubbed"] == ""
    # same keep-first rule on the non-overlapping case: identical to
    # the window form (doc 200 untouched, doc 201's later copy cut)
    assert ext[200]["n_spans"] == 0
    assert ext[200]["scrubbed"] == win[200]["scrubbed"]
    assert "lazy dog" not in ext[201]["scrubbed"]
    assert ext[201]["scrubbed"].startswith("prefix text")
    # length conservation holds for the extents form too
    norm_len = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{edge_dir}/documents.parquet")
        .select("doc_id", F.length(F.lower(F.trim("text"))).alias("n"))
        .collect()
    }
    for r in ext.values():
        assert (
            len(r["scrubbed"]) + r["removed_chars"] == norm_len[r["doc_id"]]
        ), r["doc_id"]


def test_span_scrub_extents_every_dup_gram_survives(spark, edge_dir):
    # the semantic guarantee the window form lacks: every duplicated
    # 40-gram's corpus-first occurrence is a substring of its doc's
    # scrubbed output
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.trainprep import (
        SPAN_L,
        _SPAN_POS_SHIFT,
    )

    docs = {
        r["doc_id"]: (r["text"] or "").lower().strip()
        for r in spark.read.parquet(f"{edge_dir}/documents.parquet").collect()
    }
    ext = {
        r["doc_id"]: r["scrubbed"]
        for r in E.queries()["doc_span_scrubbed_sa"](spark, edge_dir).collect()
    }
    first = {}
    for d in sorted(docs):
        t = docs[d]
        for i in range(len(t) - SPAN_L + 1):
            g = t[i : i + SPAN_L]
            first.setdefault(g, []).append(d * _SPAN_POS_SHIFT + (i + 1))
    for g, keys in first.items():
        if len(keys) < 2:
            continue
        kd = min(keys) // _SPAN_POS_SHIFT
        assert g in ext[kd], (g[:20], kd)
