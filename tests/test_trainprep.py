"""Edge-corpus parity for the corpus-preparation queries: documents the
synthetic testdata never produces — empty text, whitespace-only, single
token, unicode, exact duplicates at volume — must give identical
results from the Spark plans and their DuckDB oracles."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

from .oracle_harness import compare

EDGE_DOCS = (
    [(0, "", "en", "edge", 0),
     (1, "   ", "en", "edge", 3),
     (2, "one", "en", "edge", 3),
     (3, "two words", "en", "edge", 9),
     (4, "a b a b a b a b", "en", "edge", 15),
     (5, "naïve café déjà vu naïve café", "fr", "edge", 29),
     (97, "the bench mark gram set lives here", "en", "edge", 34)]
    # duplicate-heavy block: the same text 60 times (hot grams, one
    # giant exact-dup group) across two languages
    + [(100 + i, "copy pasta boiler plate text", "en" if i % 2 else "de",
        "dup", 28) for i in range(60)]
)

TRAINPREP = [
    "gopher_repetition",
    "corpus_boilerplate",
    "contamination_overlap",
    "lang_temperature_sample",
    "bigram_lm_score",
    "duplicate_spans",
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
