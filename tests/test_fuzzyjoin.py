"""Edit-distance similarity join (operators/fuzzyjoin.py): blocked
candidates ≡ brute force at k=1 and k=2; deletion-neighborhood shape;
multiplicity counts; null domain; parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.fuzzyjoin import (
    deletion_neighborhood,
    edit_distance_pairs,
)

WORDS = [
    "gear", "gears", "gea", "bear", "gexr",    # ins/del/sub around "gear"
    "widget", "widgets", "wldget", "midget",
    "bolt", "boat", "colt",
    "completelydifferent",
]


def _brute(spark, values, k):
    df = spark.createDataFrame([(v,) for v in values], "name string")
    a, b = df.alias("a"), df.alias("b")
    return sorted(
        map(
            tuple,
            a.crossJoin(b)
            .where(F.col("a.name") < F.col("b.name"))
            .where(F.levenshtein("a.name", "b.name") <= k)
            .select("a.name", "b.name", F.levenshtein("a.name", "b.name"))
            .collect(),
        )
    )


@pytest.mark.parametrize("k", [1, 2])
def test_blocked_equals_brute_force(spark, k):
    df = spark.createDataFrame([(w,) for w in WORDS], "name string")
    got = sorted(
        (r.name_a, r.name_b, r.lev)
        for r in edit_distance_pairs(df, "name", k=k).collect()
    )
    assert got == _brute(spark, WORDS, k)
    assert all(1 <= lev <= k for _, _, lev in got)


def test_multiplicities_and_nulls(spark):
    rows = [("gear",)] * 3 + [("gears",)] * 2 + [(None,)] * 4
    df = spark.createDataFrame(rows, "name string")
    out = edit_distance_pairs(df, "name", k=1).collect()
    assert [(r.name_a, r.name_b, r.lev, r.n_a, r.n_b) for r in out] == [
        ("gear", "gears", 1, 3, 2)
    ]


def test_deletion_neighborhood_contents(spark):
    row = spark.range(1).select(
        deletion_neighborhood(F.lit("abc"), 1).alias("d1"),
        deletion_neighborhood(F.lit("abc"), 2).alias("d2"),
        deletion_neighborhood(F.lit(""), 1).alias("dempty"),
    ).first()
    assert sorted(row.d1) == ["ab", "abc", "ac", "bc"]
    assert set(row.d2) == {"abc", "ab", "ac", "bc", "a", "b", "c"}
    assert row.dempty == [""]


def test_k_validation(spark):
    df = spark.createDataFrame([("x",)], "name string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "name", k=0)
    with pytest.raises(ValueError):
        deletion_neighborhood(F.lit("x"), -1)


def test_levenshtein_parity_with_duckdb(spark):
    # the verify predicate must agree across engines or the oracle is
    # meaningless — parity holds on ASCII; non-ASCII is a KNOWN
    # divergence (DuckDB counts UTF-8 bytes, Spark counts characters),
    # which is why the oracle-checked query runs on an ASCII domain
    import duckdb

    pairs = [
        ("kitten", "sitting"), ("flaw", "lawn"), ("ab", "ba"),
        ("", "abc"), ("gear", "gear"),
    ]
    con = duckdb.connect()
    for x, y in pairs:
        want = con.sql("SELECT levenshtein(?, ?)", params=[x, y]).fetchone()[0]
        got = (
            spark.range(1)
            .select(F.levenshtein(F.lit(x), F.lit(y)).alias("d"))
            .first()
            .d
        )
        assert got == want, (x, y, got, want)
    # pin the divergence so a silent behavior change is caught
    assert con.sql("SELECT levenshtein('wörld', 'world')").fetchone()[0] == 2
    assert (
        spark.range(1)
        .select(F.levenshtein(F.lit("wörld"), F.lit("world")).alias("d"))
        .first()
        .d
        == 1
    )
