"""operators/ranks.py — exact global row numbers / ntile without the
single-task unpartitioned-window sort, verified row-for-row against
Spark's own global-window results (which are the semantics oracle at
test scale) including ties, nulls, and degenerate inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.ranks import (
    global_row_number,
    ntile_no_global_sort,
)


def _data(spark, n=500, with_ties=True, with_nulls=False):
    rows = []
    for i in range(n):
        v = float((i * 37) % 97) if with_ties else float(i)
        if with_nulls and i % 50 == 0:
            v = None
        rows.append((i, v))
    return spark.createDataFrame(rows, "id long, v double")


@pytest.mark.parametrize("desc", [False, True])
def test_global_row_number_matches_window(spark, desc):
    df = _data(spark)
    got, total = global_row_number(
        df, "v", tiebreaks=("id",), primary_desc=desc, n_buckets=16
    )
    assert total == 500
    order = [F.desc("v") if desc else F.asc("v"), F.asc("id")]
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


@pytest.mark.parametrize("k", [2, 4, 7])
def test_ntile_matches_window(spark, k):
    df = _data(spark, n=503)  # non-divisible: first n%k tiles get +1
    got = ntile_no_global_sort(
        df, k, "v", tiebreaks=("id",), primary_desc=True, n_buckets=16
    )
    want = df.withColumn(
        "tile", F.ntile(k).over(Window.orderBy(F.desc("v"), F.asc("id")))
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_heavy_tie_value_still_exact(spark):
    # one value dominating the distribution collapses buckets — ranks
    # must still match (in-bucket tie-break sorts the hot value)
    rows = [(i, 5.0 if i % 10 else float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    got, total = global_row_number(df, "v", ("id",), n_buckets=8)
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id"))).cast("long")
    )
    assert total == 300
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_nulls_pinned_to_last_bucket(spark):
    df = _data(spark, n=200, with_nulls=True)
    got, _ = global_row_number(df, "v", ("id",), n_buckets=8)
    # Spark default: nulls FIRST asc — ranks.py pins nulls to the LAST
    # bucket, so compare against NULLS LAST ordering explicitly
    want = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.orderBy(F.asc_nulls_last("v"), F.asc("id")))
        .cast("long"),
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_empty_and_tiny_inputs(spark):
    empty = spark.createDataFrame([], "id long, v double")
    got, total = global_row_number(empty, "v", ("id",))
    assert total == 0 and got.count() == 0
    one = spark.createDataFrame([(1, 2.0)], "id long, v double")
    tiled = ntile_no_global_sort(one, 4, "v")
    assert [r["tile"] for r in tiled.collect()] == [1]


def test_no_unpartitioned_window_in_plan(spark):
    import io
    from contextlib import redirect_stdout

    df = _data(spark)
    got, _ = global_row_number(df, "v", ("id",), n_buckets=16)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    # every Window node must carry a partition spec (the _gbkt bucket)
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "_gbkt" in line


def test_grouped_row_number_matches_window(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.ranks import (
        grouped_row_number,
    )

    rows = [
        (i, ["a", "b", "c"][i % 3], float((i * 31) % 23)) for i in range(450)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = grouped_row_number(
        df, ["g"], "v", tiebreaks=("id",), n_buckets=12,
        out_col="rn", count_col="n",
    )
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
        "n", F.count("*").over(Window.partitionBy("g")).cast("long")
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


@pytest.mark.parametrize("seed,dist", [
    (1, "uniform"), (2, "constant"), (3, "negative"), (4, "bimodal"),
])
def test_randomized_distributions_match_window(spark, seed, dist):
    """Seeded randomized cross-check of the two-phase rank machinery on
    adversarial value distributions (all-equal values collapse every
    bucket; negatives exercise the cut comparisons; bimodal leaves
    empty buckets)."""
    import random

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.ranks import (
        grouped_row_number,
    )

    rng = random.Random(seed)

    def val():
        if dist == "uniform":
            return rng.uniform(-50, 50)
        if dist == "constant":
            return 7.0
        if dist == "negative":
            return -abs(rng.gauss(0, 10))
        return rng.choice([-100.0, 100.0]) + rng.random()

    rows = [(i, ["x", "y"][i % 2], val()) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v double")

    got_g = grouped_row_number(df, ["g"], "v", ("id",), n_buckets=10)
    wg = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want_g = df.withColumn("rn", F.row_number().over(wg).cast("long"))
    assert got_g.orderBy("id").collect() == want_g.orderBy("id").collect()

    got, total = global_row_number(df, "v", ("id",), n_buckets=10)
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert total == 300
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_grouped_row_number_null_group_survives(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.ranks import (
        grouped_row_number,
    )

    rows = [(1, "a", 2.0), (2, None, 3.0), (3, None, 1.0), (4, "a", 5.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = grouped_row_number(df, ["g"], "v", ("id",), count_col="n")
    assert got.count() == 4
    by_id = {r["id"]: (r["rn"], r["n"]) for r in got.collect()}
    assert by_id == {1: (1, 2), 2: (2, 2), 3: (1, 2), 4: (2, 2)}


def test_non_numeric_key_rejected(spark):
    # A string/date key casts to NULL-per-row under the double bucket
    # cast, silently collapsing every row into one bucket — the r7
    # advisor asked for a loud error instead.
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.prefix import (
        grouped_prefix_sum,
    )
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.ranks import (
        global_row_number,
        grouped_row_number,
    )

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01")], "id long, s string, d string"
    ).withColumn("d", F.to_date("d"))

    for bad in ("s", "d"):
        with pytest.raises(TypeError, match="numeric or timestamp"):
            global_row_number(df, bad)
        with pytest.raises(TypeError, match="numeric or timestamp"):
            grouped_row_number(df, ["s"], bad)
        with pytest.raises(TypeError, match="numeric or timestamp"):
            grouped_prefix_sum(df, ["s"], bad, F.lit(1))

    # timestamp keys stay accepted
    ts = df.withColumn("t", F.col("d").cast("timestamp"))
    got, total = global_row_number(ts, "t")
    assert total == 1
