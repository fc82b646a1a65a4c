"""operators/prefix.py — two-phase grouped prefix sums verified
row-for-row against the plain per-group running window (the semantics
oracle at test scale), plus the plan property the operator exists for:
no window partitioned by the group alone."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.prefix import (
    grouped_prefix_sum,
)


def _data(spark, n=600, groups=("en", "de", "fr")):
    rows = [
        (i, groups[i % len(groups)], float((i * 13) % 29))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, g string, v double")


def test_matches_plain_running_window(spark):
    df = _data(spark)
    got = grouped_prefix_sum(df, ["g"], "id", F.col("v"), n_buckets=16)
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn(
        "cum_before", F.coalesce(F.sum("v").over(w), F.lit(0.0))
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_skewed_group_and_single_bucket(spark):
    # one group holds 90% of rows; also exercise the no-cuts path
    rows = [(i, "hot" if i % 10 else "cold", 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = grouped_prefix_sum(df, ["g"], "id", F.col("v"), n_buckets=1)
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn(
        "cum_before", F.coalesce(F.sum("v").over(w), F.lit(0.0))
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, g string, v double")
    assert grouped_prefix_sum(df, ["g"], "id", F.col("v")).count() == 0


def test_no_group_only_window_in_plan(spark):
    import io
    from contextlib import redirect_stdout

    df = _data(spark)
    got = grouped_prefix_sum(df, ["g"], "id", F.col("v"), n_buckets=16)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    saw_window = False
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            saw_window = True
            # every window over row data must include the bucket key;
            # the offsets window runs over the small partial table,
            # which aggregates on (_pbkt) too — so _pbkt appears in
            # every window's context either way
            assert "_pbkt" in line
    assert saw_window


def test_randomized_values_and_many_groups(spark):
    import random

    rng = random.Random(9)
    rows = [
        (i, f"g{i % 17}", float(rng.randint(0, 1000)))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = grouped_prefix_sum(df, ["g"], "id", F.col("v"), n_buckets=7)
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn(
        "cum_before", F.coalesce(F.sum("v").over(w), F.lit(0.0))
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_null_group_rows_survive(spark):
    rows = [(1, "a", 2.0), (2, None, 3.0), (3, None, 4.0), (4, "a", 5.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = grouped_prefix_sum(df, ["g"], "id", F.col("v"))
    assert got.count() == 4
    by_id = {r["id"]: r["cum_before"] for r in got.collect()}
    assert by_id == {1: 0.0, 2: 0.0, 3: 3.0, 4: 2.0}

def test_exact_mode_beyond_double_precision(spark):
    # values whose running total exceeds 2^53: the default double
    # accumulator rounds 2^53+1 → 2^53, the exact decimal(38,0) mode
    # must carry every unit (the ADVICE-r10 drift scenario)
    big = 2**53 + 1
    rows = [(i, "g", big) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = grouped_prefix_sum(
        df, ["g"], "id", F.col("v"), n_buckets=2, exact=True
    )
    by_id = {r["id"]: int(r["cum_before"]) for r in got.collect()}
    assert by_id == {i: (i - 1) * big for i in range(1, 5)}
    # and the dtype is the exact decimal, not a float
    dt = dict(got.dtypes)["cum_before"]
    assert dt == "decimal(38,0)"


def test_exact_mode_matches_plain_window_on_integers(spark):
    rows = [(i, f"g{i % 3}", (i * 7) % 23) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = grouped_prefix_sum(df, ["g"], "id", F.col("v"), n_buckets=8, exact=True)
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn(
        "cum_before", F.coalesce(F.sum("v").over(w), F.lit(0))
    )
    g = {r["id"]: int(r["cum_before"]) for r in got.collect()}
    x = {r["id"]: int(r["cum_before"]) for r in want.collect()}
    assert g == x
