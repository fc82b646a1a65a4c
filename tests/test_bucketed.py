"""Bucketed-layout co-located joins: the write-once-shuffle-never
strategy for repeated fact⋈fact joins, proven at the plan level."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import bucketed as B


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # force the sort-merge path so the comparison is exchange-vs-none,
    # not broadcast-vs-none
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        B.write_bucketed(
            li.withColumnRenamed("l_orderkey", "okey"), "bkt_lineitem", "okey", 8
        )
        B.write_bucketed(
            orders.withColumnRenamed("o_orderkey", "okey"), "bkt_orders", "okey", 8
        )
        joined = B.bucketed_join(spark, "bkt_lineitem", "bkt_orders", "okey")
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # both sides read pre-bucketed
        assert "Bucketed: true" in p

        # control: the same join on the raw frames shuffles both sides
        raw = li.withColumnRenamed("l_orderkey", "okey").join(
            orders.withColumnRenamed("o_orderkey", "okey"), "okey"
        )
        assert "Exchange" in _plan(raw)

        # values survive the layout round-trip
        assert joined.count() == raw.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_date_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    B.write_date_partitioned(events, path, "ts")

    back = spark.read.parquet(path)
    one_day = back.where(F.col("event_date") == "2024-01-03")
    p = _plan(one_day)
    assert "PartitionFilters" in p and "event_date" in p
    # pruned scan reads only that day's directory
    n_day = one_day.count()
    expect = events.where(F.to_date("ts") == "2024-01-03").count()
    assert n_day == expect and n_day > 0


def test_dynamic_partition_pruning_on_dim_join(spark, sf_dir, tmp_path):
    """DPP: joining the date-partitioned fact to a FILTERED dim prunes
    fact partitions at runtime from the dim's join keys — the partition
    filter is not statically known, so only dynamic pruning can skip
    the other days' directories (the 100 TB star-join pattern)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day_dpp")
    B.write_date_partitioned(events, path, "ts")
    fact = spark.read.parquet(path)

    # a date dimension with an attribute; the ATTRIBUTE filter is what
    # the fact scan can't see statically — DPP pipes the surviving join
    # keys into the fact's partition filter at runtime
    dim = (
        events.select(F.to_date("ts").alias("event_date"))
        .distinct()
        .withColumn("is_promo_day", F.dayofmonth("event_date") <= 2)
    ).where(F.col("is_promo_day"))
    joined = fact.join(F.broadcast(dim), "event_date")
    p = _plan(joined)
    assert "dynamicpruning" in p.lower(), p[:2000]
    expect = (
        events.withColumn("event_date", F.to_date("ts"))
        .join(F.broadcast(dim), "event_date")
        .count()
    )
    assert joined.count() == expect and expect > 0
