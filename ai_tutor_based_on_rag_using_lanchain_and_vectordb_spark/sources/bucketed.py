"""Bucketed-table layout: the co-located join strategy for repeated
big⋈big joins at 100 TB.

A fact⋈fact join (lineitem ⋈ orders on orderkey) shuffles BOTH sides
every query. Writing each table bucketed (`bucketBy(n, key)` +
`sortBy(key)` parquet) pins a hash-partitioned, per-bucket-sorted
layout on disk; Spark's scan then reports the bucket spec as its output
partitioning, and a join on the bucket key needs NO exchange on either
side (and with sortBy, no sort either) — the shuffle is paid once at
write time and amortized over every subsequent join, the same trade as
Hive bucketing / Iceberg bucket partition transforms.

Bucket counts should be sized so one bucket of the larger table fits an
executor's memory at the target scale (100 TB / 2 GB-ish buckets ⇒
~50k buckets; local tests use 8).

Plan-shape proof lives in tests/test_bucketed.py: the bucketed join
plan contains zero Exchange operators, the unbucketed one contains two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed managed parquet table (saveAsTable —
    bucket metadata lives in the session catalog, which is what lets the
    planner trust the layout)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    exchange on either side when the bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), key)


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, part_col: str = "event_date"
) -> None:
    """Persist with a derived date partition column (`partitionBy`
    parquet layout). A time-range filter on ``part_col`` then prunes
    whole directories at planning time (PartitionFilters in the scan) —
    at 100 TB this is the difference between scanning a day and
    scanning a year. Plan proof: tests/test_bucketed.py."""
    from pyspark.sql import functions as F

    (
        df.withColumn(part_col, F.to_date(ts_col))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(path)
    )
