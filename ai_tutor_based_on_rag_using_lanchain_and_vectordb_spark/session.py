"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (and harmless at test scale):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast selection replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` sized from the local core count; on a
  real cluster AQE coalesces down from a deliberately high initial value.
- Session timezone pinned to UTC so timestamp semantics are identical to
  the DuckDB correctness oracle (naive / UTC storage).
- Arrow enabled for every pandas interchange path (pandas_udf,
  mapInPandas, toPandas) — the engine's Python stages are all batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "ai-tutor-spark-engine") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    return spark


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Settings the driver-provided session may lack but correctness needs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
