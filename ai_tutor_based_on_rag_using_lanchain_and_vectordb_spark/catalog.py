"""Table loading for the driver testdata directories.

Reads are always schema-pinned (schemas.py) so the scan stays vectorized
and column-prunable; ``spark.read.parquet`` + explicit ``.schema`` means
Catalyst can push predicates to Parquet row groups and prune columns to
exactly the ``ReadSchema`` the query needs.

Timestamp note: the driver parquet stores TIMESTAMP(NANOS,false), which
Spark's reader rejects as a timestamp type. We read those columns as
raw INT64 nanos (``spark.sql.legacy.parquet.nanosAsLong``) and convert
with ``timestamp_micros(ns div 1000)`` — identical truncation semantics
to DuckDB's nanos→micros read, so oracle comparisons line up exactly.
The conversion is a codegen-inline projection; pushdown on the derived
timestamp still works for partition-style pruning because the filter is
applied to the long column after Catalyst folds the comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import schemas

TABLE_NAMES = tuple(schemas.DRIVER_TABLES)


# Columns physically stored as TIMESTAMP(NANOS) — Spark rejects the
# type, so these read as INT64 nanos and convert via timestamp_micros.
# (orders.o_orderdate / lineitem.l_shipdate are timestamp[ms]: native.)
NANOS_TS_COLUMNS = {"events": ("ts",)}


def _read_schema(name: str) -> tuple[T.StructType, tuple[str, ...]]:
    """Physical read schema (nanos timestamps as longs) + the list of
    columns needing long→timestamp conversion."""
    nanos = NANOS_TS_COLUMNS.get(name, ())
    fields = [
        T.StructField(f.name, T.LongType()) if f.name in nanos else f
        for f in schemas.DRIVER_TABLES[name].fields
    ]
    return T.StructType(fields), nanos


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_nanos_conf(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_nanos_conf(spark)
    read_schema, ts_cols = _read_schema(name)
    df = spark.read.schema(read_schema).parquet(table_path(sf_dir, name))
    for c in ts_cols:
        # integer division: double division would lose precision at
        # nanosecond-epoch magnitudes (> 2^53)
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for spark.sql paths)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
