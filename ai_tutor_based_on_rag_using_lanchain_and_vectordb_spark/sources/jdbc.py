"""JDBC interop (SURVEY §2.1 S4): the reference keeps its chat log and
document catalog in SQLite behind hand-written SQL
(backend/db_utils.py:110-124, 253-257). The engine's canonical store is
parquet, but true RDBMS interop is ``spark.read.jdbc`` — this module
wraps it with the scale options that matter:

- **Partitioned reads.** A bare JDBC read is ONE task pulling the whole
  table through one connection — useless at scale. ``read_table`` takes
  the numeric primary key (the reference's ``id INTEGER PRIMARY KEY``)
  as ``partition_column`` and fans the scan out across
  ``num_partitions`` range-predicated queries.
- **Predicate pushdown.** Filters on the returned DataFrame compile
  into the generated JDBC ``WHERE`` clause (Catalyst JDBC pushdown), so
  ``WHERE session_id = ?`` (db_utils.py:113) stays in the database.
- **Batched writes.** ``write_table`` appends with ``batchsize`` so the
  round trip isn't row-at-a-time autocommit.

Tested against embedded Apache Derby (the JDBC engine bundled with
Spark's jars) — the same code path works for any JDBC URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL for a database directory path."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_path}{suffix}"


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str = DERBY_DRIVER,
    batchsize: int = 1000,
    column_types: str | None = None,
) -> None:
    """S5-equivalent sink: ``INSERT INTO {table} ...`` (reference
    backend/db_utils.py:80-86) as a batched JDBC append.

    ``column_types`` (``createTableColumnTypes`` DDL fragment, e.g.
    ``"session_id VARCHAR(100)"``) matters for engines like Derby whose
    default StringType mapping is CLOB — CLOB columns reject pushed
    equality predicates, so bounded TEXT columns (the reference caps
    session_id at 100 and queries at 2000 chars, backend/models.py:25-61)
    should be declared VARCHAR."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
    )
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.mode(mode).save()


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S4 scan: ``SELECT ... FROM {table}`` with optional range
    partitioning on a numeric key column. When bounds are omitted they
    are probed with one tiny min/max query (driver-side, O(1) rows)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            bounds = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "dbtable",
                    # the writer creates columns as quoted (case-exact)
                    # identifiers, so the probe must quote them too
                    f'(SELECT MIN("{partition_column}") AS lo, '
                    f'MAX("{partition_column}") AS hi FROM {table}) b',
                )
                .option("driver", driver)
                .load()
                .collect()[0]
            )
            lower_bound = bounds["LO"] if bounds["LO"] is not None else 0
            upper_bound = bounds["HI"] if bounds["HI"] is not None else 1
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(max(upper_bound, lower_bound + 1)))
        )
    return reader.load()
