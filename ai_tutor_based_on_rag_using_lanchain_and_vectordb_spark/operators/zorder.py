"""Z-order (Morton) clustering: multi-column data layout for scan
pruning.

A table range-partitioned and sorted by ONE key prunes scans on that
key only; a 100 TB fact table queried by BOTH customer and date ranges
needs a layout where parquet min/max footer stats are tight on both
columns at once.  Interleaving the bits of the two keys (the Morton /
Z-order curve) gives a single sort key whose contiguous ranges are
small rectangles in (x, y) space — every file then covers a narrow
span of *each* dimension, and either predicate prunes most files at
planning time (the Delta/Iceberg OPTIMIZE ZORDER technique, built here
from plain DataFrame ops).

The key is pure integer bit arithmetic (shift/mask/or), evaluated
JVM-side inside whole-stage codegen and mirrored verbatim in the
DuckDB oracle; no UDF, no driver state.  The clustered write is
``repartitionByRange(zkey)`` + ``sortWithinPartitions(zkey)`` — one
range shuffle, the same cost as any global sort-write, with balanced
output files from the range partitioner's sampled bounds.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_key", "morton_sql", "write_zordered"]


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = bit i of x, bit 2i+1 = bit i of y. Values are
    masked to ``bits`` first, so out-of-range inputs wrap rather than
    collide across dimensions."""
    mask = (1 << bits) - 1
    x = x.cast("long").bitwiseAND(F.lit(mask))
    y = y.cast("long").bitwiseAND(F.lit(mask))
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zkey")


def morton_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (for the DuckDB oracle):
    plain divide/modulo/multiply arithmetic — no dialect bit builtins,
    so the expression is portable and provably the same function."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x_expr} AS BIGINT) % {mask + 1})"
    ys = f"(CAST({y_expr} AS BIGINT) % {mask + 1})"
    terms = []
    for i in range(bits):
        terms.append(f"(({xs} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ys} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Cluster ``df`` on the Morton key of (x_col, y_col) and write
    parquet: each output file covers a compact Z-curve range, so its
    footer min/max stats are tight on BOTH columns and a reader's
    range predicate on either prunes whole files."""
    keyed = df.withColumn("_z", morton_key(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
