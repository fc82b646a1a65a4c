"""MERGE / upsert semantics on plain Parquet tables.

The reference mutates SQLite rows in place (INSERT OR REPLACE-style
catalog maintenance); lakehouse engines use MERGE INTO. Without a
transactional table format in this container, the engine expresses
merge as the canonical full-outer rewrite:

    matched  → take the update's columns
    new      → insert the update row
    missing  → keep the target row

which is exactly what Delta's MERGE compiles to under the hood (join on
the key + per-row case). At scale the join broadcasts when updates are
small, or shuffles on the key both sides otherwise — either way one
pass over the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows of ``updates`` win on key collision; all other target rows
    pass through; brand-new update keys are inserted. Schemas must
    match."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: {sorted(target.columns)} vs {sorted(updates.columns)}"
        )
    t = target.alias("t")
    # Presence marker, not key nullness: a NULL-key update row never
    # matches the equi-join (SQL null semantics, same as Delta MERGE's ON
    # clause) and must be INSERTED with its own payload — resolving on
    # u.key IS NOT NULL would take t.* (all NULL) for it instead. The
    # marker also keeps the matched branch correct when an update carries
    # explicit NULLs: "WHEN MATCHED THEN UPDATE SET *" overwrites, so no
    # coalesce(u.c, t.c) which would leak stale target values through.
    u = updates.withColumn("_u_present", F.lit(True)).alias("u")
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    matched = F.col("u._u_present").isNotNull()
    merged_cols = [
        F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*merged_cols)
