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
    u = updates.alias("u")
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    # Resolve on match PRESENCE (u.key non-null after the outer join),
    # not per-column value nullness: an update row carrying an explicit
    # NULL must overwrite the target value, exactly like Delta MERGE's
    # "WHEN MATCHED THEN UPDATE SET *". coalesce(u.c, t.c) would leak
    # the stale target value through a NULL update column.
    matched = F.col(f"u.{key}").isNotNull()
    merged_cols = [
        F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key)
        if c == key
        else F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*merged_cols)
