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


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective,
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Type-2 slowly-changing-dimension maintenance (Kimball SCD2, the
    history-preserving MERGE): rows of ``dim`` carry ``valid_from`` /
    ``valid_to`` / ``is_current``; an update whose attributes differ
    from the key's current row CLOSES that row (valid_to = effective,
    is_current = false) and INSERTS a new current row; identical
    updates are no-ops; unknown keys insert. One full-outer join on the
    key — history rows pass through untouched, so the shuffle carries
    only current rows + updates regardless of how deep history grows.
    ``effective`` is one batch-level literal (deterministic, replayable).
    Open intervals end at ``open_end`` (the Kimball high-date sentinel)
    rather than NULL — range predicates like ``BETWEEN valid_from AND
    valid_to`` then need no null branch, and engines that stringify
    null dates differently stay hash-comparable.

    Precondition: at most one is_current row per key in ``dim`` — the
    invariant this function itself maintains from a deduplicated
    initial load (updates are checked for duplicate keys below; a dim
    corrupted by an outside writer would fan the join out).
    """
    if not attrs:
        raise ValueError("scd2_apply needs at least one tracked attribute")
    full = attrs + ["valid_from", "valid_to", "is_current"]
    missing = [c for c in [key] + full if c not in dim.columns]
    if missing:
        raise ValueError(f"dim lacks columns: {missing}")
    # one update row per key, like SQL MERGE's multiple-match error: a
    # duplicated key would fan the full-outer join out and emit several
    # is_current rows, silently breaking the single-current invariant
    dup = (
        updates.groupBy(key).count().where(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"scd2_apply: duplicate update rows for {key}={dup[0][key]}"
        )
    # Partition WITHOUT losing rows: a NULL is_current (or a NULL key,
    # which could never equi-join) fails BOTH `where(c)` and `where(~c)`
    # under SQL null semantics — a history-preserving merge must never
    # silently drop such rows, so they ride the passthrough side.
    active = F.col("is_current") & F.col(key).isNotNull()
    cur = dim.where(active).alias("t")
    hist = dim.where(~F.coalesce(active, F.lit(False)))
    u = updates.withColumn("_u_present", F.lit(True)).alias("u")
    j = cur.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    matched = F.col("u._u_present").isNotNull() & F.col(f"t.{key}").isNotNull()
    differs = None
    for c in attrs:
        d = ~F.col(f"t.{c}").eqNullSafe(F.col(f"u.{c}"))
        differs = d if differs is None else (differs | d)
    changed = matched & differs
    insert_only = F.col("u._u_present").isNotNull() & F.col(f"t.{key}").isNull()

    def t_row(valid_to, current):
        return [F.col(f"t.{key}").alias(key)] + [
            F.col(f"t.{c}").alias(c) for c in attrs
        ] + [
            F.col("t.valid_from").alias("valid_from"),
            valid_to.alias("valid_to"),
            current.alias("is_current"),
        ]

    u_row = [F.col(f"u.{key}").alias(key)] + [
        F.col(f"u.{c}").alias(c) for c in attrs
    ] + [
        F.lit(effective).cast("date").alias("valid_from"),
        F.lit(open_end).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ]

    kept = j.where(~changed & F.col(f"t.{key}").isNotNull()).select(
        *t_row(F.col("t.valid_to"), F.lit(True))
    )
    closed = j.where(changed).select(
        *t_row(F.lit(effective).cast("date"), F.lit(False))
    )
    fresh = j.where(changed | insert_only).select(*u_row)
    return hist.select(key, *full).unionByName(kept).unionByName(
        closed
    ).unionByName(fresh)
