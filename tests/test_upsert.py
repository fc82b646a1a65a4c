"""MERGE/upsert semantics (operators/upsert.py): matched rows take the
update's columns wholesale — including explicit NULLs — matching Delta
MERGE's "WHEN MATCHED THEN UPDATE SET *"."""

from __future__ import annotations

import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.upsert import (
    merge_upsert,
)


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "old-a", 10), (2, "old-b", 20), (3, "old-c", 30)],
        "id long, name string, size long",
    )
    updates = spark.createDataFrame(
        [(2, None, 99), (4, "new-d", 40)],
        "id long, name string, size long",
    )
    return target, updates


def test_matched_update_overwrites_with_null(spark):
    target, updates = _frames(spark)
    out = {r["id"]: r for r in merge_upsert(target, updates, "id").collect()}
    assert len(out) == 4
    assert out[2]["name"] is None  # explicit NULL wins on match
    assert out[2]["size"] == 99
    assert out[1]["name"] == "old-a"  # unmatched target untouched
    assert out[4]["name"] == "new-d"  # brand-new key inserted


def test_null_key_update_row_is_inserted_with_payload(spark):
    """A NULL-key update row never matches the equi-join (SQL null
    semantics, same as Delta MERGE's ON clause) → it must be INSERTED
    carrying its own payload, not collapse to an all-NULL row. NULL-key
    target rows likewise pass through untouched."""
    target = spark.createDataFrame(
        [(1, "old-a", 10), (None, "null-t", 70)],
        "id long, name string, size long",
    )
    updates = spark.createDataFrame(
        [(None, "null-u", 80), (1, "new-a", 11)],
        "id long, name string, size long",
    )
    rows = merge_upsert(target, updates, "id").collect()
    assert len(rows) == 3
    by_name = {r["name"]: r for r in rows}
    assert by_name["null-u"]["size"] == 80 and by_name["null-u"]["id"] is None
    assert by_name["null-t"]["size"] == 70  # target null-key row kept
    assert by_name["new-a"]["size"] == 11  # matched row updated


def test_schema_mismatch_rejected(spark):
    target, updates = _frames(spark)
    with pytest.raises(ValueError):
        merge_upsert(target, updates.drop("size"), "id")


# ------------------------------------------------------------------ SCD2


def _scd2_frames(spark):
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [(1, "a", "2024-01-01", "9999-12-31", True),
         (2, "b", "2024-01-01", "9999-12-31", True),
         (3, None, "2024-01-01", "9999-12-31", True),
         # pre-existing history row for key 1
         (1, "old", "2023-01-01", "2024-01-01", False)],
        "id long, attr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "id", "attr",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
        "is_current",
    )
    return dim


def test_scd2_change_closes_and_inserts(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.upsert import scd2_apply

    dim = _scd2_frames(spark)
    updates = spark.createDataFrame(
        [(1, "a2"),   # changed → close + insert
         (2, "b"),    # identical → no-op
         (3, None),   # null == null (eqNullSafe) → no-op
         (9, "new")], # unknown key → insert
        "id long, attr string",
    )
    out = scd2_apply(dim, updates, "id", ["attr"], "2024-06-01")
    rows = {(r["id"], r["attr"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
            for r in out.collect()}
    assert rows == {
        (1, "old", "2023-01-01", "2024-01-01", False),  # history untouched
        (1, "a", "2024-01-01", "2024-06-01", False),    # closed
        (1, "a2", "2024-06-01", "9999-12-31", True),    # new current
        (2, "b", "2024-01-01", "9999-12-31", True),     # no-op
        (3, None, "2024-01-01", "9999-12-31", True),    # null-safe no-op
        (9, "new", "2024-06-01", "9999-12-31", True),   # insert
    }


def test_scd2_missing_columns_rejected(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.upsert import scd2_apply

    dim = _scd2_frames(spark).drop("is_current")
    updates = spark.createDataFrame([(1, "x")], "id long, attr string")
    with pytest.raises(ValueError, match="dim lacks"):
        scd2_apply(dim, updates, "id", ["attr"], "2024-06-01")


def test_scd2_duplicate_update_keys_rejected(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.upsert import scd2_apply

    dim = _scd2_frames(spark)
    updates = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, attr string"
    )
    with pytest.raises(ValueError, match="duplicate update rows"):
        scd2_apply(dim, updates, "id", ["attr"], "2024-06-01")


def test_scd2_empty_attrs_rejected(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.upsert import scd2_apply

    dim = _scd2_frames(spark)
    updates = spark.createDataFrame([(1, "x")], "id long, attr string")
    with pytest.raises(ValueError, match="at least one tracked"):
        scd2_apply(dim, updates, "id", [], "2024-06-01")


def test_scd2_null_flag_rows_pass_through(spark):
    """A NULL is_current (or NULL key) row fails both where(c) and
    where(~c) under SQL null semantics — it must ride the passthrough
    side, never silently vanish from a history-preserving merge."""
    from pyspark.sql import functions as F

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.upsert import scd2_apply

    dim = spark.createDataFrame(
        [(5, "x", "2024-01-01", "9999-12-31", None),
         (None, "y", "2024-01-01", "9999-12-31", True),
         (1, "a", "2024-01-01", "9999-12-31", True)],
        "id long, attr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "id", "attr",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
        "is_current",
    )
    updates = spark.createDataFrame([(1, "a2")], "id long, attr string")
    out = scd2_apply(dim, updates, "id", ["attr"], "2024-06-01")
    rows = [(r["id"], r["attr"]) for r in out.collect()]
    assert (5, "x") in rows      # null-flag row preserved
    assert (None, "y") in rows   # null-key row preserved
    assert len(rows) == 4        # plus key 1's closed + fresh rows
