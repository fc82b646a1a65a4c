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
