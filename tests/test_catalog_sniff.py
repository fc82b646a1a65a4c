"""Parquet timestamp-unit sniffing (catalog._stored_as_nanos): the r4
testdata regeneration switched events.ts between TIMESTAMP(NANOS) and
TIMESTAMP(MICROS), so the read path sniffs footers. These tests pin the
hardened behavior: multi-file directories are sampled (not just the
first file), mixed units fail loudly, and errors are never cached."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark import catalog


def _write(path, unit):
    tbl = pa.table({"ts": pa.array([0, 1], type=pa.timestamp(unit))})
    pq.write_table(tbl, path, coerce_timestamps=None)


def test_single_file_units(tmp_path):
    ns, us = str(tmp_path / "ns.parquet"), str(tmp_path / "us.parquet")
    _write(ns, "ns")
    _write(us, "us")
    assert catalog._stored_as_nanos(ns, "ts") is True
    assert catalog._stored_as_nanos(us, "ts") is False


def test_directory_consistent(tmp_path):
    d = tmp_path / "tbl.parquet"
    d.mkdir()
    for i in range(4):
        _write(str(d / f"part-{i}.parquet"), "ns")
    assert catalog._stored_as_nanos(str(d), "ts") is True


def test_directory_mixed_units_fails_loudly(tmp_path):
    d = tmp_path / "mixed.parquet"
    d.mkdir()
    _write(str(d / "part-0.parquet"), "ns")
    _write(str(d / "part-1.parquet"), "us")
    with pytest.raises(ValueError, match="mixed parquet timestamp units"):
        catalog._stored_as_nanos(str(d), "ts")
    # the failure must not poison the cache for a later (fixed) read
    assert (str(d), "ts") not in catalog._NANOS_CACHE


def test_transient_error_not_cached(tmp_path):
    missing = str(tmp_path / "ghost.parquet")
    assert catalog._stored_as_nanos(missing, "ts") is False
    assert (missing, "ts") not in catalog._NANOS_CACHE
    # path appears later (transient error resolved): correct answer now
    _write(missing, "ns")
    assert catalog._stored_as_nanos(missing, "ts") is True
