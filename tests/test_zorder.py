"""Z-order clustering: the written layout must localize EVERY
participating column's per-file value range (the property that makes
row-group skipping work for multi-dimensional predicates), where a
single-key sort localizes only its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.zorder import (
    _interleave,
    zorder_write,
    zvalue,
)


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def _mean_span(ranges: list[tuple[int, int]]) -> float:
    return sum(hi - lo for lo, hi in ranges) / len(ranges)


def test_interleave_morton_property(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=0b011, y=0b101 → interleaved (x bit b at 2b, y bit b at 2b+1)
    # = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0b100111 = 39
    got = df.select(
        _interleave([F.col("x"), F.col("y")], 3).alias("z")
    ).first()["z"]
    assert got == 0b100111


def test_zvalue_is_deterministic_and_bounded(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = li.select(zvalue(li, ["l_partkey", "l_suppkey"], bits=8).alias("z"))
    stats = z.agg(F.min("z"), F.max("z")).first()
    assert 0 <= stats[0] and stats[1] < (1 << 16)


def test_zorder_localizes_both_columns(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    glob_pk = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    glob_sk = li.agg(F.max("l_suppkey") - F.min("l_suppkey")).first()[0]

    # baseline: single-key range sort — partkey tight, suppkey full-range
    single = str(tmp_path / "single")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(single)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(li, zpath, ["l_partkey", "l_suppkey"], bits=10, n_files=8)

    s_pk = _mean_span(_file_ranges(single, "l_partkey"))
    s_sk = _mean_span(_file_ranges(single, "l_suppkey"))
    z_pk = _mean_span(_file_ranges(zpath, "l_partkey"))
    z_sk = _mean_span(_file_ranges(zpath, "l_suppkey"))

    assert s_pk < 0.4 * glob_pk          # sanity: sort localizes its key
    assert s_sk > 0.9 * glob_sk          # ...and nothing else
    assert z_pk < 0.7 * glob_pk          # z-order localizes BOTH
    assert z_sk < 0.7 * glob_sk

    # layout change must not change content
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert (
        back.agg(F.sum("l_orderkey")).first()[0]
        == li.agg(F.sum("l_orderkey")).first()[0]
    )


def test_too_many_bits_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="exceeds int64"):
        _interleave([F.col("x"), F.col("y")], 32)


def test_empty_and_allnull_frames_write_degenerate_layout(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("a", T.LongType()), T.StructField("b", T.LongType())
    ])
    empty = spark.createDataFrame([], schema)
    zorder_write(empty, str(tmp_path / "empty"), ["a", "b"], bits=8, n_files=2)
    assert spark.read.parquet(str(tmp_path / "empty")).count() == 0

    allnull = spark.createDataFrame([(None, 1), (None, 2)], schema)
    zorder_write(allnull, str(tmp_path / "nulls"), ["a", "b"], bits=8, n_files=2)
    assert spark.read.parquet(str(tmp_path / "nulls")).count() == 2


# --- fixed-mask morton_key (the oracle-mirrorable variant) ---------------


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_reference(spark):
    import random

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.zorder import (
        morton_key,
    )

    rng = random.Random(2)
    rows = [(rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16)) for _ in range(400)]
    rows += [(0, 0), (65535, 65535), (1, 0), (0, 1), (70000, 3)]  # wrap case
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_morton_sql_is_same_function(spark):
    import duckdb

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.zorder import (
        morton_sql,
    )

    con = duckdb.connect()
    got = con.sql(
        "SELECT " + morton_sql("3", "5", 3) + " AS z"
    ).fetchone()[0]
    assert got == 0b100111  # same layout _interleave pins above
    vals = con.sql(
        "SELECT " + morton_sql("x", "y", 16) + " AS z "
        "FROM (SELECT UNNEST([0, 1, 65535, 70000]) x, UNNEST([0, 2, 65535, 3]) y)"
    ).fetchall()
    assert [v[0] for v in vals] == [
        _py_morton(0, 0), _py_morton(1, 2), _py_morton(65535, 65535),
        _py_morton(70000, 3),
    ]
