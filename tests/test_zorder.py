"""Z-order clustering: Morton key exactness + footer-stats pruning."""

from __future__ import annotations

import glob
import os
import random
import tempfile

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.zorder import (
    morton_key,
    write_zordered,
)


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_reference(spark):
    rng = random.Random(2)
    rows = [(rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16)) for _ in range(500)]
    rows += [(0, 0), (65535, 65535), (1, 0), (0, 1), (70000, 3)]  # wrap case
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_morton_locality_is_monotone_in_quadrants(spark):
    # the top bit of the key is the top bit of y, then x: quadrant order
    df = spark.createDataFrame(
        [(0, 0), (65535, 0), (0, 65535), (65535, 65535)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert got[(0, 0)] < got[(65535, 0)] < got[(0, 65535)] < got[(65535, 65535)]


def _file_spans(path: str, col: str) -> list[tuple]:
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_zordered_write_tightens_both_dimensions(spark):
    # uniform 2-D data: a single-key sort leaves the OTHER column's
    # per-file span at ~full range; z-order must shrink both
    rng = random.Random(7)
    rows = [(rng.randrange(0, 4096), rng.randrange(0, 4096)) for _ in range(40_000)]
    df = spark.createDataFrame(rows, "x long, y long")
    with tempfile.TemporaryDirectory() as d:
        zpath = os.path.join(d, "z")
        lpath = os.path.join(d, "linear")
        write_zordered(df, zpath, "x", "y", bits=12, n_files=16)
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lpath)
        )

        def avg_span(path, col):
            spans = _file_spans(path, col)
            return sum(hi - lo for lo, hi in spans) / len(spans)

        full = 4096.0
        # linear layout: x tight, y full-range
        assert avg_span(lpath, "x") < 0.2 * full
        assert avg_span(lpath, "y") > 0.8 * full
        # z-order: BOTH dimensions well under full range
        assert avg_span(zpath, "x") < 0.6 * full
        assert avg_span(zpath, "y") < 0.6 * full
        # and the written data is the same multiset
        back = spark.read.parquet(zpath)
        assert back.count() == len(rows)
        assert back.groupBy().agg(F.sum("x"), F.sum("y")).collect() == \
            df.groupBy().agg(F.sum("x"), F.sum("y")).collect()
