"""Mergeable GK-style quantile summaries: bounds, merge, compress."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import gk


def _rank_err(data_sorted: np.ndarray, answer: float, target: int) -> int:
    """Distance from target rank to the rank range answer occupies."""
    lo = int(np.searchsorted(data_sorted, answer, side="left")) + 1
    hi = int(np.searchsorted(data_sorted, answer, side="right"))
    if lo > hi:  # answer not present (must not happen: answers are data)
        return 10 ** 9
    if target < lo:
        return lo - target
    if target > hi:
        return target - hi
    return 0


def _check_eps(entries, data: np.ndarray, eps: float):
    data_sorted = np.sort(data)
    n = len(data)
    assert gk.total_count(entries) == n
    assert gk.max_gap(entries) <= max(1, int(math.floor(2 * (eps / 2) * n))) + 1
    for q in np.linspace(0.0, 1.0, 41):
        target = max(1, int(math.ceil(q * n)))
        ans = gk.query(entries, q)
        assert _rank_err(data_sorted, ans, target) <= eps * n + 1, (q, ans)


def _pipeline(data, eps, chunk):
    """Chunked fold exactly like the per-partition executor state."""
    acc = []
    for i in range(0, len(data), chunk):
        block = np.sort(np.asarray(data[i : i + chunk], dtype=float))
        acc = gk.compress(
            gk.merge_two(acc, gk.summarize_sorted(block, eps / 2)), eps / 2
        )
    return acc


def test_summarize_exact_ranks():
    vals = np.arange(1, 101, dtype=float)
    s = gk.summarize_sorted(vals, 0.1)
    assert gk.total_count(s) == 100
    assert s[0][0] == 1.0 and s[-1][0] == 100.0
    assert gk.max_gap(s) <= 10


def test_single_chunk_uniform():
    data = np.arange(10_000, dtype=float)
    _check_eps(_pipeline(data, 0.02, len(data)), data, 0.02)


@pytest.mark.parametrize("dist", ["uniform", "zipf", "dups", "sortedasc"])
@pytest.mark.parametrize("chunk", [333, 5000])
def test_chunked_fold_bounds(dist, chunk):
    rng = random.Random(42)
    n = 20_000
    if dist == "uniform":
        data = [rng.random() for _ in range(n)]
    elif dist == "zipf":
        data = [1.0 / (1 + rng.randrange(1, 50)) for _ in range(n)]
    elif dist == "dups":
        data = [float(rng.randrange(7)) for _ in range(n)]
    else:
        data = [float(i) for i in range(n)]
    data = np.asarray(data)
    _check_eps(_pipeline(list(data), 0.02, chunk), data, 0.02)


def test_merge_of_disjoint_ranges():
    a = _pipeline(list(np.arange(0, 1000, dtype=float)), 0.02, 400)
    b = _pipeline(list(np.arange(1000, 3000, dtype=float)), 0.02, 400)
    m = gk.compress(gk.merge_two(a, b), 0.01)
    data = np.arange(0, 3000, dtype=float)
    _check_eps(m, data, 0.02)


def test_merge_interleaved_summaries():
    rng = random.Random(3)
    xs = [rng.gauss(0, 1) for _ in range(8000)]
    ys = [rng.gauss(0.5, 2) for _ in range(12000)]
    a = _pipeline(xs, 0.02, 1000)
    b = _pipeline(ys, 0.02, 1000)
    m = gk.compress(gk.merge_two(a, b), 0.01)
    _check_eps(m, np.asarray(xs + ys), 0.02)


def test_empty_and_tiny():
    assert gk.summarize_sorted(np.array([]), 0.1) == []
    assert gk.merge_two([], []) == []
    one = gk.summarize_sorted(np.array([5.0]), 0.1)
    assert gk.query(one, 0.5) == 5.0
    assert math.isnan(gk.query([], 0.5))


def test_compress_keeps_extremes():
    data = list(np.arange(5000, dtype=float))
    s = _pipeline(data, 0.05, 5000)
    assert s[0][0] == 0.0 and s[-1][0] == 4999.0
    # heavily compressed but still bounded
    assert len(s) <= 2 / 0.05 + 4


def test_spark_sketch_matches_pure_python_bounds(spark):
    rng = random.Random(9)
    vals = [(rng.random() * 100,) for _ in range(30_000)]
    df = spark.createDataFrame(vals, "x double").repartition(8)
    rows = gk.gk_sketch(df, "x", eps=0.02).collect()
    entries = [(r["v"], r["g"], r["delta"]) for r in rows]
    data = np.asarray([v for (v,) in vals])
    _check_eps(entries, data, 0.02)


def test_spark_sketch_null_and_skewed_partitions(spark):
    vals = [(float(i % 97),) for i in range(5000)] + [(None,)] * 200
    df = spark.createDataFrame(vals, "x double").repartition(13)
    rows = gk.gk_sketch(df, "x", eps=0.05).collect()
    entries = [(r["v"], r["g"], r["delta"]) for r in rows]
    data = np.asarray([v for (v,) in vals if v is not None])
    _check_eps(entries, data, 0.05)


def test_grouped_sketch_bounds_per_group(spark):
    import random

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.gk import (
        gk_sketch_grouped,
    )

    rng = random.Random(13)
    rows = []
    for g, n, lo, hi in (("a", 9000, 0.0, 1.0), ("b", 400, 100.0, 200.0),
                         ("c", 1, 7.0, 7.0)):
        rows += [(g, lo + rng.random() * (hi - lo)) for _ in range(n)]
    df = spark.createDataFrame(rows, "grp string, x double").repartition(11)
    out = gk_sketch_grouped(df, "grp", "x", eps=0.05).collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["grp"], []).append((r["v"], r["g"], r["delta"]))
    data_by_g: dict = {}
    for g, v in rows:
        data_by_g.setdefault(g, []).append(v)
    assert set(by_g) == set(data_by_g)
    for g, entries in by_g.items():
        entries.sort()
        _check_eps(entries, np.asarray(data_by_g[g]), 0.05)
