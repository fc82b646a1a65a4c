"""PageRank (operators/pagerank.py): value-exact vs a local reference
implementing the same decimal-rounded iteration, structural properties
(mass conservation, symmetry), and partitioning invariance."""

from __future__ import annotations

import math

import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.pagerank import (
    pagerank_undirected,
)


def _ref_pagerank(edges, iterations=5, damping=0.85, digits=9):
    def pr(x):
        p = 10**digits
        return math.floor(x * p + 0.5) / p

    sym = edges + [(b, a) for a, b in edges]
    deg: dict = {}
    for s, _d in sym:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    grid = 10**digits
    rank = {v: pr(1.0 / n) for v in deg}
    for _ in range(iterations):
        # the operator sums pre-rounded contributions EXACTLY (decimal
        # cast) — mirror with integer grid units, not float +=
        contrib: dict = {v: 0 for v in deg}
        for s, d in sym:
            contrib[d] += round(pr(rank[s] / deg[s]) * grid)
        rank = {
            v: pr((1.0 - damping) / n + damping * (contrib[v] / grid))
            for v in deg
        }
    return rank


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(4)
    return {
        r["node_id"]: r["rank"]
        for r in pagerank_undirected(df).collect()
    }


def test_matches_reference_on_star_plus_path(spark):
    # star (0 center) plus a path hanging off node 3
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (3, 5), (5, 6)]
    got = _run(spark, edges)
    want = _ref_pagerank(edges)
    assert got == want
    # the hub out-ranks the leaves, leaf 6 is the lowest-degree tail
    assert got[0] == max(got.values())
    assert got[1] == got[2] == got[4]


def test_matches_reference_on_random_graph(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    edges = sorted(
        {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, 60, (300, 2))
            if a != b
        }
    )
    got = _run(spark, edges)
    want = _ref_pagerank(edges)
    assert got == want
    # probability mass is conserved up to the rounding grid
    assert abs(sum(got.values()) - 1.0) < 1e-6 * len(got)


def test_partitioning_invariance(spark):
    edges = [(i, (i + 1) % 10) for i in range(10)]  # ring: all equal
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = sorted(map(tuple, pagerank_undirected(df1).collect()))
    r8 = sorted(map(tuple, pagerank_undirected(df8).collect()))
    assert r1 == r8
    ranks = {v for _, v in r1}
    assert len(ranks) == 1  # ring symmetry: every node identical


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank_undirected(df).collect() == []
