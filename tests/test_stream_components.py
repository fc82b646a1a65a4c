"""Incremental connected components ≡ one-shot batch run."""

from __future__ import annotations

import random

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.components import (
    connected_components,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.streaming.graph import (
    IncrementalComponents,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _labels(df):
    value_col = "label" if "label" in df.columns else "component"
    return {r["node"]: r[value_col] for r in df.collect()}


def _run_incremental(spark, chunks):
    inc = IncrementalComponents()
    for c in chunks:
        inc.update(_edges_df(spark, c))
    return _labels(inc.labels())


def test_single_batch_equals_batch(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    got = _run_incremental(spark, [edges])
    want = _labels(connected_components(_edges_df(spark, edges)))
    assert got == want


def test_late_bridge_merges_components(spark):
    # batch 1 builds two components; batch 2's single edge merges them
    got = _run_incremental(spark, [[(1, 2), (5, 6)], [(2, 5)]])
    assert got == {1: 1, 2: 1, 5: 1, 6: 1}


def test_chain_built_one_edge_per_batch(spark):
    # worst case for incremental labeling: every batch extends the
    # chain and must drag the min label forward through condensation
    chunks = [[(i, i + 1)] for i in range(6)]
    got = _run_incremental(spark, chunks)
    assert set(got.values()) == {0}
    # and in reverse arrival order (new edge attaches BELOW the min)
    got_rev = _run_incremental(spark, [[(i, i + 1)] for i in range(5, -1, -1)])
    assert set(got_rev.values()) == {0}


def test_randomized_chunked_equals_batch(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _labels(connected_components(_edges_df(spark, edges)))
    for n_chunks in (3, 7):
        size = (len(edges) + n_chunks - 1) // n_chunks
        chunks = [edges[i : i + size] for i in range(0, len(edges), size)]
        assert _run_incremental(spark, chunks) == want


def test_repeated_and_reversed_edges_are_stable(spark):
    got = _run_incremental(
        spark, [[(1, 2)], [(2, 1)], [(1, 2), (3, 4)], [(4, 3)]]
    )
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
