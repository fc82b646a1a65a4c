"""Connected components: transitive closure of near-dup pairs."""

from __future__ import annotations

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.components import (
    connected_components,
)


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_merges_transitively(spark):
    # A~B, B~C, C~D: one component rooted at the min id, despite no
    # direct A~D edge — the property pairwise dedup output lacks.
    got = _resolve(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_merge_of_two_clusters_via_bridge(spark):
    got = _resolve(spark, [(5, 6), (8, 9), (6, 8)])
    assert got == {5: 5, 6: 5, 8: 5, 9: 5}


def test_edge_direction_irrelevant(spark):
    assert _resolve(spark, [(7, 2)]) == _resolve(spark, [(2, 7)]) == {2: 2, 7: 2}


def test_long_path_converges(spark):
    # force the DISTRIBUTED propagation path (the driver fast path
    # would trivially pass): O(log diameter) pointer jumping
    n = 25
    got = _resolve(spark, [(i, i + 1) for i in range(n)],
                   max_driver_edges=0)
    assert set(got.values()) == {0}


def test_driver_fast_path_equals_distributed(spark):
    # the size-gated union-find must agree with label propagation on
    # an adversarial mix: chains, bridges, self-loops, singleton pairs
    import random

    rng = random.Random(0)
    edges = [(i, i + 1) for i in range(0, 40, 2)]
    edges += [(rng.randrange(50), rng.randrange(50)) for _ in range(60)]
    fast = _resolve(spark, edges)  # small graph -> driver path
    slow = _resolve(spark, edges, max_driver_edges=0)
    assert fast == slow


def test_checkpoint_mode_forces_distributed(spark, tmp_path):
    # sanity: reliable-checkpoint coverage below must actually exercise
    # the distributed rounds, not the driver shortcut
    import os

    ckpt = str(tmp_path / "ckpt2")
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    connected_components(df, checkpoint_dir=ckpt, max_driver_edges=0).collect()
    assert any(fs for _, _, fs in os.walk(ckpt))


def test_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir engages reliable checkpoint(): same answer, and
    RDD checkpoint files actually land in the directory (the
    cluster-fault-tolerant mode the 100 TB deployment uses)."""
    import os

    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    rows = connected_components(
        df, checkpoint_dir=ckpt, max_driver_edges=0
    ).collect()
    got = {r["node"]: r["component"] for r in rows}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    written = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckpt)
        for f in fs
    ]
    assert written, "reliable checkpoint wrote no files"


def test_env_knob_drives_plan_entry_checkpointing(spark, sf_dir, tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT_DIR routes the neardup plan entries onto
    reliable checkpoint() without code edits (cluster deployment knob)."""
    import glob
    import os

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.documents import (
        neardup_components,
    )

    ckpt = str(tmp_path / "plan_ckpt")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt)
    out = neardup_components(spark, sf_dir)
    assert out.count() > 0
    written = glob.glob(os.path.join(ckpt, "**", "*"), recursive=True)
    assert written, "env-driven reliable checkpoint wrote no files"

    # unset → default localCheckpoint path still works
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR")
    assert neardup_components(spark, sf_dir).count() == out.count()


# --- k-core peeling ------------------------------------------------------


def _brute_k_core(edges, k):
    adj: dict = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) not in es:
            es.add((a, b))
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return set(adj)


def _spark_k_core(spark, edges, k):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.components import (
        k_core,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"] for r in k_core(df, k=k).collect()}


def test_k_core_triangle_survives_tail_peeled(spark):
    # triangle + pendant chain: 2-core is exactly the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _spark_k_core(spark, edges, 2) == {1, 2, 3}


def test_k_core_cascading_peel(spark):
    # peeling 5 exposes 4, which exposes 3: multi-round cascade ending
    # at the square
    edges = [(1, 2), (2, 6), (6, 7), (7, 1), (1, 3), (3, 4), (4, 5)]
    assert _spark_k_core(spark, edges, 2) == _brute_k_core(edges, 2)
    assert _spark_k_core(spark, edges, 2) == {1, 2, 6, 7}


def test_k_core_empty_when_tree(spark):
    edges = [(1, 2), (1, 3), (1, 4), (4, 5)]
    assert _spark_k_core(spark, edges, 2) == set()


def test_k_core_k3_randomized(spark):
    import random

    rng = random.Random(31)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(80)]
    for k in (2, 3, 4):
        assert _spark_k_core(spark, edges, k) == _brute_k_core(edges, k), k
