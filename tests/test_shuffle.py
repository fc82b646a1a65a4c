"""Deterministic corpus shuffle + shard export (operators/shuffle.py)
and the registered Q(corpus_shuffle) plan."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.shuffle import (
    MAX_SHARDS,
    SHUFFLE_P,
    assign_shards,
    export_shuffled_shards,
    read_shuffled_shards,
    shuffle_key,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 1000).withColumnRenamed("id", "doc_id")


def test_permutation_properties(spark, ids):
    out = assign_shards(ids, "doc_id", n_shards=8, seed=3).collect()
    # every row present exactly once, every shard in range
    assert sorted(r.doc_id for r in out) == list(range(1000))
    assert all(0 <= r.shard < 8 for r in out)
    # shard boundaries are key ranges: (shard, pos) lexicographic order
    # replays exactly the (skey, id) global order
    by_shard = sorted(out, key=lambda r: (r.shard, r.pos))
    by_key = sorted(out, key=lambda r: (r.skey, r.doc_id))
    assert [r.doc_id for r in by_shard] == [r.doc_id for r in by_key]
    # it is actually a shuffle: order differs from id order
    assert [r.doc_id for r in by_key][:20] != list(range(20))


def test_seed_changes_order_deterministically(spark, ids):
    a1 = [(r.doc_id, r.skey) for r in assign_shards(ids, "doc_id", 4, seed=1).collect()]
    a2 = [(r.doc_id, r.skey) for r in assign_shards(ids, "doc_id", 4, seed=1).collect()]
    b = [(r.doc_id, r.skey) for r in assign_shards(ids, "doc_id", 4, seed=2).collect()]
    assert sorted(a1) == sorted(a2)  # same seed → identical keys
    assert sorted(a1) != sorted(b)  # new seed → new permutation


def test_key_range_and_validation(spark, ids):
    row = ids.select(
        F.min(shuffle_key(F.col("doc_id"))).alias("lo"),
        F.max(shuffle_key(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0 <= row.lo and row.hi < SHUFFLE_P
    with pytest.raises(ValueError):
        assign_shards(ids, "doc_id", 0)
    with pytest.raises(ValueError):
        assign_shards(ids, "doc_id", MAX_SHARDS + 1)


def test_export_is_deterministic_and_ordered(spark, ids, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    export_shuffled_shards(ids, p1, "doc_id", n_shards=4, seed=7)
    export_shuffled_shards(ids, p2, "doc_id", n_shards=4, seed=7)

    def shard_digests(path):
        digs = {}
        for shard in sorted(
            int(d.split("=")[1])
            for d in os.listdir(path)
            if d.startswith("shard=")
        ):
            part = read_shuffled_shards(spark, os.path.join(path, f"shard={shard}"))
            seq = [(r.doc_id, r.skey, r.pos) for r in part.collect()]
            # stored row order IS the replay order
            assert seq == sorted(seq, key=lambda t: t[2])
            digs[shard] = hashlib.sha256(str(seq).encode()).hexdigest()
        return digs

    d1, d2 = shard_digests(p1), shard_digests(p2)
    assert d1 == d2
    assert set(d1) == {0, 1, 2, 3}
    # one data file per shard: the whole shard was one task's output
    for shard in d1:
        files = [
            f
            for f in os.listdir(os.path.join(p1, f"shard={shard}"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, files


def test_plan_has_no_global_sort(spark, ids):
    plan = (
        assign_shards(ids, "doc_id", 8, seed=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_composes_with_sequence_packing(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.trainprep import (
        sequence_packing,
    )

    packed = sequence_packing(spark, sf_dir).select("doc_id", "first_seq")
    out = assign_shards(packed, "doc_id", 4, seed=5)
    n = packed.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n


def test_registered_query_matches_oracle_shape(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.trainprep import (
        corpus_shuffle,
    )

    df = corpus_shuffle(spark, sf_dir)
    assert df.columns == ["doc_id", "skey", "shard", "pos"]
    rows = df.collect()
    assert len(rows) > 0
    # pos is dense 1..k per shard
    per = {}
    for r in rows:
        per.setdefault(r.shard, []).append(r.pos)
    for shard, poss in per.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
