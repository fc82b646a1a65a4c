"""Embedding gate + scalar-projection tests (§2.9 embedding UDF).

The driver's CORRECTNESS canonicalizer can't hash ArrayType columns, so
``doc_embeddings`` exposes scalar projections (dim/norm/fingerprint) and
``embedding_gate`` is a one-row self-check; these tests pin both, plus
the agreement between the scalar projection and the raw-array operator
API (operators/embed.py).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import embed as EMB
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans import pipeline as P


def test_embedding_gate_passes(spark, sf_dir):
    row = P.embedding_gate(spark, sf_dir).collect()[0]
    assert row["passed"] is True
    assert row["n_docs"] > 0
    assert row["n_nondet"] == 0
    assert row["n_bad_dim"] == 0
    assert row["n_bad_norm"] == 0


def test_doc_embeddings_driver_hashable(spark, sf_dir):
    """Every output column must be a scalar the driver's pandas
    canonicalizer can sort/hash — no arrays, maps, or structs."""
    df = P.doc_embeddings(spark, sf_dir)
    for f in df.schema.fields:
        assert f.dataType.typeName() in {
            "long", "integer", "double", "float", "string", "boolean"
        }, f"{f.name}: {f.dataType}"
    assert df.count() > 0


def test_scalar_projection_matches_raw_array(spark):
    """dim/norm in the scalar projection agree with the raw array."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta"), (3, "   ")],
        "doc_id long, text string",
    )
    raw = docs.select(
        "doc_id", EMB.hashing_embedding(F.col("text")).alias("embedding")
    ).collect()
    scal = {r["doc_id"]: r for r in P._embedding_scalars(docs).collect()}
    for r in raw:
        s = scal[r["doc_id"]]
        assert s["dim"] == len(r["embedding"]) == EMB.DEFAULT_DIM
        norm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(s["norm"] - round(norm, 4)) <= 1e-9
    # blank text -> zero vector, norm 0
    assert scal[3]["norm"] == 0.0
