"""Dedup operators: exact keep-one semantics, MinHash-LSH recall on
planted near-duplicates, SimHash blocking, idempotence (J2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import dedup as DD

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees "
    "as morning light spreads across the quiet village square slowly"
)


def _corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, BASE.replace("quick", "swift")),          # near-dup of 1
        (4, BASE.replace("morning", "evening").replace("cat", "dog")),  # near-dup
        (5, "completely different text about spark dataframes and shuffles "
            "partitions catalyst optimizer and adaptive query execution engine "
            "with broadcast joins and whole stage code generation pipelines"),
        (6, "yet another unrelated document mentioning minhash signatures "
            "locality sensitive hashing banding technique and jaccard similarity "
            "estimation for large scale near duplicate detection systems"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    df = _corpus(spark)
    out = DD.exact_dedup(df, F.sha2(F.col("text"), 256)).toPandas()
    assert sorted(out["doc_id"]) == [1, 3, 4, 5, 6]  # 2 dropped (dup of 1)


def test_exact_dedup_idempotent(spark):
    df = _corpus(spark)
    once = DD.exact_dedup(df, F.sha2(F.col("text"), 256))
    twice = DD.exact_dedup(once, F.sha2(F.col("text"), 256))
    assert sorted(r["doc_id"] for r in twice.collect()) == sorted(
        r["doc_id"] for r in once.collect()
    )


def test_anti_join_gate(spark):
    new = _corpus(spark).withColumn("file_hash", F.sha2(F.col("text"), 256))
    catalog = new.where(F.col("doc_id") == 1).select("file_hash")
    fresh = DD.anti_join_new(new, catalog)
    # rows 1 AND 2 share the cataloged hash → both rejected
    assert sorted(r["doc_id"] for r in fresh.collect()) == [3, 4, 5, 6]


def test_minhash_finds_planted_neardups(spark):
    df = _corpus(spark)
    pairs = DD.minhash_dedup_pairs(df, threshold=0.4).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (1, 2) in found            # exact dup always survives
    assert (1, 3) in found or (2, 3) in found  # 1-word edit
    for a, b in found:                # no cross-topic false positives
        assert not (a in (5, 6)) ^ (b in (5, 6)) or {a, b} <= {5, 6}


def test_minhash_jaccard_values(spark):
    df = _corpus(spark)
    pairs = DD.minhash_dedup_pairs(df, threshold=0.4).toPandas()
    exact_dup = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)]
    assert len(exact_dup) == 1 and exact_dup["jaccard"].iloc[0] == 1.0


def test_simhash_neardups_and_blocking(spark):
    df = _corpus(spark)
    pairs = DD.simhash_pairs(df, max_hamming=16).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (1, 2) in found
    ham = pairs.set_index(["id_a", "id_b"])["hamming"]
    assert ham.loc[(1, 2)] == 0       # identical text → identical signature
    # unrelated docs must not appear as near-dups at tight threshold
    tight = DD.simhash_pairs(df, max_hamming=6).toPandas()
    tight_pairs = {tuple(sorted((a, b))) for a, b in zip(tight["id_a"], tight["id_b"])}
    assert (1, 5) not in tight_pairs and (5, 6) not in tight_pairs
