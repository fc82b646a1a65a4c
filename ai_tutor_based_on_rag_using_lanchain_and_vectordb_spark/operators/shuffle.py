"""Global deterministic corpus shuffle + shard export.

Training-order randomization at 100 TB cannot be a global sort (one
range-partitioned total order = a full-corpus sort per epoch) and
cannot be ``rand()`` (task retries would re-deal the order). Instead:

1. **Pseudorandom permutation key**: a two-round Knuth multiplicative
   mix of the stable row id modulo the Mersenne prime 2^31-1 — plain
   int64 arithmetic that Spark and any ANSI SQL engine compute
   bit-identically (the repo's established cross-engine hash pattern,
   plans/trainprep.py `_MIX_*`), seeded so each epoch is a different
   deterministic order.
2. **Shard assignment by fixed key ranges**: shard = ⌊key·n/P⌋. The
   key is uniform on [0, P), so shards are balanced WITHOUT the
   sampling pass (and sampling nondeterminism) of
   ``repartitionByRange`` — the boundaries are a pure function of the
   key, so two runs, two clusters, two retries all cut identically.
3. **Sort only within shards**: one hash exchange on ``shard`` plus a
   per-shard local sort. Reading shards 0..n-1 in order replays the
   full permutation ((shard, pos) lexicographic == (key, id) global
   order) — a total order assembled with NO single-task exchange
   anywhere in the plan (plan-asserted in tests).

Composes with sequence packing (plans/trainprep.py sequence_packing):
shuffle the packed sequences by ``seq_id`` so training shards are both
length-packed and order-randomized.

No reference-repo counterpart: the reference (FastAPI+LangChain RAG
app) never exports a corpus; this is part of the engine's
training-pipeline surface (BASELINE.json north star).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1: modulus of the permutation key space.
SHUFFLE_P = 2_147_483_647
#: Knuth's multiplicative constants; both products stay < 2^63 for any
#: int64 id (the id is reduced mod P before the first multiply).
_A1 = 2_654_435_761
_A2 = 1_597_334_677
#: shard count ceiling: key·n must stay exact in the double `floor`
#: division both engines evaluate (key < 2^31, n ≤ 2^20 ⇒ < 2^51).
MAX_SHARDS = 1 << 20


def shuffle_key(id_col: Column, seed: int = 0) -> Column:
    """Deterministic pseudorandom permutation key in [0, 2^31-1) —
    two multiplicative-mix rounds mod P, seeded. Non-negative ids are
    assumed (corpus ids here are); negative ids still hash (pmod), they
    just share the reduced key space."""
    s = int(seed) % SHUFFLE_P  # keep the +seed term inside int64
    h1 = F.pmod(F.pmod(id_col, F.lit(SHUFFLE_P)) * _A1 + F.lit(s), F.lit(SHUFFLE_P))
    return F.pmod(h1 * _A2, F.lit(SHUFFLE_P))


def shuffle_key_sql(id_expr: str, seed: int = 0) -> str:
    """DuckDB/ANSI mirror of :func:`shuffle_key` (ids non-negative, so
    plain ``%`` equals pmod)."""
    h1 = f"((({id_expr}) % {SHUFFLE_P}) * {_A1} + {int(seed) % SHUFFLE_P}) % {SHUFFLE_P}"
    return f"(({h1}) * {_A2}) % {SHUFFLE_P}"


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Append (skey, shard, pos): the permutation key, the fixed-range
    shard, and the row's position within its shard. Cost: one hash
    exchange on ``shard`` + a per-shard sort — no global sort, no
    sampling pass, bit-deterministic across runs and retries."""
    if not (1 <= n_shards <= MAX_SHARDS):
        raise ValueError(f"n_shards must be in [1, {MAX_SHARDS}], got {n_shards}")
    keyed = df.withColumn("skey", shuffle_key(F.col(id_col), seed)).withColumn(
        "shard",
        F.floor(F.col("skey") * n_shards / F.lit(SHUFFLE_P)).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("skey", id_col)
    return keyed.withColumn("pos", F.row_number().over(w).cast("long"))


def assign_shards_sql(
    source_sql: str, id_expr: str, n_shards: int, seed: int = 0
) -> str:
    """Oracle mirror of :func:`assign_shards` over ``source_sql`` (a
    relation exposing ``{id_expr}``); emits doc-id, skey, shard, pos."""
    skey = shuffle_key_sql(id_expr, seed)
    return f"""
        WITH keyed AS (
            SELECT {id_expr}, {skey} AS skey FROM ({source_sql})
        ), sharded AS (
            SELECT {id_expr}, skey,
                   CAST(floor(skey * {n_shards} / {SHUFFLE_P}) AS BIGINT) AS shard
            FROM keyed
        )
        SELECT {id_expr}, skey, shard,
               CAST(row_number() OVER (
                   PARTITION BY shard ORDER BY skey, {id_expr}
               ) AS BIGINT) AS pos
        FROM sharded
    """


def export_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> None:
    """Write the shuffled corpus as ``shard=K`` parquet partitions whose
    file contents replay the permutation: rows of shard K are stored in
    (skey, id) order. Each shard's rows are hash-co-located into one
    task (``repartition(shard)``) and locally sorted, so every shard
    directory holds exactly one file with deterministic row order —
    task retries and re-runs produce the same rows in the same
    sequence. Readers stream shard 0..n-1 for the full epoch order."""
    out = assign_shards(df, id_col, n_shards, seed)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "skey", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_shuffled_shards(spark, path: str) -> DataFrame:
    """Read an exported shuffle back; ordering inside each shard file is
    the stored permutation order (parquet preserves row order)."""
    return spark.read.parquet(os.path.join(path))
