"""Stress-scale tool: replicate a driver testdata directory K× with
key-space offsets, preserving referential integrity per replica.

The driver ships sf0.001/0.01/0.1; plans that look linear at sf0.1 can
hide superlinear behavior (pair fan-outs, iterative convergence). This
tool manufactures an sfN-ish directory purely from the existing data —
every fact/doc/vector table is unioned K times with its join keys
shifted by ``replica * BASE`` (dims like region/nation are shared, as
in TPC-H).

Two modes:

- default (replicated payloads): identical document/vector payloads
  across replicas — stresses the dedup operators' duplicate-group
  handling (the duplicate-collapse design point).
- ``--distinct``: payloads are deterministically varied per replica
  (documents get a per-replica suffix token, embeddings get a
  per-replica perturbation on one coordinate), so DISTINCT cardinality
  grows with K too — this is the "genuine sf1" shape that exposes
  distinct-state superlinearity (count-distinct aggs, the near-dup
  paths' distinct² term) that replicated data hides.

    python tools/make_scaled_sf.py /root/testdata/sf0.1 .bench/sf1 10
    python tools/make_scaled_sf.py /root/testdata/sf0.1 .bench/sf1d 10 --distinct
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (
    _read_schema,
    ensure_nanos_conf,
    table_path,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.session import get_spark

# join-key columns to offset per replica; () = shared dimension, copied 1×
KEY_COLS: dict[str, tuple[str, ...]] = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
BASE = 1_000_000_000  # far above any real key at any driver sf


def scale_dir(spark, src: str, dst: str, k: int, distinct: bool = False) -> None:
    ensure_nanos_conf(spark)
    for name, keys in KEY_COLS.items():
        path = table_path(src, name)
        schema, ts_cols = _read_schema(name, path)
        df = spark.read.schema(schema).parquet(path)
        # a nanos-generation source reads ts as a raw long; convert to a
        # real timestamp BEFORE writing, or the output column would be
        # an unannotated INT64 that no reader types as a timestamp
        for c in ts_cols:
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        if keys and k > 1:
            shift = F.col("_r").cast("long") * F.lit(BASE).cast("long")
            cols = []
            for c in schema.fieldNames():
                col = F.col(c)
                if c in keys:
                    col = (col + shift).alias(c)
                elif distinct and name == "documents" and c == "text":
                    # replica 0 keeps the original bytes; others get a
                    # distinct suffix token (near-dup across replicas —
                    # realistic for crawl-ish corpora, and it keeps the
                    # shingle space overlapping rather than disjoint)
                    col = F.when(F.col("_r") == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(" rep"), F.col("_r"))
                    ).alias(c)
                elif distinct and name == "documents" and c == "n_chars":
                    col = F.when(F.col("_r") == 0, F.col("n_chars")).otherwise(
                        F.col("n_chars")
                        + F.lit(4)
                        + F.length(F.col("_r").cast("string"))
                    ).alias(c)
                elif distinct and name == "embeddings" and c == "embedding":
                    # perturb one coordinate per replica: vectors become
                    # distinct but stay near-duplicates of their source
                    target = F.pmod(F.col("vec_id"), F.lit(64)).cast("int")
                    col = F.transform(
                        F.col("embedding"),
                        lambda x, i: x
                        + F.when(
                            (i == target) & (F.col("_r") > 0),
                            F.col("_r").cast("float") * F.lit(0.013),
                        ).otherwise(F.lit(0.0)).cast("float"),
                    ).alias(c)
                cols.append(col)
            df = df.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
            ).select(*cols)
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
        print(f"wrote {name}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--distinct"]
    distinct = "--distinct" in sys.argv[1:]
    src, dst = args[0], args[1]
    k = int(args[2]) if len(args) > 2 else 10
    spark = get_spark("scale-testdata")
    # micros on disk: matches the driver generator's current encoding and
    # keeps DuckDB/pyarrow readers unit-exact (INT96 would read as ns)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir(spark, src, dst, k, distinct=distinct)
