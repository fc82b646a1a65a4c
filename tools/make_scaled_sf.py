"""Stress-scale tool: replicate a driver testdata directory K× with
key-space offsets, preserving referential integrity per replica.

The driver ships sf0.001/0.01/0.1; plans that look linear at sf0.1 can
hide superlinear behavior (pair fan-outs, iterative convergence). This
tool manufactures an sfN-ish directory purely from the existing data —
every fact/doc/vector table is unioned K times with its join keys
shifted by ``replica * BASE`` (dims like region/nation are shared, as
in TPC-H). Identical document/vector payloads across replicas are kept
on purpose: they stress the dedup operators' duplicate-group handling.

    python tools/make_scaled_sf.py /root/testdata/sf0.1 .bench/sf1 10
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


def scale_dir(spark, src: str, dst: str, k: int) -> None:
    ensure_nanos_conf(spark)
    for name, keys in KEY_COLS.items():
        schema, _ = _read_schema(name)  # nanos ts stays a raw long
        df = spark.read.schema(schema).parquet(table_path(src, name))
        if keys and k > 1:
            shift = F.col("_r").cast("long") * F.lit(BASE).cast("long")
            df = df.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
            ).select(
                *[
                    (F.col(c) + shift).alias(c) if c in keys else F.col(c)
                    for c in schema.fieldNames()
                ]
            )
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
        print(f"wrote {name}", flush=True)


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("scale-testdata")
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir(spark, src, dst, k)
