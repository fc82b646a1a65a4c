"""Persistent ANN index layout: IVF cells as *partition columns*.

``operators/knn.py`` computes IVF in-memory; this module is the 100 TB
variant where the coarse quantizer's cell assignment is baked into the
storage layout: vectors are written partitioned by ``cell``, so a query
probing `nprobe` cells reads exactly those partitions (partition
pruning — verified by test) and the exact rerank touches
``nprobe/n_cells`` of the corpus. Centroids persist alongside as a tiny
parquet table.

    index = build_ivf_index(vectors, path, n_cells=16)
    hits  = search_ivf_index(spark, path, query_vectors, k=5, nprobe=3)
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vector as V
from .knn import fit_ivf_centroids, unit_vectors_ml


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fit the coarse quantizer and write the cell-partitioned layout."""
    model, centroids = fit_ivf_centroids(vectors, n_cells, vec_col)
    assigned = (
        model.transform(unit_vectors_ml(vectors, vec_col))
        .withColumnRenamed("prediction", "cell")
        .select(id_col, vec_col, "cell")
    )
    assigned.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "vectors")
    )
    spark = vectors.sparkSession
    cent_rows = [
        (int(i), [float(x) for x in centroids[i]]) for i in range(len(centroids))
    ]
    spark.createDataFrame(cent_rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = V.EMBEDDING_DIM,
) -> DataFrame:
    """Probe top-`nprobe` cells per query; the cell IN-filter prunes
    partitions of the written layout before any vector math."""
    centroids_pdf = spark.read.parquet(os.path.join(path, "centroids")).toPandas()
    cent = np.vstack(centroids_pdf["centroid"].to_numpy())
    cells = centroids_pdf["cell"].to_numpy()

    q_rows = queries.select(id_col, vec_col).collect()
    qm = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qm_unit = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    scores = qm_unit @ cent.T
    probe_pairs = [
        (int(r[id_col]), int(cells[c]))
        for i, r in enumerate(q_rows)
        for c in np.argsort(-scores[i])[:nprobe]
    ]
    probe_df = F.broadcast(
        spark.createDataFrame(probe_pairs, "query_id long, cell int")
    )
    probed_cells = sorted({c for _, c in probe_pairs})

    vectors = spark.read.parquet(os.path.join(path, "vectors")).where(
        F.col("cell").isin(probed_cells)  # partition pruning
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        V.as_double(F.col(vec_col)).alias("qv"),
        V.norm_fixed(F.col(vec_col), dim).alias("qnorm"),
    )
    cand = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            V.as_double(F.col(vec_col)).alias("cv"),
            "cell",
            V.norm_fixed(F.col(vec_col), dim).alias("cnorm"),
        )
        .join(probe_df, "cell")
        .join(F.broadcast(q), "query_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            V.dot_fixed(F.col("qv"), F.col("cv"), dim, cast=False)
            / (F.col("qnorm") * F.col("cnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
