"""Batch ingest pipeline — the reference's POST /upload-doc flow
(backend/main.py:305-427) as one declarative dataflow:

    binaryFile scan
      → validation filters (extension P5, size P6, MIME P8, name F2)
      → sha-256 content hash (F1)
      → dedup anti-join vs catalog (J2 — the UNIQUE(file_hash) gate)
      → page decode (S1-S3) → recursive split (F18) + ordinals (W4)
      → deterministic embed → chunk + vector tables

Differences from the reference, by design (SURVEY.md §4.5):
- per-row ValueError on duplicate → set-based anti-join + a
  `rejected` side-output carrying the reason (batch semantics),
- manual rollback (main.py:399-405) → single-job atomicity: outputs
  are only written after the whole plan succeeds.

At scale: validations are scan-side filters (pushed to the file list /
parquet footer where possible); the catalog anti-join broadcasts the
catalog's hash column; everything downstream is map-only until the
vector write.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import embed as EMB
from ..operators import splitter as SPL
from .loaders import decode_pages_udf, read_binary_documents, sniff_mime_udf

MAX_FILE_SIZE_MB = 10  # reference backend/config.py:26


@dataclass
class IngestResult:
    accepted: DataFrame
    rejected: DataFrame  # (path, reason)
    catalog_rows: DataFrame
    chunks: DataFrame
    vectors: DataFrame
    summaries: dict = field(default_factory=dict)


def validate_files(files: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P5/P6/P8/F2 validation; returns (valid, rejected-with-reason)."""
    sanitized = files.withColumn("filename", TX.sanitize_filename(F.col("path")))
    checked = (
        sanitized.withColumn("suffix", TX.file_suffix(F.col("filename")))
        .withColumn("mime", sniff_mime_udf(F.substring(F.col("content"), 1, 64)))
        .withColumn(
            "reason",
            F.when(
                ~TX.has_allowed_extension(F.col("filename")),
                F.lit("unsupported_extension"),
            )
            .when(
                F.col("file_size") > MAX_FILE_SIZE_MB * 1024 * 1024,
                F.lit("file_too_large"),
            )
            .when(F.col("file_size") == 0, F.lit("empty_file"))
            # MIME check is fail-open like the reference
            # (backend/file_utils.py:115-121): reject only a positive
            # mismatch between sniffed mime and extension expectation
            .when(
                (F.col("suffix") == ".pdf") & (F.col("mime") != "application/pdf"),
                F.lit("mime_mismatch"),
            )
            .when(
                (F.col("suffix") == ".docx") & (F.col("mime") != "application/zip"),
                F.lit("mime_mismatch"),
            ),
        )
    )
    valid = checked.where(F.col("reason").isNull()).drop("reason")
    rejected = checked.where(F.col("reason").isNotNull()).select("path", "reason")
    return valid, rejected


def ingest(
    spark: SparkSession,
    path_glob: str,
    catalog: DataFrame | None = None,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    embedding_dim: int = EMB.DEFAULT_DIM,
) -> IngestResult:
    files = read_binary_documents(spark, path_glob)
    valid, rejected = validate_files(files)

    hashed = valid.withColumn("file_hash", TX.file_hash(F.col("content")))
    # in-batch dedup first (keep lexicographically-first path), then the
    # catalog anti-join (J2)
    in_batch_first = hashed.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("file_hash").orderBy("path")),
    )
    dup_in_batch = in_batch_first.where(F.col("_rn") > 1).select(
        "path", F.lit("duplicate_in_batch").alias("reason")
    )
    unique_batch = in_batch_first.where(F.col("_rn") == 1).drop("_rn")
    if catalog is not None:
        already = unique_batch.join(
            F.broadcast(catalog.select("file_hash")), "file_hash", "left_semi"
        ).select("path", F.lit("already_uploaded").alias("reason"))
        fresh = unique_batch.join(
            F.broadcast(catalog.select("file_hash")), "file_hash", "left_anti"
        )
        rejected = rejected.unionByName(dup_in_batch).unionByName(already)
    else:
        fresh = unique_batch
        rejected = rejected.unionByName(dup_in_batch)

    catalog_rows = fresh.select(
        F.xxhash64("file_hash").alias("id"),
        "filename",
        "file_size",
        F.col("suffix").alias("file_type"),
        "file_hash",
        "upload_timestamp",
    )

    pages = fresh.withColumn(
        "pages", decode_pages_udf(F.col("path"), F.col("content"))
    ).select(
        F.xxhash64("file_hash").alias("doc_id"),
        F.col("filename").alias("source_file"),
        F.posexplode("pages").alias("page_no", "page_text"),
    )
    chunks = (
        SPL.split_documents(
            pages.withColumn(
                "page_doc_id", F.xxhash64(F.col("doc_id"), F.col("page_no"))
            ).withColumnRenamed("doc_id", "file_doc_id"),
            text_col="page_text",
            id_col="page_doc_id",
            size=chunk_size,
            overlap=chunk_overlap,
            # lineage: the file-level doc id rides along so delete/list
            # flows can address chunks by catalog id directly
            keep_cols=("file_doc_id", "source_file", "page_no"),
        )
        .withColumnRenamed("doc_id", "page_doc_id")
        .withColumnRenamed("file_doc_id", "doc_id")
        .withColumn("chunk_id", F.xxhash64("page_doc_id", "chunk_index"))
    )
    vectors = EMB.embed_documents(
        chunks, text_col="page_content", id_col="chunk_id", dim=embedding_dim
    )
    return IngestResult(
        accepted=fresh.select("path", "filename", "file_hash", "file_size"),
        rejected=rejected,
        catalog_rows=catalog_rows,
        chunks=chunks,
        vectors=vectors,
    )


def delete_document(
    catalog: DataFrame, chunks: DataFrame, doc_id: int
) -> tuple[DataFrame, DataFrame]:
    """POST /delete-doc (backend/main.py:443-486): anti-join rewrite of
    both tables — the Spark-native metadata-predicate delete. Chunks are
    addressed by the file-level ``doc_id`` that ``ingest()`` carries on
    every chunk row. Null-safe: a NULL id compares as "not the victim"
    and survives (``~(col == x)`` would silently delete NULL-keyed rows
    because three-valued logic filters them out)."""
    new_catalog = catalog.where(F.col("id").isNull() | (F.col("id") != doc_id))
    new_chunks = chunks.where(F.col("doc_id").isNull() | (F.col("doc_id") != doc_id))
    return new_catalog, new_chunks
