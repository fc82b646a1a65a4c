"""Line-oriented text-format sources for the training-data pipeline:
JSONL (the lingua franca of LLM corpora) and CSV, with schemas pinned
(never inferred — inference is a full extra pass over 100 TB) and
malformed rows captured as a side channel instead of failing the job.

The reference ingests documents only via per-request file upload
(backend/main.py:305-427); a corpus-scale engine also needs bulk text
formats. Both readers land on the same canonical document schema the
rest of the pipeline (splitter → embed → index) consumes.

Implementation note: rows are read with ``spark.read.text`` and parsed
with ``from_json`` / ``from_csv`` expressions rather than the native
JSON/CSV readers' ``_corrupt_record`` mode — the corrupt-record column
is unusable without caching the raw scan (Spark's
QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction fires as soon as a
downstream aggregate prunes to it), and caching the raw input is
exactly what a 100 TB backfill can't do. The text+expression form is
splittable, map-only, and lets good/bad share one scan definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical bulk-document schema (matches the documents fixture shape;
# metadata stays an open map as in backend/chroma_utils.py:119-125).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

CSV_SCHEMA = T.StructType([f for f in DOCUMENT_SCHEMA.fields if f.name != "meta"])


def _split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    ok = F.col("d").isNotNull() & F.col("d.doc_id").isNotNull()
    good = parsed.where(ok).select("d.*")
    bad = parsed.where(~ok).select(F.col("value").alias("raw_line"))
    return good, bad


def read_jsonl_documents(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON documents.

    Returns ``(good, bad)``: schema-conforming rows, and the raw text of
    malformed lines (the bulk-scan analog of the ingest pipeline's
    rejected side-output — a corrupt line must never kill a backfill).
    """
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        "value",
        F.from_json("value", DOCUMENT_SCHEMA).alias("d"),
    )
    return _split(parsed)


def read_csv_documents(
    spark: SparkSession, path: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Read CSV documents with the pinned flat schema (CSV carries no
    map column). Malformed rows surface on the same side channel."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    if header:
        header_line = ",".join(f.name for f in CSV_SCHEMA.fields)
        lines = lines.where(F.col("value") != header_line)
    parsed = lines.select(
        "value",
        F.from_csv("value", CSV_SCHEMA.simpleString()).alias("d"),
    )
    return _split(parsed)
