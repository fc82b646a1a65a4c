"""Explicit StructType schemas — never inferred.

Two groups:

1. Driver testdata tables (``/root/testdata/sf*/*.parquet``, see
   TESTDATA.md / FIXTURES.md).
2. Engine-native tables mirroring the reference's SQLite DDL
   (``backend/db_utils.py:45-55`` application_logs,
   ``backend/db_utils.py:167-176`` document_store) and its chunk/vector
   shapes (``backend/chroma_utils.py:119-133``).

At 100 TB, pinning schemas matters: schema inference forces a full-file
scan pass and drifts across partitions; explicit StructTypes keep the
Parquet reader vectorized and let Catalyst prune columns from the scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- driver tables

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

DRIVER_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ------------------------------------------------------- engine-native tables

# Chat log table — mirrors application_logs DDL (reference
# backend/db_utils.py:45-55). AUTOINCREMENT id becomes an externally
# assigned long (monotonically_increasing_id at ingest).
CHAT_LOGS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("user_query", T.StringType()),
        T.StructField("gpt_response", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("emotion", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

# Document catalog — mirrors document_store DDL (reference
# backend/db_utils.py:167-176). UNIQUE(file_hash) becomes an
# ingest-time anti-join (operators/dedup.py).
DOC_CATALOG = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("file_size", T.LongType()),
        T.StructField("file_type", T.StringType()),
        T.StructField("file_hash", T.StringType()),
        T.StructField("upload_timestamp", T.TimestampType()),
    ]
)

# Chunk row — the reference's langchain Document + enriched metadata
# (backend/chroma_utils.py:119-125); open metadata dict -> MapType.
CHUNKS = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("total_chunks", T.IntegerType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("page_content", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Vector row — the Chroma collection shape (backend/chroma_utils.py:128-133):
# per-chunk fixed-dimension vector keyed by chunk id, filterable metadata.
VECTORS = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

# Multimodal asset row — opaque binary payload + typed metadata
# (images/audio/video as binary columns; decode stages are Pandas UDFs).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)
