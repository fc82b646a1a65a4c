"""Python UDTF interface to the recursive splitter (SURVEY §2.9:
"Spark 3.5 Python UDTFs are an alternative" to pandas_udf+posexplode).

Same core as operators/splitter.py (one pinned implementation), exposed
as a table function usable from SQL lateral joins:

    spark.udtf.register("split_text_udtf", make_split_udtf(120, 24))
    spark.sql(\"\"\"
        SELECT d.doc_id, s.*
        FROM documents d, LATERAL split_text_udtf(d.text) s
    \"\"\")

Tradeoff vs the pandas_udf path: UDTFs stream row-at-a-time through
Python (no Arrow batching), so the pandas_udf form remains the hot-path
choice; the UDTF form exists for SQL-surface ergonomics.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from .splitter import DEFAULT_OVERLAP, DEFAULT_SIZE, split_text

_RETURN_TYPE = "chunk_index int, total_chunks int, chunk_text string, start int, end int"


def make_split_udtf(size: int = DEFAULT_SIZE, overlap: int = DEFAULT_OVERLAP):
    """Build a registered-table-function class closed over the config
    (UDTF eval signatures can't take non-column defaults)."""

    @udtf(returnType=_RETURN_TYPE)
    class SplitTextUDTF:
        def eval(self, text: str):
            chunks = split_text(text, size, overlap)
            total = len(chunks)
            for i, (c, s, e) in enumerate(chunks):
                yield i, total, c, s, e

    return SplitTextUDTF


def register(spark, name: str = "split_text_udtf",
             size: int = DEFAULT_SIZE, overlap: int = DEFAULT_OVERLAP) -> str:
    spark.udtf.register(name, make_split_udtf(size, overlap))
    return name
