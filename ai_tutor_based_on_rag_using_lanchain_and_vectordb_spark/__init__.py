"""PySpark-native analytics engine re-expressing the capabilities of the
reference RAG tutoring app (``/root/reference``) as idiomatic Spark:

- relational analytics over chat/session logs (windows, aggregates, joins)
- document ETL: validation, hashing, dedup, chunking with ordinals
- vector ops: deterministic embedding, exact + approximate k-NN
- LLM-data-pipeline operators: dedup (exact/MinHash/SimHash), similarity
  search, text analysis, multimodal column plumbing
- streaming semantics: sliding/tumbling/session windows with watermarks

Everything is DataFrame-first: plans are declared with the DataFrame/SQL
API so Catalyst handles pushdown, pruning, join selection, and AQE does
runtime re-planning. Python UDFs appear only where built-ins genuinely
cannot express the semantics, and then always Arrow-batched (pandas_udf /
mapInPandas), never row-at-a-time.
"""

__version__ = "0.1.0"
