"""Python UDTF splitter: SQL lateral-join surface must agree with the
pandas_udf path (same core, two interfaces)."""

from __future__ import annotations

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import register_views
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import (
    splitter,
    udtf_splitter,
)


def test_udtf_matches_pandas_udf_path(spark, sf_dir):
    register_views(spark, sf_dir)
    udtf_splitter.register(spark, "split_text_udtf", size=120, overlap=24)
    via_sql = spark.sql(
        """
        SELECT d.doc_id, s.chunk_index, s.total_chunks, s.chunk_text
        FROM documents d, LATERAL split_text_udtf(d.text) s
        """
    ).toPandas()

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    via_pandas = (
        splitter.split_documents(docs, text_col="text", id_col="doc_id",
                                 size=120, overlap=24)
        .selectExpr("doc_id", "chunk_index", "total_chunks",
                    "page_content AS chunk_text")
        .toPandas()
    )
    key = ["doc_id", "chunk_index"]
    a = via_sql.sort_values(key).reset_index(drop=True)
    b = via_pandas.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["chunk_text"] == b["chunk_text"]).all()
    assert (a["total_chunks"] == b["total_chunks"]).all()
