"""BM25 ranked lexical retrieval — the classic RAG hybrid-search
counterpart to the vector k-NN stack (operators/knn.py).

Reference parity: the RAG app retrieves by embedding similarity only
(backend/chroma_utils.py); lexical BM25 is the standard companion
retriever in production RAG, so it joins the beyond-reference surface
next to TF-IDF embeddings (operators/embed.py).

Scale shape (100 TB corpus, short queries):

- The postings list (term, doc_id, tf) is ONE explode + groupBy of the
  corpus — the same shuffle any inverted index costs; persisted/
  bucketed by term it is partition-prunable per query term.
- A query touches only its own terms' postings: the plan SEMI-filters
  postings on the (tiny, broadcast) query-term list before anything
  else, so scoring cost is O(matched postings), not O(corpus).
- Document length and corpus stats (N, avgdl) are a groupBy reusing
  the postings shuffle and a 1-row broadcast aggregate.
- Top-k per query is a WindowGroupLimit (row_number <= k): each map
  task keeps k rows per query before the final shuffle.

Score: textbook Robertson/Okapi BM25 with the Lucene idf,

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(t, d) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Oracle note: ln() is the one place the repo's float-parity convention
(decimal-exact sums + pround; "log-space hinges on libm ulp agreement",
plans/trainprep.bigram_lm_score) is deliberately relaxed — each term
contribution is pre-rounded to 6 dp, summed in DECIMAL, and the total
re-rounded to 4 dp, so a JVM-vs-libm 1-ulp disagreement in ln flips a
hash only when a contribution lands within ~1e-16 of a 1e-6 rounding
boundary (probability ~1e-10 per matched posting, and frozen for a
fixed dataset). The ranking itself orders by the ROUNDED score with a
doc_id tiebreak, so order is ulp-stable too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact as X
from .dedup import tokens_col

K1 = 1.2
B = 0.75


def bm25_postings(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — one explode + one shuffle on (doc, term).
    Persist bucketed by term for partition-pruned query-time scans."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_col(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def bm25_search(
    spark: SparkSession,
    docs: DataFrame,
    queries: list,
    k: int = 5,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per query by BM25: (query_id, doc_id, rank,
    score). ``queries`` is a small [(query_id, text)] list — the
    broadcast side, like the k-NN query vectors."""
    postings = bm25_postings(docs, id_col, text_col)
    # doc length + corpus stats reuse the postings aggregation
    dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl") / F.count("*")).cast("double").alias("avgdl"),
    )

    qterms = [
        (qid, t)
        for qid, text in queries
        for t in dict.fromkeys(text.lower().split())  # dedup, keep order
        if t
    ]
    qdf = spark.createDataFrame(qterms, "query_id string, term string")

    # semi-filter postings on the broadcast query-term list FIRST: the
    # scan touches only matched terms' postings
    matched = postings.join(
        F.broadcast(qdf.select("term").distinct()), "term", "left_semi"
    )
    df_counts = matched.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    scored = (
        F.broadcast(qdf).alias("q")
        .join(matched, "term")
        .join(F.broadcast(df_counts), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    # pre-round each contribution, sum in decimal (order-independent),
    # re-round the total — the bigram_lm_score float-parity pattern
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        X.pround(
            F.sum(X.pround(contrib, 6).cast(X.DEC)).cast("double"), 4
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", F.col("rank").cast("long").alias("rank"),
                "score")
    )
