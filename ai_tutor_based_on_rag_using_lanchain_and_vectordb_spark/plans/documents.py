"""Document-pipeline queries over the ``documents`` table: exact dedup
(the reference's UNIQUE(file_hash) gate, backend/db_utils.py:173,221-225),
chunking with ordinals (backend/chroma_utils.py:119-125), previews, and
the training-data text-analysis operators (token counts, quality scores,
language-ID, n-gram Jaccard near-dup, fingerprinting).

Scale notes:

- Everything is expression-only (no Python UDFs): the text statistics
  inline into the parquet scan's codegen stage, so a 100 TB corpus pass
  is one scan + one shuffle (for grouped ops) max.
- The n-gram Jaccard near-dup join blocks on (lang, shingle) — the
  classic inverted-index join — so candidate generation never goes
  quadratic; the final Jaccard check only touches pairs sharing ≥1
  shingle, with a group-count instead of array intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as TX
from ..functions import exact as X
from ..functions import textstats as TS

CHUNK_SIZE = 120
CHUNK_OVERLAP = 24
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP  # 96

# Document-frequency ceiling for the inverted-index near-dup join: a
# shingle appearing in more than MAX_SHINGLE_DF documents (boilerplate,
# license headers) is dropped from candidate generation — the standard
# MinHash-literature stoplist-by-df. Without it one hot shingle makes an
# O(df²) pair explosion and a skewed pair key at 100 TB scale. |A| and
# |B| (the Jaccard denominators) still count every shingle; only the
# intersection evidence is restricted to informative shingles.
MAX_SHINGLE_DF = 100


def doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one group per sha256(text), keeping
    the smallest doc_id (the UNIQUE(file_hash) ingest gate re-expressed
    as hash-groupBy; reference backend/db_utils.py:221-225)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", TX.file_hash(F.col("text")))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


def doc_previews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 preview + catalog-scan shape (frontend/src/App.js:71 +
    backend/db_utils.py:253-257)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.preview(F.col("text")).alias("preview"),
        F.length("text").cast("long").alias("text_len"),
        "lang",
        "source",
    )


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish sub-word tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TS.token_count(F.col("text")).cast("long").alias("ws_tokens"),
        TS.bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punctuation density, stopword ratio, composite."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TS.punct_ratio(F.col("text")).alias("punct_ratio"),
        TS.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        TS.quality_score(F.col("text")).alias("quality"),
    )


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic via per-language stopword-marker counts."""
    docs = load_table(spark, sf_dir, "documents")
    scores = TS.lang_scores(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in sorted(scores)],
    )
    # argmax over the materialized score columns (computed once, not
    # re-derived from text per candidate language)
    pairs = [
        F.struct(F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(scores)
    ]
    best = F.array_max(F.array(*pairs))
    return scored.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def doc_fixed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 chunk ordinals over a fixed-stride chunker (size 120 / overlap
    24): every chunk carries (chunk_index, total_chunks) exactly like the
    reference's metadata enrichment (backend/chroma_utils.py:119-125).
    The recursive separator-aware splitter lives in operators/splitter.py
    (non-SQL-expressible; property-tested instead)."""
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(
        F.greatest(F.length("text") - CHUNK_OVERLAP, F.lit(1)) / F.lit(float(CHUNK_STRIDE))
    ).cast("long")
    return (
        docs.withColumn("total_chunks", n_chunks)
        .select(
            "doc_id",
            "text",
            "total_chunks",
            F.posexplode(F.sequence(F.lit(0).cast("long"), F.col("total_chunks") - 1)),
        )
        .select(
            "doc_id",
            F.col("col").alias("chunk_index"),
            "total_chunks",
            F.expr(
                f"substring(text, CAST(col * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_SIZE})"
            ).alias("chunk_text"),
        )
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (content signature)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TS.rolling_fingerprint(F.col("text")).alias("fingerprint"),
    )


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word-n-gram shingles per doc: tokens → sliding n-grams.
    Built with transform over an index sequence (JVM-side). The explicit
    repartition fans the generation out — a single parquet split would
    otherwise evaluate every doc's shingle expressions in one task."""
    from ..session import default_parallelism

    from ..operators.dedup import shingle_starts

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.transform(
        shingle_starts(toks, n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        docs.repartition(default_parallelism())
        .select("doc_id", "lang", F.explode(grams).alias("s"))
        .distinct()
    )


def ngram_jaccard_pairs_df(
    docs: DataFrame, threshold: float = 0.05, max_df: int = MAX_SHINGLE_DF
) -> DataFrame:
    """Near-duplicate pairs by 3-gram Jaccard ≥ ``threshold``, blocked on
    (lang, shingle): inverted-index self-join → per-pair intersection
    count → |A∪B| = |A|+|B|−|A∩B|. No quadratic candidate step; shingles
    with document frequency > ``max_df`` are excluded from candidate
    generation (hot-key ceiling)."""
    # no .cache(): the shingle projection is cheap to recompute, and a
    # lingering cached RDD steals executor memory from later queries
    sh = _shingles(docs)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # Inverted-index pair generation (no self-join): group the posting
    # list per (lang, shingle), emit each unordered doc pair inside the
    # list, then count pair occurrences = |A∩B|. One shuffle on the
    # shingle key + one on the pair key; document-frequency bounds the
    # per-group fan-out (df ≤ ~15 here ⇒ ≤ ~100 pairs/shingle). The
    # explicit repartition keeps the explode stage parallel (AQE would
    # coalesce the small grouped output to one partition otherwise).
    from ..session import default_parallelism

    ids = F.col("ids")
    pair_list = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ids) - 1),
            lambda j: F.transform(
                F.sequence(F.lit(0), j - 1),
                lambda i: F.struct(
                    F.element_at(ids, i + 1).alias("doc_a"),
                    F.element_at(ids, j + 1).alias("doc_b"),
                ),
            ),
        )
    )
    pairs = (
        sh.groupBy("lang", "s")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        # df ceiling: 2 ≤ |posting list| ≤ max_df — a hot shingle
        # (boilerplate) would otherwise fan out O(df²) pairs on one key
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_df))
        .repartition(default_parallelism())
        .select(F.explode(pair_list).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("inter") / (F.col("ca.n") + F.col("cb.n") - F.col("inter"))
    return (
        pairs.join(F.broadcast(ca), F.col("doc_a") == F.col("ca.doc_id"))
        .join(F.broadcast(cb), F.col("doc_b") == F.col("cb.doc_id"))
        .where(jac >= threshold)
        .select("doc_a", "doc_b", X.pround(jac, 4).alias("jaccard"))
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs over the ``documents`` table (see
    :func:`ngram_jaccard_pairs_df`)."""
    return ngram_jaccard_pairs_df(load_table(spark, sf_dir, "documents"))


def minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-checking recall for the MinHash-LSH near-dup path: ground
    truth = exact shingle-Jaccard pairs (inverted index, uncapped) at
    ≥ 0.8; candidates = LSH-banded MinHash (32 hashes × 8 bands — r=4
    rows/band puts the S-curve's high-recall region at j ≥ 0.8) with the
    same exact-Jaccard verification. One row: recall + pass/fail at 0.9.
    Non-SQL-expressible (LSH) → rows-only driver check; the pass flag
    and a pytest assertion make it a real gate anyway."""
    from ..operators.dedup import minhash_dedup_pairs

    docs = load_table(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs_df(docs, threshold=0.8, max_df=10**9).select(
        "doc_a", "doc_b"
    )
    approx = minhash_dedup_pairs(
        docs, num_hashes=32, bands=8, threshold=0.8
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.lit(1).alias("_hit"),
    )
    joined = exact.join(approx, ["doc_a", "doc_b"], "left")
    agg = joined.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_caught"),
    )
    recall = F.when(F.col("n_exact") == 0, F.lit(1.0)).otherwise(
        F.col("n_caught") / F.col("n_exact")
    )
    return agg.select(
        F.lit("minhash_lsh").alias("strategy"),
        "n_exact",
        "n_caught",
        F.round(recall, 4).alias("recall"),
        (recall >= 0.9).alias("passed"),
    )


def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate *clusters*: the Jaccard pair set resolved into
    connected components (transitive closure), giving one deterministic
    cluster id — min doc_id — per group of mutually-similar documents.
    This is the "keep one per cluster" dedup step that pairwise output
    alone can't provide (A~B, B~C ⇒ {A,B,C} one cluster)."""
    from ..operators.components import connected_components

    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )


QUERIES = {
    "doc_dedup_exact": doc_dedup_exact,
    "neardup_components": neardup_components,
    "minhash_recall": minhash_recall,
    "doc_previews": doc_previews,
    "doc_token_stats": doc_token_stats,
    "doc_quality": doc_quality,
    "doc_lang_id": doc_lang_id,
    "doc_fixed_chunks": doc_fixed_chunks,
    "doc_fingerprints": doc_fingerprints,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in TS.EN_STOPWORDS)

_LANG_SCORE_SQL = {
    lang: " + ".join(
        f"CAST((length(' ' || lower(text) || ' ') - "
        f"length(replace(' ' || lower(text) || ' ', '{m}', ''))) / {len(m)} AS INT)"
        for m in markers
    )
    for lang, markers in TS.LANG_MARKERS.items()
}


ORACLE = {
    "doc_dedup_exact": """
        SELECT sha256(text) AS content_hash,
               min(doc_id) AS keep_doc_id,
               CAST(count(*) AS BIGINT) AS dup_count
        FROM documents GROUP BY sha256(text)
    """,
    "doc_previews": """
        SELECT doc_id, substring(text, 1, 50) || '...' AS preview,
               CAST(length(text) AS BIGINT) AS text_len, lang, source
        FROM documents
    """,
    "doc_token_stats": r"""
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                   AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                   AS BIGINT) AS bpe_tokens
        FROM documents
    """,
    "doc_quality": r"""
        WITH base AS (
            SELECT doc_id, text,
                   length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS n_punct,
                   greatest(length(text), 1) AS n_chars,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS toks
            FROM documents
        ), ratios AS (
            SELECT doc_id,
                   (floor((n_punct * 1.0 / n_chars) * 10000 + 0.5) / 10000) AS punct_ratio,
                   (floor((len(list_filter(toks, t -> list_contains([{stops}], t))) * 1.0
                         / greatest(len(toks), 1)) * 10000 + 0.5) / 10000) AS stopword_ratio,
                   n_chars, n_punct, toks
            FROM base
        )
        SELECT doc_id, punct_ratio, stopword_ratio,
               (floor(((least(length(text) / 500.0, 1.0)
                      + (1.0 - least((floor((n_punct * 1.0 / greatest(length(text),1)) * 10000 + 0.5) / 10000) * 4, 1.0))
                      + least((floor((len(list_filter(toks, t -> list_contains([{stops}], t))) * 1.0
                              / greatest(len(toks), 1)) * 10000 + 0.5) / 10000) * 5, 1.0)) / 3) * 10000 + 0.5) / 10000) AS quality
        FROM ratios JOIN documents USING (doc_id)
    """.replace("{stops}", _STOPLIST_SQL),
    "doc_lang_id": """
        WITH scored AS (
            SELECT doc_id, lang,
                   {score_exprs}
            FROM documents
        ), best AS (
            SELECT *,
                   list_sort([
                       {{'score': score_de, 'lang': 'de'}},
                       {{'score': score_en, 'lang': 'en'}},
                       {{'score': score_es, 'lang': 'es'}},
                       {{'score': score_fr, 'lang': 'fr'}},
                       {{'score': score_zh, 'lang': 'zh'}}
                   ])[5] AS b
            FROM scored
        )
        SELECT doc_id, lang,
               CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred,
               CAST(score_de AS BIGINT) AS score_de,
               CAST(score_en AS BIGINT) AS score_en,
               CAST(score_es AS BIGINT) AS score_es,
               CAST(score_fr AS BIGINT) AS score_fr,
               CAST(score_zh AS BIGINT) AS score_zh
        FROM best
    """.format(
        score_exprs=", ".join(
            f"({_LANG_SCORE_SQL[lang]}) AS score_{lang}" for lang in sorted(_LANG_SCORE_SQL)
        )
    ),
    "doc_fixed_chunks": """
        SELECT doc_id, chunk_index, total_chunks,
               substring(text, CAST(chunk_index * 96 + 1 AS INT), 120) AS chunk_text
        FROM (
            SELECT doc_id, text, total_chunks,
                   unnest(generate_series(0, total_chunks - 1)) AS chunk_index
            FROM (
                SELECT doc_id, text,
                       CAST(ceil(greatest(length(text) - 24, 1) / 96.0) AS BIGINT)
                           AS total_chunks
                FROM documents
            )
        )
    """,
    "doc_fingerprints": """
        SELECT doc_id,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE list_reduce(
                        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                        (a, b) -> (a * 31 + b) % 2147483647)
               END AS fingerprint
        FROM documents
    """,
    "ngram_jaccard_pairs": r"""
        WITH """ + "_JACCARD_CTES" + r"""
        SELECT doc_a, doc_b,
               (floor((inter * 1.0 / (ca.n + cb.n - inter)) * 10000 + 0.5) / 10000) AS jaccard
        FROM pairs
        JOIN counts ca ON ca.doc_id = doc_a
        JOIN counts cb ON cb.doc_id = doc_b
        WHERE inter * 1.0 / (ca.n + cb.n - inter) >= 0.05
    """,
    "neardup_components": r"""
        WITH RECURSIVE """ + "_JACCARD_CTES" + r""", good AS (
            SELECT doc_a, doc_b
            FROM pairs
            JOIN counts ca ON ca.doc_id = doc_a
            JOIN counts cb ON cb.doc_id = doc_b
            WHERE inter * 1.0 / (ca.n + cb.n - inter) >= 0.05
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM good
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM good
        ), reach(node, label) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
        )
        SELECT node AS doc_id, min(label) AS component
        FROM reach GROUP BY node
    """,
}

# Shared candidate-pair CTE chain (3-gram shingles → inverted-index
# pairs → per-doc shingle counts); spliced into both oracles above so
# the pair definition can't drift between them.
_JACCARD_CTES_SQL = r"""toks AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS t
            FROM documents
        ), idx AS (
            SELECT doc_id, lang, t,
                   unnest(generate_series(1, len(t) - 2)) AS i
            FROM toks
        ), sh AS (
            SELECT DISTINCT doc_id, lang,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
            FROM idx
        ), counts AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), informative AS (
            SELECT lang, s FROM sh GROUP BY lang, s
            HAVING count(*) BETWEEN 2 AND {max_df}
        ), sh2 AS (
            SELECT sh.* FROM sh SEMI JOIN informative
              ON sh.lang = informative.lang AND sh.s = informative.s
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM sh2 a JOIN sh2 b
              ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )"""

_JACCARD_CTES_SQL = _JACCARD_CTES_SQL.replace("{max_df}", str(MAX_SHINGLE_DF))

for _k in ("ngram_jaccard_pairs", "neardup_components"):
    ORACLE[_k] = ORACLE[_k].replace("_JACCARD_CTES", _JACCARD_CTES_SQL)
