"""Edit-distance similarity join — entity resolution's core primitive
(fuzzy match of names/titles across catalogs), done with bounded
blocking instead of all-pairs.

Blocking is the FastSS deletion neighborhood (Bocek et al., 2007):
``sig_k(s)`` = every string reachable from ``s`` by deleting at most
``k`` characters. If ``lev(a, b) <= k`` then deleting the (at most k)
unmatched positions from each side meets in a common string, so
``sig_k(a) ∩ sig_k(b) != ∅`` — signature-equality candidates are a
guaranteed SUPERSET of the true pairs, and the exact
``levenshtein() <= k`` verify makes the output exact.

Scale shape (the MinHash/LSH arrangement applied to edit distance):

- Work on DISTINCT values first: the name domain grows far slower than
  the fact table, and exact-duplicate groups would otherwise square.
  Multiplicities ride along as a count column.
- Signature fan-out is bounded by construction: |s|+1 signatures at
  k=1, O(|s|^k) in general — emitted by a codegen'd ``transform`` over
  positions, no Python in the row path.
- Candidates come from a shuffle join keyed on the signature string
  (hash-partitioned, map-side distinct), never a cross join; the
  verify is one ``levenshtein`` per DISTINCT candidate pair.

Reference parity: the RAG app has no fuzzy matching — this sits on the
beyond-reference curation surface next to dedup (operators/dedup.py),
where catalog-merge pipelines need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(s: Column, k: int) -> Column:
    """Array of all distinct strings obtained by deleting at most ``k``
    characters from ``s`` (includes ``s`` itself). Pure expression —
    evaluates inside whole-stage codegen."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    out = F.array(s)
    for _ in range(k):
        # delete one char at every position of every current variant
        out = F.array_distinct(
            F.flatten(
                F.transform(
                    out,
                    lambda v: F.array_union(
                        F.array(v),
                        # guard: sequence(1, 0) counts DOWN for the
                        # empty string (same pitfall as
                        # dedup.shingle_starts) — make "" map to no
                        # deletion variants explicitly
                        F.when(
                            F.length(v) > 0,
                            F.transform(
                                F.sequence(F.lit(1), F.length(v)),
                                lambda i: F.concat(
                                    v.substr(F.lit(1), i - 1),
                                    v.substr(i + 1, F.length(v)),
                                ),
                            ),
                        ).otherwise(F.array().cast("array<string>")),
                    ),
                )
            )
        )
    return out


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    k: int = 1,
) -> DataFrame:
    """All DISTINCT-value pairs of ``df[col]`` within Levenshtein
    distance ``k`` (1 <= lev <= k; identical values are collapsed, not
    paired), with each value's occurrence count.

    Output: (name_a, name_b, lev, n_a, n_b), name_a < name_b. EXACT —
    the deletion-neighborhood candidates are a superset (FastSS) and
    every candidate is verified with ``levenshtein``. NULLs are outside
    the domain (no distance is defined) and are filtered."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    names = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("name"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sigs = names.select(
        "name",
        F.explode(deletion_neighborhood(F.col("name"), k)).alias("sig"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()  # a close pair shares MANY signatures — verify once
    )
    # compute the DP once per candidate: project lev, THEN filter — a
    # where+select pair would carry one levenshtein in the Filter and a
    # second in the Project, doubling the verify step's hot path
    verified = cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("lev"),
    ).where(F.col("lev") <= k)
    na = names.select(F.col("name").alias("name_a"), F.col("n").alias("n_a"))
    nb = names.select(F.col("name").alias("name_b"), F.col("n").alias("n_b"))
    return verified.join(na, "name_a").join(nb, "name_b").select(
        "name_a", "name_b", "lev", "n_a", "n_b"
    )
