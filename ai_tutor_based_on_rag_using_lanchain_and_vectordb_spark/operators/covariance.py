"""Exact distributed covariance (second-moment) matrix over an
embedding column, and a PCA layer on top of it.

Why this exists: embedding post-processing — whitening, PCA truncation,
ABTT-style common-component removal — is a standard stage of a modern
retrieval / SemDeDup pipeline (the reference embeds every chunk via
GoogleGenerativeAIEmbeddings, backend/chroma_utils.py:25-28; anything
beyond raw cosine needs the corpus covariance first). At 100 TB the
only viable plan is the classic one-pass moments sweep: each partition
reduces its rows to a single d×d partial (an O(b·d²) numpy outer
product per Arrow batch), and the shuffle moves ONLY those d²-sized
partials — never the vectors.

Exactness contract (the oracle-parity trick): components are first
quantized to ``QUANT_DIGITS`` decimal places with the engine-portable
``floor(x·10^q + 0.5)`` formula (functions/exact.pround), making every
subsequent sum an INTEGER sum — accumulated per ≤ _CHUNK_ROWS chunk in
int64 (safe for the documented |x| ≤ 2 input domain: per-product
≤ 4e14, 8192-row chunks ⇒ ≤ 3.3e18 < 2^63; a loud guard enforces the
domain, and chunking is enforced in the fold rather than assumed from
Spark's configurable Arrow batch size) and merged in DECIMAL(38,0)
Spark-side, HUGEINT oracle-side. The final covariance is
one double expression over those exact integers, mirrored
token-for-token in the DuckDB oracle, so the doubles are bit-equal.

Inputs must be finite (the embeddings table's zero-norm contract in
plans/vectors.py already excludes NaN/Inf); nulls are filtered.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_DIGITS = 7
_SCALE = 10 ** QUANT_DIGITS
# cov = (sxy - sx·sy/n)/n, all in quantized units → descale by 10^(2q)
_DESCALE = float(10 ** (2 * QUANT_DIGITS))

_PARTIAL_SCHEMA = "i int, j int, s long, cnt long"

# int64 headroom bound for per-chunk products: |q| ≤ 2·SCALE,
# product ≤ 4e14, so chunks of ≤ 8192 rows sum to ≤ 3.3e18 < 2^63 —
# enforced HERE rather than assumed from Spark's default Arrow batch
# size (maxRecordsPerBatch is user-configurable)
_CHUNK_ROWS = 8192


def _one_moment_frame(np, pd, vecs):
    """(i, j, s, cnt) partial frame for one stack of ≤ _CHUNK_ROWS
    vectors."""
    x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    if not np.isfinite(x).all() or np.abs(x).max() > 2.0:
        raise ValueError(
            "covariance_matrix input domain is finite |x| <= 2 "
            "(int64 overflow headroom for the exact integer sums); "
            f"got max |x| = {np.abs(x).max()!r}"
        )
    q = np.floor(x * _SCALE + 0.5).astype(np.int64)
    b, d = q.shape
    sxy = q.T @ q  # int64 (d, d); |entry| ≤ b·(2·SCALE)² < 2^63
    sx = q.sum(axis=0)
    iu, ju = np.triu_indices(d)
    return pd.DataFrame(
        {
            "i": np.concatenate([iu, np.arange(d)]).astype(np.int32),
            "j": np.concatenate([ju, np.full(d, -1)]).astype(np.int32),
            "s": np.concatenate([sxy[iu, ju], sx]),
            "cnt": np.full(len(iu) + d, b, dtype=np.int64),
        }
    )


def _moments_fold(vec_col: str, key_col: str | None = None):
    """mapInPandas fold: batches of vectors → one partial frame per
    batch (per key when ``key_col`` is set) with rows
    (i, j, s=Σqᵢqⱼ, cnt) for i ≤ j plus mean rows (i, -1, s=Σqᵢ, cnt).
    Every row carries the batch count so the downstream per-(i,j)
    SUM(cnt) reconstructs n without a second aggregate."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if key_col is None:
                vecs = pdf[vec_col].dropna()
                for lo in range(0, len(vecs), _CHUNK_ROWS):
                    yield _one_moment_frame(
                        np, pd, vecs.iloc[lo:lo + _CHUNK_ROWS]
                    )
                continue
            sub = pdf[[key_col, vec_col]].dropna(subset=[key_col, vec_col])
            for key, grp in sub.groupby(key_col, sort=True):
                for lo in range(0, len(grp), _CHUNK_ROWS):
                    frame = _one_moment_frame(
                        np, pd, grp[vec_col].iloc[lo:lo + _CHUNK_ROWS]
                    )
                    frame.insert(0, key_col, key)
                    yield frame

    return run


def second_moments(
    df: DataFrame, vec_col: str = "embedding", key_col: str | None = None
) -> DataFrame:
    """Exact integer second moments of the quantized vectors: rows
    (i, j, s, n_rows) where j ≥ 0 rows hold Σqᵢqⱼ (upper triangle,
    i ≤ j) and j = -1 rows hold Σqᵢ. One narrow shuffle of d²-sized
    partials; the vectors themselves never move. With ``key_col``,
    per-group moments (rows gain the key; partials are per-(batch,key),
    so a group spread over P partitions still ships only P·d² rows)."""
    keys = [key_col] if key_col is not None else []
    cols = keys + [vec_col]
    cond = F.col(vec_col).isNotNull()
    if key_col is not None:
        cond = cond & F.col(key_col).isNotNull()
    schema = _PARTIAL_SCHEMA
    if key_col is not None:
        ktype = dict(
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        )[key_col]
        schema = f"{key_col} {ktype}, " + _PARTIAL_SCHEMA
    partials = df.select(*cols).where(cond).mapInPandas(
        _moments_fold(vec_col, key_col), schema
    )
    return partials.groupBy(*keys, "i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s"),
        F.sum("cnt").alias("n_rows"),
    )


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", key_col: str | None = None
) -> DataFrame:
    """Upper-triangle covariance rows (i, j, n_rows, sxy, cov) — per
    group when ``key_col`` is set (the per-class second-order statistic
    behind LDA / Mahalanobis scoring).

    ``sxy`` is the exact integer cross-moment (quantized units),
    reported as its digit string — see the projection comment below;
    ``cov`` is the double expression
    ``((sxy - sx·sy/n)/n)/10^(2q)`` mirrored verbatim in the oracle.
    """
    keys = [key_col] if key_col is not None else []
    m = second_moments(df, vec_col, key_col)
    means = m.where(F.col("j") == -1).select(
        *keys, F.col("i"), F.col("s").cast("double").alias("_mean_s")
    )
    pairs = m.where(F.col("j") >= 0)
    # means is |keys|·d rows — bounded for a bounded-cardinality key
    # (class labels), one row per dimension otherwise — broadcast
    joined = (
        pairs.join(
            F.broadcast(means.withColumnRenamed("_mean_s", "_sx")),
            keys + ["i"],
        )
        .join(
            F.broadcast(
                means.select(
                    *keys, F.col("i").alias("j"), F.col("_mean_s").alias("_sy")
                )
            ),
            keys + ["j"],
        )
    )
    n = F.col("n_rows")
    cov = (
        (F.col("s").cast("double") - F.col("_sx") * F.col("_sy") / n) / n
    ) / F.lit(_DESCALE)
    # sxy is reported as the DIGIT STRING of the exact DECIMAL(38,0)
    # (oracle: HUGEINT → VARCHAR): a long would silently null once
    # |Σqᵢqⱼ| exceeds int64 (~1e8+ rows at the |x| ≤ 2 domain) under
    # Spark's non-ANSI cast while the oracle's overflow RAISES — a
    # divergence, not a bound; and a raw decimal column loses parity
    # in the comparator (DuckDB renders decimals as float64). The
    # string is exact at any magnitude on both engines.
    return joined.select(
        *keys,
        "i",
        "j",
        "n_rows",
        F.col("s").cast("string").alias("sxy"),
        cov.alias("cov"),
    )


def covariance_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    key_col: str | None = None,
) -> str:
    """DuckDB mirror of :func:`covariance_matrix` — same quantization
    formula, exact HUGEINT sums, same final double expression."""
    k = f"{key_col}, " if key_col else ""
    ka = f"a.{key_col} AS {key_col}, " if key_col else ""
    kga = f"a.{key_col}, " if key_col else ""
    kp = f"p.{key_col} AS {key_col}, " if key_col else ""
    keq_a = f"AND a.{key_col} = b.{key_col} " if key_col else ""
    keq_ma = f"AND ma.{key_col} = p.{key_col} " if key_col else ""
    keq_mb = f"AND mb.{key_col} = p.{key_col} " if key_col else ""
    knull = f"AND {key_col} IS NOT NULL " if key_col else ""
    return f"""
        WITH x AS (
            SELECT {k}vec_id,
                   CAST(unnest(generate_series(1, len({vec_col}))) - 1 AS INT) AS i,
                   CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * {_SCALE} + 0.5)
                        AS BIGINT) AS q
            FROM {table}
            WHERE {vec_col} IS NOT NULL {knull}
        ), means AS (
            SELECT {k}i, CAST(sum(q) AS DOUBLE) AS ms FROM x GROUP BY {k}i
        ), pairs AS (
            SELECT {ka}a.i AS i, b.i AS j, count(*) AS n_rows,
                   sum(a.q * b.q) AS sxy
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i {keq_a}
            GROUP BY {kga}a.i, b.i
        )
        SELECT {kp}p.i AS i, p.j AS j, p.n_rows AS n_rows,
               CAST(p.sxy AS VARCHAR) AS sxy,
               ((CAST(p.sxy AS DOUBLE) - ma.ms * mb.ms / p.n_rows)
                / p.n_rows) / {_DESCALE!r} AS cov
        FROM pairs p
        JOIN means ma ON ma.i = p.i {keq_ma}
        JOIN means mb ON mb.i = p.j {keq_mb}
    """


def pca_components(cov_rows, dim: int):
    """Driver-side eigendecomposition of the collected covariance rows
    (bounded O(d²) input by construction — this is the sketch-merge
    pattern: the distributed pass reduced 100 TB to d² numbers).
    Returns (eigvals desc, components[dim, dim] rows = eigvecs)."""
    import numpy as np

    c = np.zeros((dim, dim))
    for r in cov_rows:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1]
    return w[order], v[:, order].T


def project(df: DataFrame, components, vec_col: str = "embedding",
            out_col: str = "pca", n_components: int | None = None) -> DataFrame:
    """Map-only PCA projection: broadcast the (q, d) component matrix
    inside the Arrow fold; emits the input's non-vector columns plus the
    projected array<double>."""
    import numpy as np

    comp = np.asarray(components, dtype=np.float64)
    if n_components is not None:
        comp = comp[:n_components]
    keep = [f for f in df.schema.fields if f.name != vec_col]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    schema = (schema + ", " if schema else "") + f"{out_col} array<double>"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) if len(pdf) else np.zeros((0, comp.shape[1]))
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(x @ comp.T)
            yield out

    return df.where(F.col(vec_col).isNotNull()).mapInPandas(run, schema)
