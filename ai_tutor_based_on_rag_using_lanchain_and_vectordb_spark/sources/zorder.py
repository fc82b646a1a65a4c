"""Z-order (Morton-curve) clustered writes — multi-dimensional data
skipping for parquet (the OPTIMIZE ZORDER layout idea from the public
Delta/Databricks literature, built from Spark primitives).

A range-partition + sort on ONE key gives that key tight per-file
min/max ranges but leaves every other predicate column full-range in
every file, so predicate pushdown skips nothing for them. Interleaving
the bits of several normalized keys into one Morton value and
clustering on IT gives every participating column partially-localized
per-file (and per-row-group) min/max ranges — a filter on ANY of the
z-ordered columns skips most row groups.

Shape: one bounded 1-row min/max preflight per column (never a sort of
the data to rank it), then a codegen'd bit-interleave expression, a
``repartitionByRange`` on the z-value (sampled range boundaries — no
global sort), and ``sortWithinPartitions`` so row-group stats inside
each file are tight too. The z column is dropped before the write; the
layout IS the index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(ints: list[Column], bits: int) -> Column:
    """Morton-interleave `bits` low bits of each int column: bit b of
    column i lands at position b·n + i. Pure shift/and/or — stays in
    whole-stage codegen."""
    n = len(ints)
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds int64")
    out: Column | None = None
    for i, c in enumerate(ints):
        for b in range(bits):
            piece = F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
            )
            out = piece if out is None else out.bitwiseOR(piece)
    return out


def zvalue(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """The Morton key for `cols`: each column min/max-normalized to
    [0, 2^bits) with a bounded 1-row preflight, then bit-interleaved.
    Normalization is linear (rank-free): good enough for skipping, and
    it avoids the global sort a percent_rank would need."""
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:  # empty frame / all-NULL column:
            scaled.append(F.lit(0).cast("long"))  # constant key, still
            continue  # a valid (degenerate) layout — don't crash a job
        mn, mx = float(mn), float(mx)
        if mx > mn:
            norm = (F.col(c).cast("double") - mn) / (mx - mn)
        else:
            norm = F.lit(0.0)
        scaled.append(
            F.least(F.floor(norm * (top + 1)).cast("long"), F.lit(top))
        )
    return _interleave(scaled, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 8,
) -> None:
    """Cluster `df` along the Morton curve of `cols` and write parquet:
    range-partition on the z-value (sampled boundaries), sort within
    each partition so row-group min/max stats are tight, drop the key."""
    (
        df.withColumn("_zorder", zvalue(df, cols, bits))
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """FIXED-MASK two-column Morton key: the low ``bits`` bits of each
    input are interleaved directly (x bit i → position 2i, y bit i →
    2i+1 — the ``_interleave`` layout), with NO min/max normalization.
    Unlike :func:`zvalue` (whose scaling depends on a runtime data
    preflight), this form is a pure function of the row — which makes
    it mirrorable verbatim as oracle SQL (:func:`morton_sql`) and
    stable across corpus growth, the right property for an INCREMENTAL
    layout: new data files cluster compatibly with old ones because
    the curve never re-scales. Inputs must be non-negative (they are
    masked, so out-of-range wraps rather than collides)."""
    mask = (1 << bits) - 1
    return _interleave(
        [
            x.cast("long").bitwiseAND(F.lit(mask)),
            y.cast("long").bitwiseAND(F.lit(mask)),
        ],
        bits,
    )


def morton_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """:func:`morton_key` as DuckDB SQL (divide/modulo/multiply only —
    no dialect bit builtins; ``//`` is DuckDB integer division),
    term-for-term the same function; used by the DuckDB oracle of
    Q(zorder_order_keys). Inputs must be NON-NEGATIVE, the same domain
    :func:`morton_key` documents: SQL ``%`` is sign-of-dividend, so a
    negative input would diverge from Spark's ``bitwiseAND`` mask."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x_expr} AS BIGINT) % {mask + 1})"
    ys = f"(CAST({y_expr} AS BIGINT) % {mask + 1})"
    terms = []
    for i in range(bits):
        terms.append(f"(({xs} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ys} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
