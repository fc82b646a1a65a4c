"""Count-Min sketch: approximate frequencies for EVERY key in bounded
space — the point-query companion to the heavy-hitter summary
(operators/freq.py counts only keys above phi; CMS answers any key).

Cormode & Muthukrishnan, 2005: d hash rows × w buckets of counters.
Each occurrence of a key increments one bucket per row; a point query
reads its d buckets and takes the MIN. Guarantees (n = total count):

- est >= true  ALWAYS (counters only ever over-count), and
- est <= true + (e/w)·n with probability >= 1 − e^(−d).

Spark shape (the mergeable-summaries arrangement, like KMV/MG):

- The build is ONE pass: explode each row into its d (row, bucket)
  coordinates (codegen'd expressions — no UDF), then one
  groupBy(row, bucket).sum with map-side partial aggregation, so a hot
  key contributes one partial row per map partition, never a skewed
  shuffle. State is bounded by construction: <= d·w rows regardless of
  input size.
- Sketches MERGE by unioning and re-summing (counter addition is
  associative/commutative) — shard-parallel builds, micro-batch
  streaming accumulation, and cross-day rollups all come free.
- Point queries join the (tiny, <= d·w rows) sketch; the min-over-rows
  is a groupBy(key).min.

Hashes are the PORTABLE md5-derived 60-bit family (row index salted
into the digest), so the full pipeline — bucket placement, counter
sums, min-over-rows — is recomputable by a plain SQL oracle
(plans/misc.cms_user_counts). At 100 TB the md5-per-row cost is real
but the sketch build reads each row once either way; swap
``portable_bucket`` for an xxhash64 family when oracle parity is not
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def portable_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in hash row ``row``: first 15 hex chars of
    md5('<row>|<key>') parsed base-16, mod width. Identical in DuckDB:
    ``('0x' || substr(md5(row || '|' || key), 1, 15))::BIGINT % width``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{row}|"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(int(width))


def _coords(col: str, width: int, depth: int):
    """The (row, bucket) coordinate explode — ONE definition shared by
    build and estimate: every estimate is only an upper bound if the
    probe computes byte-identical coordinates to the build."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    portable_bucket(F.col(col), i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )


def cms_build(
    df: DataFrame,
    col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Build the sketch: (row int, bucket long, cnt long), <= d·w rows.
    NULL keys are outside the domain (freq.py convention)."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    coords = _coords(col, width, depth)
    return (
        df.where(F.col(col).isNotNull())
        .select(coords.alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise sum of same-shape sketches (counter addition)."""
    if not sketches:
        raise ValueError("cms_merge requires at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Point-query estimates for ``keys[col]``: (col, est). The keys
    frame explodes into its d coordinates, joins the sketch (broadcast:
    <= d·w rows by construction), and takes min-over-rows; a bucket
    absent from the sketch counts 0 (nothing ever hashed there)."""
    coords = _coords(col, width, depth)
    kc = (
        keys.where(F.col(col).isNotNull())
        .distinct()
        .select(col, coords.alias("c"))
        .select(col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    )
    return (
        kc.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long")))
        .groupBy(col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )
