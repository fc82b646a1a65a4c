"""Distributed interval-overlap join via time-grid bucketing.

Joins two interval tables on the predicate ``l.start <= r.end AND
r.start <= l.end`` (closed-interval overlap) WITHOUT a cross join:
each interval is exploded onto a coarse epoch grid (``sequence`` of
bucket ids covering it), the two sides equi-join on the bucket id, and
the true overlap predicate filters the candidates.  A pair of
overlapping intervals can share many grid cells, so each candidate
pair is emitted exactly once by the *responsibility rule*: only the
bucket containing ``greatest(l.start, r.start)`` — a bucket both
intervals provably cover — keeps the pair.

Scale shape (the reason this exists): the naive plan is a cross join
with an inequality filter — O(|L|·|R|) compared pairs, a broadcast
nested-loop at any size Catalyst can't broadcast, and a single-task
disaster at corpus scale.  The grid join's cost is
O(|L|·span/W + |R|·span/W) exploded rows shuffled by bucket id plus
the true-positive pairs; with W chosen near the typical interval
length the explosion factor is a small constant, and the bucket id is
a high-cardinality uniform key, so the shuffle spreads over the whole
cluster.  Skewed (very long) intervals fan out over more buckets but
never concentrate on one key.

Bucket arithmetic is integer-exact: bucket ids come from
``unix_timestamp`` (floor to whole seconds) divided by the integer
width, and floor(floor(t)/W) == floor(t/W) for integer W, so the
responsibility bucket computed from truncated seconds is the true
bucket of the untruncated instant — no boundary pair is dropped or
doubled.  The overlap predicate itself compares the raw (microsecond)
timestamps.

No reference-repo counterpart: the reference (FastAPI+LangChain RAG
app) has no interval analytics; this is part of the engine's
training-pipeline surface (sessionization / concurrency analysis).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def _buckets(start: Column, end: Column, width_s: int, max_cells: int) -> Column:
    """Grid-cell ids covering [start, end] (inclusive), integer-exact.

    ``max_cells`` guards the explode: one corrupt row with a
    decades-long interval would otherwise fan out into millions of
    cells (Spark's ``sequence`` would eventually throw an opaque
    too-many-elements error mid-job); ``raise_error`` surfaces the
    offending width instead, at planning-comprehensible cost."""
    lo = F.floor(F.unix_timestamp(start) / F.lit(width_s))
    hi = F.floor(F.unix_timestamp(end) / F.lit(width_s))
    n = hi - lo + 1
    checked_hi = F.when(n <= F.lit(max_cells), hi).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_overlap_join: interval spans more grid cells"
                    f" than max_cells_per_interval={max_cells}"
                    f" (width_s={width_s}); got "
                ),
                n.cast("string"),
                F.lit(" cells — widen bucket_width_s or clean the data"),
            )
        ).cast("long")
    )
    return F.sequence(lo, checked_hi)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lstart: str,
    lend: str,
    rstart: str,
    rend: str,
    bucket_width_s: int = 21600,
    extra_cond: Optional[Callable[[DataFrame], Column]] = None,
    max_cells_per_interval: int = 100_000,
) -> DataFrame:
    """Inner-join ``left`` × ``right`` on closed-interval overlap.

    Column names must already be disjoint between the two sides (alias
    upstream).  Returns each qualifying (left row, right row) pair
    exactly once.  ``extra_cond`` receives the joined DataFrame and may
    return an additional boolean Column (e.g. a same-key exclusion);
    it is applied as a post-join filter together with the overlap
    predicate, so it does not affect the exactly-once guarantee.

    ``bucket_width_s`` trades explosion factor (short width, long
    intervals → many cells per interval) against candidate fan-in
    (long width → more false-positive pairs per cell).  Pick it near
    the typical interval span.
    """
    l = left.withColumn(
        "_cell",
        F.explode(
            _buckets(F.col(lstart), F.col(lend), bucket_width_s, max_cells_per_interval)
        ),
    )
    r = right.withColumn(
        "_cell",
        F.explode(
            _buckets(F.col(rstart), F.col(rend), bucket_width_s, max_cells_per_interval)
        ),
    )

    joined = l.join(r, "_cell")
    overlap = (F.col(lstart) <= F.col(rend)) & (F.col(rstart) <= F.col(lend))
    # exactly-once: only the cell holding max(lstart, rstart) emits
    owner = F.floor(
        F.unix_timestamp(F.greatest(F.col(lstart), F.col(rstart))) / F.lit(bucket_width_s)
    )
    cond = overlap & (F.col("_cell") == owner)
    if extra_cond is not None:
        cond = cond & extra_cond(joined)
    return joined.where(cond).drop("_cell")
