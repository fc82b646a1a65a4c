"""As-of (point-in-time) join — for each left row, the most recent right
row at-or-before its timestamp, per key.

Spark has no built-in ASOF JOIN. The naive encoding
(``l.ts >= r.ts`` range join + window max) explodes to O(|L|·|R|/keys)
intermediate rows. This implementation is the scalable merge-style
form: tag both sides, union, single window ordered by (ts, tag, id)
carrying the last-seen right row forward — O((|L|+|R|) log) with one
shuffle on the key, no pair blow-up. Right rows at exactly the left
timestamp match (≤ semantics), mirroring DuckDB's ASOF JOIN for the
oracle check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
) -> DataFrame:
    """Left rows + the latest right row with ``right.ts <= left.ts`` on
    the same key (nulls when no prior right row exists).

    Right payload columns come back prefixed ``matched_``; the matched
    timestamp is ``matched_ts``. Duplicate right rows on (key, ts) are
    reduced to the one with the greatest payload struct first, making
    the match deterministic.
    """
    l_cols = left.columns
    lt = left.withColumn("_t", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            F.struct(F.col(right_ts).alias("ts"), *[F.col(c) for c in right_payload]).alias(
                "_payload"
            ),
        )
        # deterministic among (key, ts) duplicates: keep max payload
        .groupBy(key, "_ts")
        .agg(F.max("_payload").alias("_payload"))
        .withColumn("_t", F.lit(0))
    )
    unioned = lt.select(
        key, "_ts", "_t", F.lit(None).cast(rt.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols if c != key],
    ).unionByName(
        rt.select(
            key, "_ts", "_t", "_payload",
            *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
              for c in l_cols if c != key],
        )
    )
    # right rows (tag 0) sort before left rows (tag 1) at equal ts → ≤ match
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = carried.where(F.col("_t") == 1).select(
        F.col(key),
        *[F.col(f"_l_{c}").alias(c) for c in l_cols if c != key],
        F.col("_match.ts").alias("matched_ts"),
        *[F.col(f"_match.{c}").alias(f"matched_{c}") for c in right_payload],
    )
    return out
