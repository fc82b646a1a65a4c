"""In-plan gate guards: make rows-only gate queries SELF-SUFFICIENT in
the driver's correctness artifact.

The driver's check for non-SQL-expressible queries is rows-only (row
count ≥ 0), so a gate that *returns* a false pass-flag row would still
record green. The fix (the plans/streamgate.py `_assert_all_matched`
pattern, generalized here): ride a per-row ``assert_true(flag)`` on a
numeric column the plan already emits — ``assert_true`` yields NULL
(coalesced to +0, value- and type-neutral) when the flag holds and
RAISES during the driver's own collect when it doesn't, naming the
gate and the failing row. Riding a consumed output column keeps the
guard un-prunable; pytest still asserts the flags independently, but
the driver artifact no longer needs pytest to be trustworthy.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["guard_passed"]


def guard_passed(
    df: DataFrame,
    flag_cols,
    ride_col: str,
    label: str,
    ident_col: str | None = None,
) -> DataFrame:
    """Return ``df`` with an in-plan ``assert_true`` over ``flag_cols``
    (ANDed) riding ``ride_col``. Output schema, values, and column
    order are unchanged when every flag is true; a false flag raises
    ``<label> gate failed [<ident>]`` from the collecting action."""
    if isinstance(flag_cols, str):
        flag_cols = [flag_cols]
    cond = reduce(lambda a, b: a & b, (F.col(c) for c in flag_cols))
    msg = F.lit(f"{label}: in-plan gate failed")
    if ident_col is not None:
        msg = F.concat(msg, F.lit(" ["), F.col(ident_col).cast("string"),
                       F.lit("]"))
    dtype = dict((f.name, f.dataType) for f in df.schema.fields)[ride_col]
    guard = F.coalesce(
        F.assert_true(cond, msg).cast(dtype), F.lit(0).cast(dtype)
    )
    return df.withColumn(ride_col, F.col(ride_col) + guard)
