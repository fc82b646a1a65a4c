"""Exact (decimal-backed) float aggregation.

Summing doubles is order-sensitive: Spark's partial/final aggregation
tree and the oracle's sequential sum can differ in the last ulps, which
flips a rounded value across a .005 boundary often enough to break
hash-equality. The fix: cast to decimal *before* aggregating, so the
sum is exact and engine-independent, then cast the exact result back to
double. The input doubles here are 2-dp "money" or bounded-precision
values, so the double→decimal conversion is itself exact and identical
across engines.

Each Spark helper has a matching SQL generator so Spark plans and DuckDB
oracles stay in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"
DEC_SQL = "DECIMAL(28,6)"


def pround(col: Column, digits: int = 2) -> Column:
    """Engine-portable rounding: ``floor(x*10^d + 0.5)/10^d``.

    ``round(double, d)`` differs across engines on exact .5 halves
    (Spark rounds the shortest decimal repr HALF_UP; DuckDB rounds the
    raw binary double). This formula is plain IEEE arithmetic, so two
    engines given the same double produce the same rounded double — the
    parity property the hash-based oracle comparison needs."""
    p = 10 ** digits
    return F.floor(col * p + F.lit(0.5)) / p


def pround_sql(expr: str, digits: int = 2) -> str:
    p = 10 ** digits
    return f"(floor(({expr}) * {p} + 0.5) / {p})"


def dsum(col: Column, digits: int = 2) -> Column:
    """Exact sum of a bounded-precision double, rounded to `digits`."""
    return pround(F.sum(col.cast(DEC)).cast("double"), digits)


def davg(col: Column, digits: int = 2) -> Column:
    """Exact-numerator average: sum in decimal, divide in double."""
    return pround(F.sum(col.cast(DEC)).cast("double") / F.count(col), digits)


def dsum_sql(expr: str, digits: int = 2) -> str:
    return pround_sql(f"CAST(sum(CAST({expr} AS {DEC_SQL})) AS DOUBLE)", digits)


def davg_sql(expr: str, digits: int = 2) -> str:
    return pround_sql(
        f"CAST(sum(CAST({expr} AS {DEC_SQL})) AS DOUBLE) / count({expr})", digits
    )


def money(col_name: str) -> Column:
    """A 2-dp money double as exact decimal."""
    return F.col(col_name).cast("decimal(12,2)")


def rate(col_name: str) -> Column:
    """A 2-dp rate (discount/tax) double as exact decimal."""
    return F.col(col_name).cast("decimal(4,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), all-decimal (exact)."""
    return money("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - rate("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), all-decimal."""
    return disc_price() * (F.lit(1).cast("decimal(4,2)") + rate("l_tax"))


DISC_PRICE_SQL = (
    "(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))))"
)
CHARGE_SQL = f"({DISC_PRICE_SQL} * (1 + CAST(l_tax AS DECIMAL(4,2))))"


def dec_sum_raw(col: Column) -> Column:
    """Un-rounded exact decimal sum (for ORDER BY / HAVING parity)."""
    return F.sum(col.cast(DEC))
