"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
then compare row count, column names, and order-insensitive values
(floats rounded to absorb summation-order noise — the real queries
already round, so this is belt-and-braces).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written directory parquet
            path = f"{path}/*.parquet"
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = _canon(spdf), _canon(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            col_a, col_b = a[c], b[c]
            if pd.api.types.is_float_dtype(col_a) and pd.api.types.is_float_dtype(col_b):
                bad = [
                    i
                    for i, (x, y) in enumerate(zip(col_a, col_b))
                    if not (
                        (isinstance(x, float) and isinstance(y, float) and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9))
                        or (pd.isna(x) and pd.isna(y))
                    )
                ]
            else:
                eq = (col_a == col_b) | (col_a.isna() & col_b.isna())
                bad = list(eq[~eq].index)
            if bad:
                i = bad[0]
                problems.append(
                    f"value mismatch in '{c}' at {len(bad)} rows; first: "
                    f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )
    return problems
