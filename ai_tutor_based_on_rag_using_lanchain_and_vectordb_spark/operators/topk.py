"""Top-k-per-group — the reference's chat-history window
(``ORDER BY created_at DESC LIMIT k`` per session,
backend/db_utils.py:110-124) generalized.

``row_number`` + ``rn <= k`` is recognized by Spark ≥3.5 as
WindowGroupLimit: each map task keeps only k rows per group *before*
the shuffle, so the exchange carries O(groups·k), not O(rows) — the
property that makes "history limit 10" viable at any log size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")


def chat_history(
    logs: DataFrame,
    session_col: str = "session_id",
    ts_col: str = "created_at",
    id_col: str = "id",
    limit: int = 10,
) -> DataFrame:
    """Most-recent `limit` rows per session, re-sorted chronologically
    (the reversed() at backend/db_utils.py:121)."""
    recent = top_k_per_group(
        logs, [session_col], [F.desc(ts_col), F.desc(id_col)], limit
    )
    return recent.orderBy(session_col, F.asc(ts_col), F.asc(id_col))


def unpivot_messages(
    logs: DataFrame,
    query_col: str = "user_query",
    response_col: str = "gpt_response",
) -> DataFrame:
    """One log row → two {role, content} messages (the reference's
    history unpivot, backend/db_utils.py:126-133) via stack."""
    keep = [c for c in logs.columns if c not in (query_col, response_col)]
    return logs.select(
        *keep,
        F.expr(
            f"stack(2, 'human', {query_col}, 'ai', {response_col}) AS (role, content)"
        ),
    )
