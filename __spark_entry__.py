"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark``
package; see SURVEY.md §2 for the operator inventory each entry covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark import plans  # noqa: E402
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.session import (  # noqa: E402
    tune_for_oracle,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the chat-history window (top-10 events
    per session, reference backend/db_utils.py:110-124) — scan, window,
    top-k, projection in one plan."""
    tune_for_oracle(spark)
    return plans.relational.chat_history_topk(spark, SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_for_oracle(spark)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in plans.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI equivalents for every SQL-expressible query."""
    return dict(plans.all_oracle_sql())
