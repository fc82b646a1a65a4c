"""JDBC round-trip (S4/S5 interop) against embedded Derby — the
application_logs schema of backend/db_utils.py:45-55 written and read
back through spark.read/write.jdbc with partitioned scans."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import jdbc as J


def _logs_df(spark, n=100):
    base = datetime.datetime(2026, 1, 1)
    rows = [
        (
            i,
            f"session-{i % 7}",
            f"question {i}",
            f"answer {i}",
            "gemini",
            "neutral",
            base + datetime.timedelta(minutes=i),
        )
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(
        rows,
        "id long, session_id string, user_query string, gpt_response string, "
        "model string, emotion string, created_at timestamp",
    )


def test_jdbc_round_trip_partitioned(spark, tmp_path):
    url = J.derby_url(str(tmp_path / "derbydb"))
    df = _logs_df(spark)
    J.write_table(
        df,
        url,
        "application_logs",
        mode="overwrite",
        # reference length caps (backend/models.py:25-61); also keeps
        # Derby on VARCHAR instead of CLOB so predicates push down
        column_types=(
            "session_id VARCHAR(100), user_query VARCHAR(2000), "
            "gpt_response VARCHAR(4000), model VARCHAR(50), emotion VARCHAR(20)"
        ),
    )

    back = J.read_table(
        spark, url, "application_logs", partition_column="id", num_partitions=4
    )
    assert back.count() == 100
    # partitioned read: the scan is split into multiple JDBC partitions
    assert back.rdd.getNumPartitions() == 4
    # values survive the round trip exactly
    row = back.where(F.col("id") == 42).collect()[0]
    assert row["session_id"] == "session-0"
    assert row["user_query"] == "question 42"
    assert row["created_at"] == datetime.datetime(2026, 1, 1, 0, 42)

    # the reference's session filter (db_utils.py:113) pushes into JDBC
    one_session = back.where(F.col("session_id") == "session-3")
    assert one_session.count() == len([i for i in range(1, 101) if i % 7 == 3])
    plan = one_session._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "session_id" in plan


def test_jdbc_append_then_full_scan(spark, tmp_path):
    url = J.derby_url(str(tmp_path / "derbydb2"))
    J.write_table(_logs_df(spark, 10), url, "application_logs", mode="overwrite")
    J.write_table(
        _logs_df(spark, 110).where(F.col("id") > 100), url, "application_logs"
    )
    back = J.read_table(spark, url, "application_logs", partition_column="id")
    assert back.count() == 20
    assert back.agg(F.max("id")).collect()[0][0] == 110
