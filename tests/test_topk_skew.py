"""chat_history / unpivot_messages operators + salted aggregation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import skew, topk


def _chat_logs(spark):
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    i = 0
    for sess, n in (("s1", 15), ("s2", 3)):
        for k in range(n):
            i += 1
            rows.append(
                (i, sess, f"q{k}", f"a{k}", "gemini-2.5-flash", "neutral",
                 base + dt.timedelta(minutes=k))
            )
    return spark.createDataFrame(
        rows,
        "id long, session_id string, user_query string, gpt_response string,"
        "model string, emotion string, created_at timestamp",
    )


def test_chat_history_limit_and_order(spark):
    logs = _chat_logs(spark)
    hist = topk.chat_history(logs, limit=10).toPandas()
    # s1 truncated to its 10 most-recent, s2 keeps all 3
    per = hist.groupby("session_id").size()
    assert per["s1"] == 10 and per["s2"] == 3
    s1 = hist[hist.session_id == "s1"]
    # most-recent 10 of 15 = q5..q14, returned chronologically
    assert s1["user_query"].tolist() == [f"q{k}" for k in range(5, 15)]
    assert s1["created_at"].is_monotonic_increasing


def test_unpivot_messages_roles(spark):
    logs = _chat_logs(spark)
    msgs = topk.unpivot_messages(logs).toPandas()
    assert len(msgs) == 2 * len(logs.toPandas())
    one = msgs[msgs.id == 1].sort_values("role")
    assert one["role"].tolist() == ["ai", "human"]
    assert one[one.role == "human"]["content"].iloc[0] == "q0"
    assert one[one.role == "ai"]["content"].iloc[0] == "a0"


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # synthetic hot key: 40% of rows collapse onto user -1
    skewed = events.withColumn(
        "user_id",
        F.when(F.pmod("event_id", F.lit(5)) < 2, F.lit(-1)).otherwise(F.col("user_id")),
    )
    got = skew.salted_agg(
        skewed,
        ["user_id"],
        {
            "n": ("count", "*"),
            "total": ("sum", "value"),
            "first_ts": ("min", "ts"),
            "avg_v": ("avg", "value"),
        },
    ).toPandas().set_index("user_id").sort_index()
    want = (
        skewed.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.min("ts").alias("first_ts"),
            F.avg("value").alias("avg_v"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n"] == want["n"]).all()
    assert (got["first_ts"] == want["first_ts"]).all()
    assert abs(got["total"] - want["total"]).max() < 1e-6
    assert abs(got["avg_v"] - want["avg_v"]).max() < 1e-9
