"""As-of join operator: ≤ semantics, null for no-prior-match,
deterministic among duplicate right timestamps."""

from __future__ import annotations

import datetime as dt

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(20)), (102, 1, _ts(5)), (103, 2, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 900), (1, _ts(20), 901), (1, _ts(25), 902), (3, _ts(1), 903)],
        "user_id long, ts timestamp, event_id long",
    )
    out = (
        asof_join(left, right, key="user_id", right_payload=("event_id",))
        .toPandas()
        .set_index("event_id")
    )
    assert out.loc[100, "matched_event_id"] == 900          # 8 <= 10
    assert out.loc[101, "matched_event_id"] == 901          # equal ts matches (<=)
    assert out.loc[102, "matched_ts"] is None or str(out.loc[102, "matched_ts"]) == "NaT"
    assert out.loc[103, "matched_ts"] is None or str(out.loc[103, "matched_ts"]) == "NaT"
    assert len(out) == 4                                    # left-preserving


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 7), (1, _ts(5), 9)], "user_id long, ts timestamp, event_id long"
    )
    out = asof_join(left, right, key="user_id", right_payload=("event_id",)).collect()
    assert out[0]["matched_event_id"] == 9  # max payload wins, deterministically
