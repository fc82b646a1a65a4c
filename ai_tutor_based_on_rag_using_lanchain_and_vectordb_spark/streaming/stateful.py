"""Custom stateful streaming operator (SURVEY.md §2.8 ST2 variant):
incremental sessionization via ``applyInPandasWithState``.

``session_window`` only emits *closed* sessions; this operator instead
annotates every event with its (session_index, session_start) as it
arrives, carrying per-key state (last timestamp, running session
counter) across micro-batches. That is the shape the reference's
frontend needs (live session list with counts, frontend/src/App.js:67-73)
and the building block for per-session TTL logic beyond what windows
express (backend/config.py:45 session timeout).

Session boundary rule matches the batch gaps-and-islands oracle
(plans/relational.py session_windows): a new session starts when
``ts >= prev_ts + gap``.

Scale: state is O(keys) (three scalars per key); Arrow-batched per
micro-batch; the groupBy shuffles once on the key — identical layout to
any keyed stateful op on a 1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_index", T.IntegerType()),
        T.StructField("session_start", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_index", T.IntegerType()),
        T.StructField("session_start_us", T.LongType()),
    ]
)


def make_sessionizer(gap_minutes: int = 60):
    gap_us = gap_minutes * 60 * 1_000_000

    def annotate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, sidx, sstart_us = state.get
        else:
            last_us, sidx, sstart_us = None, -1, None
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        out_idx: list[int] = []
        out_start: list[int] = []
        for ts in batch["ts"]:
            ts_us = ts.value // 1000  # pandas ns → µs
            if last_us is None or ts_us >= last_us + gap_us:
                sidx += 1
                sstart_us = ts_us
            last_us = ts_us
            out_idx.append(sidx)
            out_start.append(sstart_us)
        state.update((int(last_us), int(sidx), int(sstart_us)))
        out = pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": batch["event_id"].to_numpy(),
                "ts": batch["ts"].to_numpy(),
                "session_index": out_idx,
                "session_start": pd.to_datetime(pd.Series(out_start), unit="us"),
            }
        )
        yield out

    return annotate


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming (or batch-test) entry: events → session-annotated
    events with per-key incremental state."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_minutes),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
