"""Streaming sequence packing — the stateful continuation of
plans/trainprep.sequence_packing (concat-and-chunk into fixed
``seq_len``-token training sequences), for a corpus that ARRIVES as a
stream: each micro-batch's documents extend their language shard's
token stream exactly where the previous batch left off.

State per shard is ONE scalar (the next free token offset) carried via
``applyInPandasWithState`` — O(shards) state total, the cheapest
stateful op there is. Token counting stays in the plan (codegen
``textstats.token_count`` BEFORE the stateful stage); the Python side
does only the cumulative-offset arithmetic, vectorized per Arrow batch.

Ordering contract: within a micro-batch documents pack in doc_id
order; across batches, arrival order IS concatenation order (the
stream is the tape). When batches arrive in doc_id order the output
equals the batch operator row-for-row (asserted in
tests/test_stream_packing.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("cum_before", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("start_off", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("next_off", T.LongType())])


def make_packer(seq_len: int):
    def pack(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        next_off = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "doc_id", kind="mergesort"
        )
        if not len(batch):
            return
        n = batch["n_tokens"].to_numpy(dtype=np.int64)
        cum_before = next_off + np.concatenate(([0], np.cumsum(n)[:-1]))
        last_tok = cum_before + np.maximum(n, 1) - 1
        state.update((int(cum_before[-1] + n[-1]),))
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "lang": key[0],
                "n_tokens": n,
                "cum_before": cum_before,
                "first_seq": cum_before // seq_len,
                "last_seq": last_tok // seq_len,
                "start_off": cum_before % seq_len,
            }
        )

    return pack


def pack_stream(docs: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Streaming (or batch-test) entry: documents → packed-sequence
    assignments with per-shard running offsets. ``docs`` needs
    (doc_id, lang, text); token counting runs as a codegen expression
    before the keyed stateful stage (one shuffle on the shard key)."""
    from ..functions import textstats as TS

    toks = docs.select(
        "doc_id",
        "lang",
        TS.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return toks.groupBy("lang").applyInPandasWithState(
        make_packer(seq_len),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
