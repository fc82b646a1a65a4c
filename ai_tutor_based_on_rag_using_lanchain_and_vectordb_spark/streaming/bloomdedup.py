"""Streaming bloom dedup: gate an incoming document stream against the
ENTIRE historical corpus without ever re-scanning it.

streaming/windows.dedup_stream dedupes WITHIN the stream (watermark-
bounded state); this module dedupes the stream AGAINST HISTORY: the
history lives as a bloom membership bitmap (operators/bloom.py) that
each micro-batch probes map-side. Bloom misses are guaranteed novel;
the ε-bounded hit slice is exactly verified against the persisted key
log. Novel rows go to the caller's idempotent sink and their keys fold
into the bitmap — so the sketch IS the accumulated corpus summary, a
few MB standing in for the 100 TB of history at probe time.

Exactly-once under foreachBatch's at-least-once redelivery, with
VERSIONED state (stronger than the rollup's marker-only scheme,
because a replayed batch must probe the PRE-batch sketch or every
replayed row would look like a duplicate):

- state lives in ``state/sketch_epoch=N`` + ``state/keys_epoch=N``
  directories; a marker file names the last COMMITTED epoch;
- a batch probes the sketch named by the marker, sinks its novel rows
  (caller's sink must be idempotent per epoch — sinks.append_epoch
  is the intended pairing), writes the NEXT versions, then moves the
  marker; a crash anywhere before the marker move replays against
  unchanged state and regenerates byte-identical outputs;
- an epoch at-or-below the marker is skipped outright.

The exact-verify side reads the persisted key log, which at corpus
scale is the thin (key) column of the landing zone — still never the
corpus payload.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_merge, bloom_probe

__all__ = ["BloomDedupState", "stream_bloom_dedup"]

_MARKER = "last_committed_epoch.txt"


class BloomDedupState:
    """Versioned (sketch, key-log) state under one directory."""

    def __init__(self, root: str, m_bits: int, k_hashes: int) -> None:
        self.root = root
        self.m_bits = m_bits
        self.k_hashes = k_hashes
        os.makedirs(root, exist_ok=True)

    # -- epoch bookkeeping -------------------------------------------------
    def last_epoch(self) -> int:
        p = os.path.join(self.root, _MARKER)
        if not os.path.exists(p):
            return -1
        with open(p) as fh:
            return int(fh.read().strip() or "-1")

    def _commit(self, epoch: int) -> None:
        with open(os.path.join(self.root, _MARKER), "w") as fh:
            fh.write(str(int(epoch)))

    def _sketch_path(self, epoch: int) -> str:
        return os.path.join(self.root, f"sketch_epoch={int(epoch)}")

    def _keys_path(self, epoch: int) -> str:
        return os.path.join(self.root, f"keys_epoch={int(epoch)}")

    # -- state access ------------------------------------------------------
    def sketch(self, spark, epoch: int) -> DataFrame | None:
        if epoch < 0:
            return None
        return spark.read.parquet(self._sketch_path(epoch))

    def keys(self, spark, epoch: int) -> DataFrame | None:
        """Union of the per-epoch key logs COMMITTED at-or-before
        ``epoch`` — each epoch writes only ITS OWN keys (an uncommitted
        epoch's directory may exist after a crash; the ≤ filter on the
        directory name excludes it, which is what makes replay read
        exactly the pre-batch state)."""
        if epoch < 0:
            return None
        paths = sorted(
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith("keys_epoch=") and int(d.split("=")[1]) <= epoch
        )
        if not paths:
            return None
        return spark.read.parquet(*paths)

    # -- the foreachBatch body ----------------------------------------------
    def apply_batch(self, batch_df: DataFrame, epoch_id: int, key_col: str,
                    sink) -> bool:
        """Gate one micro-batch; returns False when the epoch was
        already committed (pure replay skip). ``sink(novel_df, epoch)``
        must be idempotent per epoch."""
        spark = batch_df.sparkSession
        last = self.last_epoch()
        if epoch_id <= last:
            return False

        # within-batch dedup must pick DETERMINISTICALLY (dropDuplicates
        # keeps an arbitrary row — a replayed epoch could then sink a
        # different row for the same key, breaking byte-identical
        # redelivery): keep the row with the smallest whole-row hash
        from pyspark.sql import Window

        all_cols = F.struct(*[F.col(c) for c in batch_df.columns])
        w = Window.partitionBy(key_col).orderBy(F.xxhash64(all_cols))
        batch = (
            batch_df.where(F.col(key_col).isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)  # pin rows: sink + state writes
        )
        sk = self.sketch(spark, last)
        hist_keys = self.keys(spark, last)
        if sk is None:
            novel = batch
        else:
            probed = bloom_probe(
                batch, F.col(key_col), sk, self.m_bits, self.k_hashes,
                pin_input=False,  # batch is already localCheckpointed
            )
            misses = probed.where(~F.col("bloom_hit")).drop("bloom_hit")
            cands = probed.where(F.col("bloom_hit")).drop("bloom_hit")
            verified = cands.join(
                hist_keys.withColumnRenamed("key", key_col), key_col, "left_anti"
            )
            novel = misses.unionByName(verified)
        novel = novel.localCheckpoint(eager=True)

        sink(novel, epoch_id)

        new_keys = novel.select(F.col(key_col).alias("key"))
        add = bloom_build(new_keys, F.col("key"), self.m_bits, self.k_hashes)
        merged = add if sk is None else bloom_merge(sk, add)
        # write NEXT versions (overwrite-safe on replay), then commit
        merged.coalesce(1).write.mode("overwrite").parquet(
            self._sketch_path(epoch_id)
        )
        # per-epoch key log: each epoch persists only ITS keys (O(batch)
        # state write per batch, never O(history))
        new_keys.write.mode("overwrite").parquet(self._keys_path(epoch_id))
        self._commit(epoch_id)
        return True


def stream_bloom_dedup(
    stream_df: DataFrame,
    key_col: str,
    state_root: str,
    checkpoint: str,
    m_bits: int,
    k_hashes: int,
    sink,
    available_now: bool = True,
):
    """Continuous history-gated dedup: every micro-batch's novel rows
    (key unseen in ALL prior epochs) go to ``sink``; duplicate rows are
    dropped. Returns the started StreamingQuery."""
    state = BloomDedupState(state_root, m_bits, k_hashes)

    def _gate(batch_df: DataFrame, epoch_id: int) -> None:
        state.apply_batch(batch_df, epoch_id, key_col, sink)

    writer = stream_df.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
