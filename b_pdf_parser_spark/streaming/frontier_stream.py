"""Streaming crawl frontier: the ingestion-time lift of the bloom frontier.

A production crawler does not batch-diff candidate lists against its
history once a day — discovered URLs arrive continuously, and "have we
seen this?" must be answered online without joining every micro-batch
against a 10^9-row history table. This operator keeps the batch module's
exact contract (emit EXACTLY the never-seen-before keys) while amortizing
the history to a driver-held bloom bitmap that grows incrementally:

* **startup**: the bitmap is built ONCE from the durable history directory
  (distributed partial-bitmap build, tree-merged — ``operators/bloom``);
* **per micro-batch**: candidates are probed MAP-SIDE against the
  broadcast bitmap; ``maybe_seen = false`` rows are provably new (zero
  joins — the no-false-negative guarantee), only the ``maybe_seen``
  sliver (true dups + ~FPR) pays an exact anti-join against the history;
* **state update**: the batch's new keys append to the history directory
  under an ``epoch=N`` subdirectory (overwrite mode → a retried epoch
  rewrites the same path, idempotent), and their bits OR into the
  in-memory bitmap so the NEXT batch sees them — no rebuild, no rescan;
* **restart**: the driver bitmap is rebuilt from whatever the history
  directory durably holds. Because the confirm join reads the SAME
  key set, bitmap and confirm can never disagree on membership — the
  no-false-negative invariant (and therefore exactness) survives crashes.

Scale shape: per batch the work is one map-only probe over the batch +
one anti-join of the ~FPR sliver against the history key set + one numpy
OR of two m/8-byte blobs on the driver. The history PARQUET is scanned
exactly once per process lifetime: the startup read lands in an eager
``localCheckpoint`` key cache (file lineage severed — the idempotent
epoch overwrite may delete the very files a persisted frame would
recompute from), and each batch's confirm join reads that cache plus the
locally-checkpointed outputs of the epochs this process already
committed (LSM-style binary-counter legs) — never the files again.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.bloom import bloom_bitmap_bytes, probe_and_confirm

__all__ = ["FrontierState", "frontier_stream"]

# fold per-epoch key frames into one labeled checkpoint this often (keeps
# the confirm-join plan a constant number of union legs on long streams)
_COMPACT_EVERY = 16


def _unpersist_local_checkpoint(df: DataFrame) -> None:
    """Free the executor blocks behind an eagerly ``localCheckpoint``-ed
    frame NOW instead of at Python-GC + ContextCleaner time.

    ``DataFrame.unpersist()`` is a no-op here — localCheckpoint blocks
    belong to the checkpointed RDD, not the cache manager — so reach the
    RDD through the analyzed ``LogicalRDD`` plan node (verified to drop
    the entry from ``getRDDStorageInfo`` on this Spark). Best-effort: a
    plan shape we don't recognize just falls back to GC-time cleanup,
    which was the prior behavior."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass  # cleanup is an optimization; correctness never depends on it


class FrontierState:
    """Driver-side frontier state: the incremental bitmap + history dir.

    Exposed as a class (rather than a closure) so tests and jobs can
    inspect ``bloom`` and rebuild/restart deterministically.

    REQUIREMENT: ``history_dir`` must be a filesystem path visible to the
    driver process (local disk / NFS-style mount shared with executors,
    like the WET sink) — epoch discovery walks it with ``os.listdir``.
    Scheme-prefixed object-store URIs are rejected LOUDLY at construction
    instead of silently reading an empty history (which would re-emit
    every already-seen key as new).
    """

    def __init__(
        self,
        spark: SparkSession,
        history_dir: str,
        key_col: str = "url",
        m_bits: int = 1 << 20,
        k: int = 7,
        merge_groups: int = 64,
    ):
        if "://" in history_dir:
            raise ValueError(
                f"history_dir {history_dir!r} is not a driver-visible "
                "filesystem path — epoch discovery uses os.listdir, and a "
                "silently-empty history would break frontier exactness "
                "(see FrontierState docstring)"
            )
        self.spark = spark
        self.history_dir = history_dir
        self.key_col = key_col
        self.m_bits = m_bits
        self.k = k
        self.merge_groups = merge_groups
        # epochs COMMITTED BY THIS PROCESS: epoch_id -> localCheckpointed
        # key frame (the already-materialized output of process_batch) —
        # the confirm join reads these instead of re-reading their files.
        # Every _COMPACT_EVERY epochs the frames fold into a checkpointed
        # (key, epoch) LEG; legs merge binary-counter style (two legs of
        # the same level fold into one of level+1), so the confirm-join
        # plan carries O(log epochs) legs and total re-materialization
        # over a stream's life is O(N log N) rows — a single rolling blob
        # would re-copy the whole history every fold (quadratic). The
        # epoch label survives compaction because the retry exclusion
        # (_history_df) must be able to drop any single epoch's keys.
        self._committed: dict[int, DataFrame] = {}
        self._legs: List[Tuple[int, DataFrame]] = []  # (level, frame)
        self._startup_keys = self._read_history_once()
        self.bloom = self._build_from_history()

    def _read_history_once(self) -> Optional[DataFrame]:
        """The ONE parquet scan of the durable history this process ever
        does: read the ``epoch=K`` partition tree (partition discovery
        yields the ``epoch`` column the retry exclusion needs) and
        ``localCheckpoint(eager=True)`` the key set.

        Checkpoint, NOT ``persist``: a redelivered epoch's idempotent
        overwrite DELETES the very part-files a persisted frame's lineage
        would recompute from — a later cache-block loss would then throw
        FileNotFoundException mid-stream (or, with
        ``spark.sql.files.ignoreMissingFiles=true``, silently drop
        history keys and re-emit seen URLs — a permanent exactness
        violation). The checkpoint severs the file lineage entirely: a
        lost block fails the query LOUDLY and a restart rebuilds from
        the (still-durable) files — the correct failure mode."""
        if not os.path.isdir(self.history_dir):
            return None
        has_epochs = any(
            d.startswith("epoch=")
            and os.path.isdir(os.path.join(self.history_dir, d))
            for d in os.listdir(self.history_dir)
        )
        if not has_epochs:
            return None
        # NO exception swallowing: an unreadable epoch directory must fail
        # the stream loudly — treating it as empty would rebuild an empty
        # bitmap, skip the confirm join and re-emit every seen key as new
        # (a silent, permanent exactness violation). The marker file is
        # underscore-prefixed, so partition discovery ignores it.
        return (
            self.spark.read.parquet(self.history_dir)
            .select(self.key_col, F.col("epoch").cast("long").alias("epoch"))
            .localCheckpoint(eager=True)
        )

    def _history_df(self, exclude_epoch: Optional[int] = None) -> Optional[DataFrame]:
        """History key set = the cached startup scan + the epochs this
        process has committed since — no file re-reads (both sides are
        persisted/checkpointed already).

        ``exclude_epoch`` matters for exactly-once: when foreachBatch
        re-delivers an epoch after a crash (write durable, stream commit
        lost), the confirm join must NOT see that epoch's own previous
        partial write — it would classify every key as already-seen, emit
        an empty frame, and the idempotent overwrite would ERASE the
        epoch's keys from history. Excluding the epoch being processed
        makes the retry reproduce the original output byte-for-byte."""
        parts = []
        labeled_frames = [self._startup_keys] + [df for _, df in self._legs]
        for labeled in labeled_frames:
            if labeled is None:
                continue
            s = labeled
            if exclude_epoch is not None:
                s = s.filter(F.col("epoch") != int(exclude_epoch))
            parts.append(s.select(self.key_col))
        parts.extend(
            df.select(self.key_col)
            for e, df in self._committed.items()
            if e != exclude_epoch
        )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _build_from_history(self) -> bytes:
        h = self._history_df()
        if h is None:
            return bytes(self.m_bits // 8)
        return bloom_bitmap_bytes(
            h, self.key_col, self.m_bits, self.k, self.merge_groups
        )

    def absorb(self, new_keys: DataFrame) -> None:
        """OR the new keys' bits into the driver bitmap (incremental
        insert — bloom filters are additive, so this is exact)."""
        delta = bloom_bitmap_bytes(
            new_keys, self.key_col, self.m_bits, self.k, self.merge_groups
        )
        self.bloom = np.bitwise_or(
            np.frombuffer(self.bloom, dtype=np.uint8),
            np.frombuffer(delta, dtype=np.uint8),
        ).tobytes()

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body: emit exactly-new keys of this batch into
        ``history_dir/epoch=<id>/`` and fold them into the bitmap."""
        raw = probe_and_confirm(
            batch_df,
            self.key_col,
            self.bloom,
            self.m_bits,
            self.k,
            self._history_df(exclude_epoch=int(epoch_id)),
        )
        new = raw.localCheckpoint(eager=True)
        # `new` is self-contained now — free the kernel's intermediate
        # probe checkpoint immediately (one per epoch otherwise lingers
        # until GC; ADVICE r5)
        probe = getattr(raw, "_bloom_probe", None)
        if probe is not None:
            _unpersist_local_checkpoint(probe)
        # epoch-keyed overwrite: a retried epoch rewrites the same subdir,
        # so at-least-once foreachBatch delivery stays exactly-once on disk
        new.write.mode("overwrite").parquet(
            os.path.join(self.history_dir, f"epoch={int(epoch_id)}")
        )
        # the checkpointed frame IS this epoch's durable key set — keep it
        # so later batches' confirm joins read it from block storage
        # instead of re-scanning the files (a redelivery of the SAME epoch
        # replaces the entry and is excluded by _history_df anyway)
        self._committed[int(epoch_id)] = new
        # absorb BEFORE compaction: the fold unpersists the consumed
        # per-epoch frames (including this one), so the bitmap scan of
        # ``new`` must run while its checkpoint blocks still exist
        self.absorb(new)
        if len(self._committed) >= _COMPACT_EVERY:
            self._fold_committed_into_leg()

    def _fold_committed_into_leg(self) -> None:
        """Fold the per-epoch frames plus every equal-level mate into ONE
        new leg, binary-counter style — the LSM-tree shape: O(log N) legs
        live, O(N log N) total copy work.

        Two deliberate properties (round-5 review findings):

        * the whole cascade is ONE union + ONE eager checkpoint — not a
          re-materialization per consumed level;
        * ``_committed``/``_legs`` are swapped ONLY AFTER the checkpoint
          action succeeds. Mutating first would, on a checkpoint failure
          (executor loss, disk-full) followed by a retry on the same
          FrontierState, drop those epochs from ``_history_df`` while
          their bits stay in the bloom — maybe_seen keys would fail the
          confirm join and be re-emitted: a silent exactness violation.
        """
        frames = [
            df.select(self.key_col, F.lit(int(e)).cast("long").alias("epoch"))
            for e, df in self._committed.items()
        ]
        remaining = list(self._legs)
        consumed_legs: List[DataFrame] = []
        level = 0
        while any(lv == level for lv, _ in remaining):
            leg = next(df for lv, df in remaining if lv == level)
            frames.append(leg)
            consumed_legs.append(leg)
            remaining = [(lv, df) for lv, df in remaining if lv != level]
            level += 1
        folded = frames[0]
        for f in frames[1:]:
            folded = folded.unionByName(f)
        new_leg = folded.localCheckpoint(eager=True)  # the one fallible action
        consumed_frames = list(self._committed.values())
        self._legs = remaining + [(level, new_leg)]
        self._committed = {}
        # the new leg's blocks now hold every key the consumed frames and
        # legs held — free theirs immediately (ADVICE r5: GC-time cleanup
        # can transiently pin ~2x the history key set in non-replicated
        # executor block storage on a long-running stream)
        for df in consumed_frames + consumed_legs:
            _unpersist_local_checkpoint(df)


def frontier_stream(
    candidates_stream: DataFrame,
    history_dir: str,
    checkpoint_dir: str,
    *,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k: int = 7,
    available_now: bool = True,
):
    """Wire a candidate-URL stream into a :class:`FrontierState` and return
    the started streaming query. ``history_dir`` doubles as the output:
    each epoch's exactly-new keys land under ``epoch=N/`` and ARE the
    growing crawl history the next epoch dedups against.

    Epoch ids come from the STREAM CHECKPOINT, so the pairing
    (history_dir, checkpoint_dir) is load-bearing: restarting with a
    fresh checkpoint restarts epoch numbering at 0 and the idempotent
    ``epoch=N`` overwrite would CLOBBER durable history written under the
    old numbering. A marker file in ``history_dir`` records which
    checkpoint the history was written under; a mismatch while epochs
    exist fails loudly instead."""
    marker = os.path.join(history_dir, "_frontier_checkpoint")
    ckpt = os.path.abspath(checkpoint_dir)
    if os.path.isdir(history_dir):
        has_epochs = any(d.startswith("epoch=") for d in os.listdir(history_dir))
        if os.path.exists(marker):
            recorded = open(marker).read().strip()
            if recorded != ckpt and has_epochs:
                raise ValueError(
                    f"history_dir {history_dir!r} holds epochs written under "
                    f"checkpoint {recorded!r}, but this stream uses {ckpt!r} — "
                    "epoch ids would collide and overwrite durable history. "
                    "Resume with the original checkpoint_dir, or start a "
                    "fresh history_dir."
                )
        elif has_epochs:
            raise ValueError(
                f"history_dir {history_dir!r} holds epochs but no checkpoint "
                "marker — refusing to guess whether this stream's epoch ids "
                "collide with them"
            )
    os.makedirs(history_dir, exist_ok=True)
    with open(marker, "w") as f:
        f.write(ckpt)
    state = FrontierState(
        candidates_stream.sparkSession, history_dir, key_col, m_bits, k
    )
    writer = candidates_stream.writeStream.foreachBatch(
        state.process_batch
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
