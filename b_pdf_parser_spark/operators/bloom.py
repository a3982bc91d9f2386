"""Bloom-filter membership for crawl-frontier dedup at 10^12-URL scale.

The exact frontier check (`dedup.incremental_dedup`) anti-joins candidates
against the full crawl history — both sides shuffle on the hash key, every
cycle. A Bloom filter collapses the history side into a fixed-size bitmap
(m bits ≈ 1.2 GB covers 10^9 URLs at 1% FPR with k=7) that ships to every
executor once; candidates are then tested MAP-SIDE. The guarantee that
matters operationally is *no false negatives*: a candidate the bloom calls
unseen is provably new and can be crawled without any join at all — only
the small `maybe_seen` fraction (true hits + FPR) pays the exact anti-join.

Spark shape (no per-row Python anywhere):

* the two 32-bit hash halves come from ``F.md5`` JVM-side (whole-stage
  codegen) — Python only ever sees integer columns;
* partial bitmaps build per PARTITION inside ``mapInPandas`` with numpy
  ``bitwise_or.at`` (vectorized); the merge is a TWO-LEVEL tree reduce
  (partials → ``merge_groups`` intermediate OR-groups → one final OR), so
  no single task ever receives more than ``max(num_partitions /
  merge_groups, merge_groups)`` blobs — at the advertised 10^9-URL sizing
  (m≈10^10 bits, 1.2 GB blobs, ~10k input partitions) the fan-in per task
  is ~128 GB → ~12 GB with the default 64 groups, and tunable below
  executor memory by raising ``merge_groups``;
* probing distributes the bitmap via ``SparkContext.broadcast`` (torrent
  fan-out, one copy per executor, no per-task closure shipping — task
  closures are capped by ``spark.rpc.message.maxSize``, broadcasts are
  not) and tests all k positions with numpy — linear, map-only, no
  shuffle.

Bit positions use the Kirsch–Mitzenmacher double-hashing construction
``pos_i = (h1 + i·h2) mod m`` (public result: two hashes simulate k with
no FPR loss). Decisions are a pure function of (key, m, k): identical on
1 or 1,000 executors and across retries.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, StructField, StructType

__all__ = [
    "bloom_bitmap",
    "bloom_bitmap_bytes",
    "probe_bloom",
    "probe_and_confirm",
    "frontier_new_keys",
]


def _h1(key_col: str) -> F.Column:
    return F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast("long")


def _h2(key_col: str) -> F.Column:
    # force h2 odd so (h1 + i*h2) cycles well for any m (h2=0 would probe
    # one position k times)
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 9, 8), 16, 10)
        .cast("long")
        .bitwiseOR(F.lit(1))
    )


def bloom_bitmap(
    df: DataFrame, key_col: str, m_bits: int, k: int, merge_groups: int = 64
) -> DataFrame:
    """Build the bitmap distributedly → a 1-row DataFrame (bloom BINARY).

    Partials are per-partition (numpy bit-set over the partition's Arrow
    batches), so the shuffles carry m/8-byte blobs — never row data — and
    the OR-reduce is a two-level tree: partials bucket by
    ``spark_partition_id() % merge_groups`` and OR within each bucket in
    parallel, then the ≤ ``merge_groups`` group blobs OR into the final
    bitmap. The per-task fan-in is bounded on BOTH levels, so the merge
    survives the module's advertised 10^9-URL / 1.2 GB-bitmap sizing
    instead of funnelling every partial through one task.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    n_bytes = m_bits // 8
    hashed = df.select(_h1(key_col).alias("h1"), _h2(key_col).alias("h2"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for b in batches:
            if not len(b):
                continue
            seen = True
            h1 = b["h1"].to_numpy(np.int64)
            h2 = b["h2"].to_numpy(np.int64)
            for i in range(k):
                pos = (h1 + i * h2) % m_bits
                np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bloom": [bitmap.tobytes()]})

    parts = hashed.mapInPandas(partials, schema="bloom binary")

    def merge(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        stacked = np.stack([np.frombuffer(b, dtype=np.uint8) for b in pdf["bloom"]])
        return pd.DataFrame({"bloom": [np.bitwise_or.reduce(stacked, axis=0).tobytes()]})

    grouped = (
        parts.withColumn(
            "g", F.pmod(F.spark_partition_id(), F.lit(merge_groups)).cast("int")
        )
        .groupBy("g")
        .applyInPandas(merge, schema="bloom binary")
    )
    return (
        grouped.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(merge, schema="bloom binary")
    )


def bloom_bitmap_bytes(
    df: DataFrame, key_col: str, m_bits: int, k: int, merge_groups: int = 64
) -> bytes:
    """Driver-side blob of :func:`bloom_bitmap` — the ONE deliberate driver
    object in this module (m/8 bytes, e.g. 12 MB at 10^8 bits), fetched so
    the probe can broadcast it. Empty input → all-zero bitmap."""
    rows = bloom_bitmap(df, key_col, m_bits, k, merge_groups).collect()
    return bytes(rows[0]["bloom"]) if rows else bytes(m_bits // 8)


def probe_bloom(
    df: DataFrame, key_col: str, bloom: bytes, m_bits: int, k: int
) -> DataFrame:
    """Append ``maybe_seen`` (bloom membership) to ``df`` — map-only.

    ``maybe_seen = false`` is definitive (no false negatives); ``true``
    means "present or false positive" and wants an exact confirm if
    exactness matters (see :func:`frontier_new_keys`).

    The bitmap reaches executors via ``SparkContext.broadcast`` — one
    torrent-distributed copy per executor, shared by all its tasks —
    rather than closure capture, which would ship the blob inside every
    serialized task and trip ``spark.rpc.message.maxSize`` at GB sizes.
    """
    if len(bloom) * 8 != m_bits:
        raise ValueError(f"bitmap is {len(bloom) * 8} bits, expected {m_bits}")
    cols = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields) + [StructField("maybe_seen", BooleanType(), False)]
    )
    hashed = df.select("*", _h1(key_col).alias("_h1"), _h2(key_col).alias("_h2"))
    # the handle is attached to the returned DataFrame (``_bloom_bc``) so a
    # caller that materializes the probe can destroy() it deterministically
    # instead of waiting on GC + ContextCleaner — at GB bitmap sizes an
    # iterative caller leaks a blob per cycle otherwise (frontier_new_keys
    # does exactly this cleanup)
    bc = df.sparkSession.sparkContext.broadcast(bloom)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for b in batches:
            h1 = b["_h1"].to_numpy(np.int64)
            h2 = b["_h2"].to_numpy(np.int64)
            ok = np.ones(len(b), dtype=bool)
            for i in range(k):
                pos = (h1 + i * h2) % m_bits
                ok &= ((bm[pos >> 3] >> (pos & 7)) & 1).astype(bool)
            out = b[cols].copy()
            out["maybe_seen"] = ok
            yield out

    out_df = hashed.mapInPandas(probe, schema=out_schema)
    out_df._bloom_bc = bc  # cleanup handle for materializing callers
    return out_df


def frontier_new_keys(
    base: DataFrame,
    candidates: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    merge_groups: int = 64,
) -> DataFrame:
    """Exactly-new candidates, bloom-accelerated: rows the bloom clears are
    new by construction (zero joins); only ``maybe_seen`` rows (true dups +
    the ~FPR sliver) pay the exact anti-join against the base. Result is
    IDENTICAL to the plain anti-join — the bloom changes the cost, not the
    answer. ``merge_groups`` passes through to the bitmap tree merge —
    raise it when ``num_partitions/merge_groups`` blobs of m/8 bytes exceed
    executor memory.

    Lifecycle choices for the steady-state crawl loop this accelerates:

    * ``base`` is scanned ONCE per cycle — its distinct key set is cached
      with ``persist(MEMORY_AND_DISK)`` (lineage PRESERVED, so an executor
      loss recomputes blocks instead of failing the job, unlike a
      localCheckpoint, which at the advertised 10^9-URL history would pin
      the whole history in non-replicated block storage); the cache is
      released by Spark's ContextCleaner once the returned frame — the
      last reference to it — is dropped;
    * the candidate probe IS locally checkpointed (eagerly) — it is one
      cycle's candidates, orders of magnitude smaller than the history —
      which lets the bitmap broadcast be ``destroy()``-ed deterministically
      right here rather than leaking one m/8-byte blob per crawl cycle to
      GC timing.
    """
    from pyspark import StorageLevel

    base_keys = (
        base.select(key_col).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    )
    bloom = bloom_bitmap_bytes(base_keys, key_col, m_bits, k, merge_groups)
    return probe_and_confirm(candidates, key_col, bloom, m_bits, k, base_keys)


def probe_and_confirm(
    candidates: DataFrame,
    key_col: str,
    bloom: bytes,
    m_bits: int,
    k: int,
    history: Optional[DataFrame],
) -> DataFrame:
    """The frontier kernel shared by the batch (:func:`frontier_new_keys`)
    and streaming (``streaming/frontier_stream``) paths: probe distinct
    candidates against a prebuilt bitmap, eagerly checkpoint the probe
    (it feeds BOTH branches, and materializing it lets the bitmap
    broadcast be destroyed deterministically right here), emit
    bitmap-cleared rows join-free and anti-join only the ``maybe_seen``
    sliver against ``history`` (``None`` → empty history, everything
    ``maybe_seen`` is a false positive by construction)."""
    probed_raw = probe_bloom(
        candidates.select(key_col).distinct(), key_col, bloom, m_bits, k
    )
    probed = probed_raw.localCheckpoint(eager=True)
    probed_raw._bloom_bc.destroy()
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed = (
        suspects.join(history, key_col, "left_anti")
        if history is not None
        else suspects
    )
    return fresh.unionByName(confirmed)
