"""Streaming exact dedup: the ingestion-time twin of the batch dedup pack.

A rolling crawl never sees its corpus at rest — documents arrive as a
stream, and the keep/drop decision must be made once, online. Structured
Streaming's ``dropDuplicates`` keyed on the content hash IS that operator:
state is a hash set sharded by the same key the batch path shuffles on,
and the watermark bounds state so a 10^12-doc run doesn't hold every hash
forever — duplicates separated by more than the watermark horizon are
re-admitted (the standard bounded-state trade-off; the batch
``incremental_dedup`` anti-join against the stored corpus catches those
downstream).

Scale design: the hash is computed map-side (a codegen'd ``md5``), the
stateful operator shuffles once on (content_hash), and state lives in the
executor state store (RocksDB-backed on a real cluster), checkpointed with
the query — a restart resumes with the hash set intact (no re-admitted
dups within the horizon).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["dedup_stream"]


def dedup_stream(
    docs_stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first-seen document per content hash within the watermark
    horizon. Emits the input columns plus ``content_hash``."""
    hashed = docs_stream.withColumn("content_hash", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicates(
        ["content_hash"]
    )
