"""Operator package. Shared plan helpers live here."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame) -> DataFrame:
    """Round-robin the frame up to the session's parallelism when its scan
    is narrower — scale-adaptively (the width derives from the cluster,
    never a constant).

    Why: the test tables are single-row-group parquet files, and a row
    group is indivisible — ``maxPartitionBytes`` byte-splits notwith-
    standing, ONE task reads all rows, so every map-side stage above the
    scan (Arrow batch kernels, explodes, partial aggregations) ran
    serially while the rest of the cluster idled. A few hundred KB of
    shuffle buys full-width compute. On a production layout (many files /
    row groups ≥ cluster width) the partition count already meets the
    parallelism and this is a no-op — no Exchange is added.

    Determinism: round-robin repartition is retry-safe (Spark sorts
    before repartitioning, SPARK-23207) and every consumer here is
    row-order-independent (aggregations / joins / per-row maps whose
    outputs are hashed order-insensitively or re-sorted downstream).
    """
    if df.isStreaming:  # no static partition count to inspect
        return df
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)
