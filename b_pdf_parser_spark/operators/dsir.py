"""DSIR-style data selection via importance resampling (the public
algorithm of Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): fit hashed-n-gram bag-of-words models on a
TARGET domain and on the RAW pool, score every raw document with the
importance log-weight Σ_features [log p_target(b) − log p_raw(b)], then
resample with Gumbel-top-k — which is exactly "sample k without
replacement proportionally to the importance weights", done here with
DETERMINISTIC Gumbel noise derived from md5 so the selection is
reproducible across cluster sizes, retries and the DuckDB oracle.

Numeric-parity design (the whole reason this is hash-green and not
rows-only): every float only ever exists as a ROUNDED PER-ROW scalar
that is immediately cast to DECIMAL — the per-bucket log-ratio
``round(ln-terms, 9) :: DECIMAL(28,9)`` and the per-doc Gumbel noise
``round(-ln(-ln(u)), 9) :: DECIMAL(28,9)``. All SUMS and the final
score addition happen in exact decimal arithmetic, so they are
independent of partitioning and addition order (float sums are not
associative; a Spark partial-agg tree and DuckDB's single-threaded sum
would disagree in the last ulps). The only cross-engine float contract
left is libm ``ln`` on identical doubles, absorbed by the round(,9).

Scale shape (100 TB lens): the n-gram explode is map-only; the two
bucket models are ONE map-side-combined aggregation to 16^hex rows
(kilobytes — broadcast back); the per-doc weight is a broadcast join +
one doc-keyed partial aggregation; the final top-k is
TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
never a global sort. Nothing here holds state proportional to the
corpus on any single node.

Reference parity note: the reference pipeline (SURVEY.md §2) has no
data-selection stage; the contract is the published algorithm.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .textstats import word_ngrams

__all__ = ["dsir_select"]


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    bucket_hex_len: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ the ``k`` resampled rows: (doc_id, logw, gumbel, score), score
    descending. ``target_pred`` marks the target-domain rows INSIDE the
    pool (they participate in the raw model too, as in the paper's
    "raw" = the full crawl). Features are hashed word uni+bigrams in
    ``16**bucket_hex_len`` buckets keyed by leading md5 hex chars (the
    repo's portable-hash idiom); both models use add-one smoothing."""
    n_buckets = 16 ** bucket_hex_len
    text = F.col(text_col)
    grams = F.concat(word_ngrams(text, 1), word_ngrams(text, 2))
    feats = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_t"),
        F.explode(grams).alias("g"),
    ).withColumn("b", F.substring(F.md5("g"), 1, bucket_hex_len))

    # both models in ONE aggregation pass over the exploded features
    cnt = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cq"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
    )
    tot = cnt.agg(
        F.sum("cq").alias("q_tot"), F.sum("ct").alias("t_tot")
    )
    lr = (
        F.log(F.col("ct") + 1) - F.log(F.col("t_tot") + n_buckets)
        - F.log(F.col("cq") + 1) + F.log(F.col("q_tot") + n_buckets)
    )
    weights = cnt.crossJoin(F.broadcast(tot)).select(
        "b", F.round(lr, 9).cast("decimal(28,9)").alias("lr")
    )

    logw = (
        feats.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.sum("lr").alias("logw"))  # exact decimal sum
    )

    # deterministic Gumbel noise: u = (first-8-hex-of-md5(doc_id) + 0.5)/2^32
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") + 0.5
    ) / F.lit(4294967296.0)
    gumbel = F.round(-F.log(-F.log(u)), 9).cast("decimal(28,9)")

    # the FINAL addition is a single IEEE double op in both engines (a
    # decimal sum here would overflow DuckDB's 38-digit width and fall
    # back to double on one side only — a last-ulp .9g mismatch)
    scored = logw.select(
        "doc_id",
        F.col("logw").cast("double").alias("logw"),
        gumbel.cast("double").alias("gumbel"),
        (F.col("logw").cast("double") + gumbel.cast("double")).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
