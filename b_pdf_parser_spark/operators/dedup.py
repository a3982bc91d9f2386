"""Deduplication operators for web-scale training-data pipelines.

Four families, all expressed as pure DataFrame plans (shuffle-conscious,
no Python in the hot path), each with a DuckDB-oracle-compatible formula:

* **exact**          — content-hash groupBy (one shuffle on a 16-byte key,
  map-side partial agg; at 10^12 docs this is the cheapest possible dedup)
* **MinHash + LSH**  — word-3-gram shingles → k seeded min-hashes → bands →
  candidate pairs via a self-equi-join on band keys (shuffle keyed on the
  *band*, so only colliding docs ever meet — the scale path)
* **n-gram Jaccard** — exact similarity for candidate pairs (shingle-set
  intersection via join; used to confirm LSH candidates)
* **SimHash**        — 16-bit bit-vote signature; hamming-adjacent buckets

Portability notes (these choices make the DuckDB oracle byte-equal):
hashes are md5 hex *strings* (both engines agree); min/aggregation over
strings is lexicographic in both; shingles come from a ``lead()`` window
over ``posexplode``\\ ed single-space tokens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = [
    "exact_dup_stats",
    "shingles",
    "minhash_signatures",
    "minhash_signature_string",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
]

DEFAULT_K = 8  # minhash permutations
DEFAULT_BANDS = 4  # → rows-per-band = K / BANDS = 2


def exact_dup_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per content-hash group: size and representative (min id)."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keep_id"))
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Word n-gram shingles via posexplode + lead window (W1/W3 pattern)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("pos", "w"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    grams = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, n)]
    return (
        toks.select("id", "pos", F.concat_ws(" ", *grams).alias("shingle"),
                    F.lead("w", n - 1).over(w).alias("_last"))
        .filter(F.col("_last").isNotNull())
        .select("id", "shingle")
        .distinct()
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K, n: int = 3
) -> DataFrame:
    """(id, seed, minhash) — minhash = min md5('<seed>:'||shingle) prefix."""
    sh = shingles(df, id_col, text_col, n)
    seeded = sh.select(
        "id", F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("seed"), "shingle"
    )
    h = F.substring(F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle"))), 1, 16)
    return seeded.groupBy("id", "seed").agg(F.min(h).alias("minhash"))


def minhash_signature_string(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K, n: int = 3
) -> DataFrame:
    """One row per doc: 'seed=hash,...' signature string (oracle-friendly)."""
    sig = minhash_signatures(df, id_col, text_col, k, n)
    part = F.concat_ws("=", F.col("seed"), F.col("minhash"))
    return sig.groupBy("id").agg(
        F.array_join(F.array_sort(F.collect_list(part)), ",").alias("signature")
    )


def lsh_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str,
    k: int = DEFAULT_K, bands: int = DEFAULT_BANDS, n: int = 3,
) -> DataFrame:
    """Near-dup candidates: equal band-key ⇒ candidate. Returns (id_a, id_b).

    The self-join shuffles on (band, band_key) — only hash-colliding docs
    co-locate, so the join stays linear-ish at 10^12 docs instead of the
    quadratic all-pairs.
    """
    rows_per_band = k // bands
    sig = minhash_signatures(df, id_col, text_col, k, n)
    banded = sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    keys = banded.groupBy("id", "band").agg(
        F.array_join(F.array_sort(F.collect_list(F.concat_ws("=", "seed", "minhash"))), ",")
        .alias("band_key")
    )
    # the self-join references `keys` twice; checkpoint so the whole
    # shingle→minhash subtree (4 shuffles) is computed once, not twice
    keys = keys.localCheckpoint(eager=False)
    a = keys.alias("a")
    b = keys.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard for LSH candidate pairs: (id_a, id_b, jaccard)."""
    cands = lsh_candidate_pairs(df, id_col, text_col, n=n)
    sh = shingles(df, id_col, text_col, n).localCheckpoint(eager=False)  # used 3×
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.select(F.col("id").alias("id_a"), "shingle")
    b_sh = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cands.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        cands.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.coalesce("n_inter", F.lit(0))
                / (F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0))),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Duplicate clusters from candidate pairs: (id, cluster_id = min id of
    the connected component). Iterative min-label propagation — the standard
    shape for turning near-dup PAIRS into dedup GROUPS at scale (keep one
    doc per cluster). Each iteration is one join + one aggregate, label
    state is localCheckpoint'ed to cut lineage; converges in O(diameter)
    iterations (components from near-dup edges are shallow in practice).

    Deterministic: the fixpoint (min id reachable) is order-independent, so
    a DuckDB recursive CTE computes the identical result (the oracle).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct().localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
            .groupBy("id")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """16-bit SimHash by bit voting over token md5s (portable hex-digit bits).

    Bit j of token t = parity of hex digit j of md5(t); the doc bit is the
    sign of the vote sum; value = Σ bit_j · 2^j. One explode + one groupBy.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("w"),
    ).filter(F.col("w") != "")
    h = F.md5(F.col("w"))
    votes = [
        F.sum(
            F.when(F.substring(h, j + 1, 1).isin("1", "3", "5", "7", "9", "b", "d", "f"),
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    voted = toks.groupBy("id").agg(*votes)
    value = sum(
        (F.when(F.col(f"v{j}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** j))
        for j in range(bits)
    )
    return voted.select("id", value.cast("long").alias("simhash"))
