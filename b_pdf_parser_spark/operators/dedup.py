"""Deduplication operators for web-scale training-data pipelines.

Five families, all expressed as pure DataFrame plans (shuffle-conscious,
no Python in the hot path), each with a DuckDB-oracle-compatible formula:

* **exact**          — content-hash groupBy (one shuffle on a 16-byte key,
  map-side partial agg; at 10^12 docs this is the cheapest possible dedup)
* **MinHash + LSH**  — word-3-gram shingles → k seeded min-hashes → bands →
  candidate pairs via a self-equi-join on band keys (shuffle keyed on the
  *band*, so only colliding docs ever meet — the scale path)
* **n-gram Jaccard** — exact similarity for candidate pairs (shingle-set
  intersection via join; used to confirm LSH candidates)
* **SimHash**        — 16-bit bit-vote signature; band-bucket (bit-sampling
  LSH) candidates confirmed by exact hamming distance
* **Winnowing**      — rolling n-gram-hash window minima (Schleimer et al.
  2003): position-robust fingerprint sets for partial-overlap detection

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
    "shingles_with_pos",
    "minhash_signatures",
    "minhash_signature_string",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "incremental_dedup",
    "simhash",
    "simhash_candidate_pairs",
    "simhash_neardup_pairs",
    "winnow_fingerprints",
    "duplicate_spans",
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


def shingles_with_pos(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Positional word n-gram shingles (id, pos, shingle) — duplicates kept,
    one row per gram start position (winnowing needs positions)."""
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
        .select("id", "pos", "shingle")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Word n-gram shingle *set* via posexplode + lead window (W1/W3 pattern)."""
    return shingles_with_pos(df, id_col, text_col, n).select("id", "shingle").distinct()


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K, n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(id, seed, minhash) — minhash = min md5('<seed>:'||shingle) prefix.

    ``shingles_df`` (an (id, shingle) frame, typically checkpointed) lets a
    caller that also needs the shingle sets for a confirm join compute the
    explode+window subtree once instead of once per consumer.
    """
    sh = shingles(df, id_col, text_col, n) if shingles_df is None else shingles_df
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
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates: equal band-key ⇒ candidate. Returns (id_a, id_b).

    The self-join shuffles on (band, band_key) — only hash-colliding docs
    co-locate, so the join stays linear-ish at 10^12 docs instead of the
    quadratic all-pairs. ``shingles_df`` forwards to `minhash_signatures`.
    """
    rows_per_band = k // bands
    sig = minhash_signatures(df, id_col, text_col, k, n, shingles_df=shingles_df)
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
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.0,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for LSH candidate pairs: (id_a, id_b, jaccard).

    The shingle subtree (explode + lead window + distinct — the most
    expensive piece of the whole near-dup path) is computed ONCE behind a
    lazy checkpoint and shared by the minhash signatures, the intersection
    probe, and the set sizes; previously the LSH candidates recomputed it.
    """
    sh = (
        shingles(df, id_col, text_col, n).localCheckpoint(eager=False)
        if shingles_df is None else shingles_df
    )  # used 4×: minhash, intersection a-side, b-side, sizes
    cands = lsh_candidate_pairs(df, id_col, text_col, n=n, shingles_df=sh)
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


def _simhash_band_pairs(sig: DataFrame, bits: int, bands: int) -> DataFrame:
    """Candidate pairs from a (id, simhash) frame via band buckets
    (bit-sampling LSH): agreement on ANY full band ⇒ candidate — guaranteed
    to include every pair with hamming distance < ``bands``. The self-join
    shuffles on (band, key) only, linear-ish at 10^12 docs."""
    per = bits // bands
    mask = (1 << per) - 1
    keys = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * per).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    keys = keys.localCheckpoint(eager=False)  # referenced twice by the self-join
    a = keys.alias("a")
    b = keys.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16, bands: int = 2
) -> DataFrame:
    """Hamming-adjacent SimHash candidates (see ``_simhash_band_pairs``)."""
    return _simhash_band_pairs(simhash(df, id_col, text_col, bits), bits, bands)


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str,
    bits: int = 16, bands: int = 2, hamming_max: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: band-bucket candidates confirmed by exact
    hamming distance ≤ ``hamming_max`` (bit_count of XOR). The signature
    subtree is computed once (checkpointed) and reused for banding and for
    the confirm join. Returns (id_a, id_b, hamming)."""
    sig = simhash(df, id_col, text_col, bits).localCheckpoint(eager=False)
    cands = _simhash_band_pairs(sig, bits, bands)
    sa = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
    )


def incremental_dedup(
    base: DataFrame, incoming: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Ingest-time dedup: of an incoming batch, keep one representative
    (min id) per content hash that does NOT already exist in the base
    corpus. This is the shape every rolling crawl ingest needs — the new
    snapshot is deduped against itself AND against everything already
    stored, without ever recomputing the base corpus's groups.

    Scale: the base side reduces to a distinct 16-byte-hash set (its
    cheapest possible representation; at 10^12 docs this is the hash
    manifest a lakehouse would maintain incrementally), the incoming side
    is one groupBy on the same key, and the anti-join shuffles both on the
    uniformly-distributed hash — no skew, no quadratic term.
    """
    seen = base.select(F.md5(F.col(text_col)).alias("content_hash")).distinct()
    reps = (
        incoming.select(
            F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"))
    )
    return reps.join(seen, "content_hash", "left_anti").select("keep_id", "content_hash")


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003): hash
    every positional word n-gram, slide a window of ``w`` consecutive grams,
    keep the minimum hash of each full window, dedupe per document. Output
    (id, fp) — the fingerprint set is position-robust: local edits perturb
    only nearby windows, so shared content still collides.

    Pure window + aggregate plan (one shuffle on id); md5-prefix hashes make
    the selection portable to the DuckDB oracle (ties are lexicographic and
    astronomically unlikely)."""
    g = shingles_with_pos(df, id_col, text_col, n)
    h = F.substring(F.md5("shingle"), 1, 16)
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    hashed = g.select("id", "pos", h.alias("h"))
    m = hashed.select("id", "pos", F.min("h").over(win).alias("wmin"))
    sizes = hashed.groupBy("id").agg(F.max("pos").alias("maxp"))
    return (
        m.join(sizes, "id")
        .filter(F.col("pos") <= F.col("maxp") - (w - 1))  # full windows only
        .select("id", F.col("wmin").alias("fp"))
        .distinct()
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, w: int = 8
) -> DataFrame:
    """Substring-level (span) duplication — the scalable approximation of
    Lee et al. 2021's suffix-array ExactSubstr dedup ("Deduplicating
    Training Data Makes Language Models Better"): hash every rolling
    ``w``-token window; a window whose hash occurs in ≥ 2 *distinct*
    documents is duplicated text. Per document returns

    ``(doc_id, n_windows, dup_windows, dup_frac)``

    where ``dup_frac`` is the fraction of the document's windows that are
    duplicated somewhere else in the corpus (the per-doc signal a training
    pipeline thresholds to trim boilerplate spans). Documents shorter than
    ``w`` tokens have no windows and are dropped.

    Scale shape (the reason this replaces a suffix array at 10^12 docs):
    map-only window hashing (array expression, no per-gram window
    function), then one groupBy on the 16-byte hash and one hash-keyed
    join back — both linear, map-side combined, skew-benign (a window
    shared by millions of docs is one hot *build* key, which AQE splits).
    No driver state, no all-pairs. ``dup_frac`` is an unrounded int/int
    IEEE double, so the DuckDB oracle is bit-identical.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    arr = F.when(
        F.size(toks) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - w + 1),
            lambda i: F.md5(F.array_join(F.slice(toks, i, w), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = df.select(F.col(id_col).alias("doc_id"), F.explode(arr).alias("h"))
    # referenced twice (dup-set build + probe); checkpoint so the scan+hash
    # subtree runs once
    wins = wins.localCheckpoint(eager=False)
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(True).alias("dup"))
    )
    return (
        wins.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("dup"), F.lit(1)).otherwise(F.lit(0))).alias("dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "dup_windows",
            (F.col("dup_windows") / F.col("n_windows")).alias("dup_frac"),
        )
    )


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
