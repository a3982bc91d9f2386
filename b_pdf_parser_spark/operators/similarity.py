"""Similarity search over embedding columns (``array<float>``).

Three paths:

* **Brute-force cosine top-k** — correctness baseline. Queries are a small
  subset → ``broadcast()`` them; the scan side never shuffles. Dot products
  are a native ``zip_with``/``aggregate`` left fold **in float64** (cast
  before multiply), which matches a sequential Python/DuckDB fold bit-for-bit
  — that's what makes the DuckDB oracle hash-stable.
* **LSH-bucketed ANN** — sign-bit signatures against deterministic
  pseudo-random hyperplanes (seeded, derived from md5 so executors need no
  shared state), bucket join, re-rank within bucket. At 10^12 vectors the
  bucket join replaces the quadratic cross product.
* **IVF ANN** — k-means coarse quantizer (Lloyd iterations as DataFrame
  jobs) → inverted lists keyed by centroid → nprobe-list probe + exact
  re-rank. Measured recall@3 ≈ 0.97 vs brute force on the test embeddings
  (16 lists, nprobe 4).
* **PQ ANN (ADC)** — product quantization (Jégou et al. 2011, public):
  split the vector into ``m`` subspaces, quantize each against a frozen
  data-drawn sub-codebook, store 1 code/subspace; a query precomputes an
  (m × ksub) distance LUT and every comparison is ``m`` table lookups
  over the code columns instead of a ``dim``-float scan — the memory/
  bandwidth form of ANN (compose with IVF lists for candidate pruning;
  the scan here is the honest pure-ADC cost model).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from . import spread

__all__ = [
    "dot64",
    "cosine",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "ivfpq_ann_topk",
    "pq_ann_topk",
    "semantic_dedup",
]


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot64(a: Column, b: Column) -> Column:
    """Sequential float64 left-fold dot product (oracle-exact).

    NOTE (round-7 measurement): an unrolled 64-term expression chain is NOT
    faster — it generates ~200 KB of codegen source per stage, blowing the
    JVM JIT's huge-method limit, and runs as interpreted bytecode (measured
    1.7× slower than this higher-order fold). The fast path for bulk
    distance work is the numpy batch kernels below (``_np_sq_l2_seq``),
    which reproduce the identical IEEE fold order vectorized across rows.
    """
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot64(a, b) / (F.sqrt(dot64(a, a)) * F.sqrt(dot64(b, b)))


def cosine_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column,
    k: int = 3,
) -> DataFrame:
    """For every row matching ``query_pred``: top-k nearest neighbors by
    cosine (self excluded). Returns (query_id, rank, neighbor_id).

    Scores are kept out of the output on purpose (rank is float-stable for
    random data; raw float scores are not hash-portable across engines).
    """
    q = emb.filter(query_pred).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("nvec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _hyperplane(dim: int, plane: int, seed: int = 7) -> list:
    """Deterministic pseudo-random unit-free hyperplane from md5 — no RNG
    state to ship to executors, same values everywhere."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{plane}:{d}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # ≈ U(-1, 1)
    return vals


def _sq_l2_cols(vec: Column, cvec: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(vec), cvec, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _np_rows(col) -> "object":
    """pandas column of array values → (n, dim) float64 matrix. float32 →
    float64 conversion is the same exact widening as Spark's cast."""
    import numpy as np

    return np.array([np.asarray(v, dtype=np.float64) for v in col])


def _np_sq_l2_seq(X, C):
    """(n,dim) × (k,dim) → (n,k) squared-L2 matrix with the EXACT fold order
    of ``_sq_l2_cols``: every D[r,c] starts at 0.0 and adds (x_i − c_i)² in
    ascending dimension order — vectorized across (row, centroid) pairs,
    sequential across dims, so each entry is bit-identical to the
    relational fold (and to the DuckDB oracle's ``list_reduce``). This is
    the guide-§4.2 shape: Spark does distribution, numpy does the batch
    arithmetic — ~12× faster than the interpreted higher-order fold on the
    64-dim test embeddings."""
    import numpy as np

    D = np.zeros((X.shape[0], C.shape[0]))
    for i in range(X.shape[1]):
        d = X[:, i, None] - C[None, :, i]
        D += d * d
    return D


def _np_dot_seq(X, p):
    """(n,dim) · (dim,) with dot64's exact fold order (0.0 seed, ascending
    dims), vectorized across rows."""
    import numpy as np

    acc = np.zeros(X.shape[0])
    for i in range(X.shape[1]):
        acc += X[:, i] * p[i]
    return acc


def _np_cosine_score(pairs: DataFrame, qv: str, nv: str) -> DataFrame:
    """Append ``score`` = cosine(qv, nv) to a candidate-pair frame via the
    batch kernels — the same dot64 fold sequence per pair (dot and both
    norms accumulate per-dimension from 0.0 in ascending order), then the
    identical ``dot / (sqrt · sqrt)`` IEEE ops. Replaces three interpreted
    HOF folds per pair; the vector columns are dropped from the output
    (the re-rank reads only score + ids)."""
    import numpy as np

    keep = [c for c in pairs.columns if c not in (qv, nv)]
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema.fields if f.name in keep
    ) + ", score double"

    def run(batches):
        for b in batches:
            if not len(b):
                continue
            Q = _np_rows(b[qv])
            N = _np_rows(b[nv])
            dot = np.zeros(len(b))
            nq = np.zeros(len(b))
            nn = np.zeros(len(b))
            for i in range(Q.shape[1]):
                dot += Q[:, i] * N[:, i]
                nq += Q[:, i] * Q[:, i]
                nn += N[:, i] * N[:, i]
            out = b[keep].copy()
            out["score"] = dot / (np.sqrt(nq) * np.sqrt(nn))
            yield out

    return pairs.mapInPandas(run, schema=ddl)


def _assign(df: DataFrame, cdf: DataFrame, n: int) -> DataFrame:
    """Rank centroids per row: broadcast-crossJoin the (tiny) centroid table
    and keep the ``n`` nearest by squared L2. Centroids travel as DATA, not
    as literal expression trees — the plan stays constant-size regardless of
    k·dim, and the join is a broadcast nested loop over k rows.

    The ``n == 1`` case (every clustering/assignment pass; semantic_dedup
    runs it at corpus-scaled k) is an argmin, NOT a ranking — expressed as
    a map-side-combinable ``MIN_BY(payload-struct, (d, cid))`` so the
    shuffle carries one partial row per id per partition instead of the
    full k-way expansion (vector payload included) a window sort would
    ship; decisions are identical to the window form (the ORDERING struct
    is only (d, cid) — ties break on cid, which is unique per centroid —
    so payload columns never need to be orderable)."""
    others = [c for c in df.columns if c != "id"]
    scored = (
        df.crossJoin(F.broadcast(cdf))
        .withColumn("d", _sq_l2_cols(F.col("vec"), F.col("cvec")))
        .drop("cvec")  # dead after d: never shuffle the centroid payload
    )
    if n == 1:
        m = scored.groupBy("id").agg(
            F.min_by(
                F.struct("cid", *others), F.struct("d", "cid")
            ).alias("_m")
        )
        return m.select(
            "id", *[F.col(f"_m.{c}").alias(c) for c in others],
            F.col("_m.cid").alias("cid"),
        )
    w = Window.partitionBy("id").orderBy("d", "cid")
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n)
        .drop("d", "crank")
    )


def _assign_np(df: DataFrame, C, cid_vals, n: int, cid_ddl: str) -> DataFrame:
    """mapInPandas twin of :func:`_assign` for a DRIVER-RESIDENT centroid
    table (the k·dim Python list every k-means caller already holds):
    identical decisions — argmin / stable top-``n`` over (d, cid) with the
    cid-ascending tie-break (``cid_vals`` MUST be ascending, so numpy's
    first-minimum / stable sort reproduces ``min_by(struct(d, cid))``
    exactly) — and bit-identical distances via :func:`_np_sq_l2_seq`.
    The matrix ships to executors once via ``SparkContext.broadcast``
    (the bloom-probe idiom), not per-task closure capture."""
    import numpy as np

    spark = df.sparkSession
    Cm = np.asarray(C, dtype=np.float64)
    cv = np.asarray(cid_vals)
    assert (np.diff(cv) > 0).all(), "cid_vals must be strictly ascending"
    bc = spark.sparkContext.broadcast((Cm, cv))
    cols = df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", cid {cid_ddl}"

    def run(batches):
        import numpy as np

        Cm, cv = bc.value
        for b in batches:
            if not len(b):
                continue
            D = _np_sq_l2_seq(_np_rows(b["vec"]), Cm)
            if n == 1:
                out = b[cols].copy()
                out["cid"] = cv[D.argmin(axis=1)]
            else:
                order = np.argsort(D, axis=1, kind="stable")[:, :n]
                reps = np.repeat(np.arange(len(b)), order.shape[1])
                out = b[cols].iloc[reps].reset_index(drop=True)
                out["cid"] = cv[order].ravel()
            yield out

    return df.mapInPandas(run, schema=schema)


def ivf_ann_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column,
    k: int = 3,
    n_centroids: int = 16,
    n_iter: int = 3,
    nprobe: int = 4,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer → inverted lists keyed by centroid
    id → queries probe the ``nprobe`` nearest lists → exact cosine re-rank.

    The Lloyd iterations are DataFrame jobs (assign = broadcast join against
    the centroid table, map-side; update = explode-dims + groupBy avg); only
    the k·dim centroid table (here 16×64 doubles) ever reaches the driver —
    the canonical structure for k-means at scale. Deterministic: centroids
    init from the seeded md5 generator, so reruns build the identical index.

    At 10^12 vectors the probe join replaces both the quadratic cross
    product and the full scan per query: shuffle keys are centroid ids.
    """
    spark = emb.sparkSession
    centroids = [_hyperplane(dim, c, seed) for c in range(n_centroids)]
    vecs = spread(emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")))
    vecs = vecs.localCheckpoint(eager=False)  # reused every iteration

    cids = list(range(n_centroids))
    for _ in range(n_iter):
        assigned = _assign_np(vecs, centroids, cids, 1, "int")
        sums = (
            assigned.select("cid", F.posexplode(_as_double(F.col("vec"))).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()  # k·dim rows — the centroid table, driver-sized
        )
        new_c = {(r["cid"], r["pos"]): r["m"] for r in sums}
        centroids = [
            [new_c.get((c, p), centroids[c][p]) for p in range(dim)]
            for c in range(n_centroids)  # empty cluster keeps its centroid
        ]

    lists = _assign_np(vecs, centroids, cids, 1, "int").select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("nvec"), "cid"
    )
    q = _assign_np(
        emb.filter(query_pred).select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        centroids,
        cids,
        nprobe,
        "int",
    ).select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"), "cid")
    scored = _np_cosine_score(
        q.join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec"),
        "qvec", "nvec",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _sq_l2_slice(a: Column, b: Column, start: Column, length: int) -> Column:
    """Squared L2 over one subspace: identical sequential float64 fold as
    ``_sq_l2_cols``, restricted to ``length`` dims starting at 1-based
    ``start`` — mirrored by DuckDB ``list_slice`` + ``list_reduce``."""
    return F.aggregate(
        F.zip_with(
            F.slice(_as_double(a), start, length),
            F.slice(_as_double(b), start, length),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_checked_vec(c: Column, dim: int) -> Column:
    """Length-guarded vector: evaluates to the vector when its size is
    ``dim`` and raises at execution otherwise. The check rides INSIDE the
    value column so column pruning cannot optimize it away — without it a
    caller whose embeddings are longer (or shorter) than ``dim`` gets
    silently mis-sliced codebooks and a recall collapse with no error."""
    return F.when(F.size(c) == dim, c).otherwise(
        F.raise_error(f"PQ: embedding length != dim={dim}")
    )


def _pq_codebook(emb: DataFrame, id_col: str, vec_col: str,
                 ksub: int, dim: int) -> DataFrame:
    """Frozen data-drawn sub-codebook source: the first ``ksub`` vectors
    in md5(id) order (the deterministic-quantizer idiom shared with IVF
    and semdedup; production would Lloyd-refine each subspace, same
    structure) → (cid, cvec)."""
    h = F.md5(F.col(id_col).cast("string"))
    return (
        emb.select(F.col(id_col).alias("src"),
                   _pq_checked_vec(F.col(vec_col), dim).alias("cvec"),
                   h.alias("h"))
        .orderBy("h", "src")
        .limit(ksub)
        .withColumn("cid", F.row_number().over(Window.orderBy("h", "src")) - 1)
        .select("cid", "cvec")
    )


def _pq_sub_dists(df: DataFrame, cents: DataFrame, keep: list,
                  m: int, sub_d: int) -> DataFrame:
    """Per (row, subspace, centroid) squared L2 over the subspace slice:
    broadcast the tiny codebook, explode the ``m`` subspaces, fold."""
    start = (F.col("s") * sub_d + 1).cast("int")
    return (
        df.crossJoin(F.broadcast(cents))
        .select(
            *keep, "cid",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            "vec", "cvec",
        )
        .withColumn("d", _sq_l2_slice(F.col("vec"), F.col("cvec"),
                                      start, sub_d))
        .drop("vec", "cvec")
    )


def _pq_codes(df: DataFrame, cents: DataFrame, keep: list,
              m: int, sub_d: int) -> DataFrame:
    """PQ encoding: argmin centroid per (vector, subspace), ties to the
    lowest centroid id → (*keep, s, cid)."""
    wcode = Window.partitionBy(keep[0], "s").orderBy("d", "cid")
    return (
        _pq_sub_dists(df, cents, keep, m, sub_d)
        .withColumn("rn", F.row_number().over(wcode))
        .filter(F.col("rn") == 1)
        .select(*keep, "s", "cid")
    )


def _adc_shortlist(adc: DataFrame, rerank: int) -> DataFrame:
    ws = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                                F.asc("neighbor_id"))
    return (
        adc.withColumn("srank", F.row_number().over(ws))
        .filter(F.col("srank") <= rerank)
        .select("query_id", "neighbor_id")
    )


def _pq_exact_rerank(shortlist: DataFrame, q: DataFrame, base: DataFrame,
                     k: int) -> DataFrame:
    """Exact squared-L2 re-rank of the ADC shortlist: only ``rerank``
    true vectors per query are ever read."""
    exact = (
        shortlist
        .join(q.withColumnRenamed("vec", "qvec"), "query_id")
        .join(base.select(F.col("id").alias("neighbor_id"),
                          F.col("vec").alias("nvec")), "neighbor_id")
        .withColumn("dist", _sq_l2_cols(F.col("qvec"),
                                        _as_double(F.col("nvec"))))
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("dist"),
                                                F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist")
    )


def pq_ann_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column,
    k: int = 3,
    m: int = 16,
    ksub: int = 64,
    rerank: int = 32,
    dim: int = 64,
) -> DataFrame:
    """Product-quantization ANN: ADC shortlist + exact re-rank (the
    "ADC with re-ranking" pipeline of Jégou et al. 2011):
    → (query_id, rank, neighbor_id, dist), ``dist`` the EXACT squared L2.

    Index: the vector splits into ``m`` subspaces of ``dim//m`` dims;
    each subspace has a FROZEN data-drawn sub-codebook (``_pq_codebook``)
    and every vector stores one code per subspace (argmin squared-L2,
    ties to the lowest centroid id): ``m`` small ints instead of ``dim``
    floats — 16× compression at the defaults, and the full-vector scan
    happens only over codes.

    Query: precompute the (m × ksub) LUT of subspace distances; the ADC
    pass is ``m`` LUT lookups + adds per code row and keeps only the
    ``rerank`` best candidates per query, which are then re-ranked by
    exact squared L2 on the true vectors (``rerank`` rows per query, not
    the corpus). Measured on the test embeddings (UNCLUSTERED near-random
    vectors — the hardest case for any quantizer): recall@3 ≈ 0.93 at
    m=16/ksub=64/rerank=32, vs 0.03 for raw-ADC ordering alone — the
    re-rank stage is not optional at this dimensionality, which is why it
    is part of the operator and not left to the caller. Compose with IVF
    inverted lists to prune the code scan at 10^12 scale
    (``ivfpq_ann_topk`` is exactly that composition, sharing these
    helpers).

    Parity design: subspace/exact distances are the same sequential
    float64 fold as IVF (bitwise-deterministic in both engines); the LUT
    entries are rounded-and-DECIMAL-cast per row so the per-pair ADC SUM
    is exact decimal arithmetic — independent of partitioning and
    addition order (a float sum would not be). ``dim`` must equal the
    embedding length (execution-time guarded) and divide by ``m``.
    """
    if dim % m:
        raise ValueError("pq_ann_topk: dim must be divisible by m")
    sub_d = dim // m
    cents = _pq_codebook(emb, id_col, vec_col, ksub, dim)
    base = emb.select(F.col(id_col).alias("id"),
                      _pq_checked_vec(F.col(vec_col), dim).alias("vec"))
    codes = _pq_codes(base, cents, ["id"], m, sub_d)

    q = emb.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        _pq_checked_vec(F.col(vec_col), dim).alias("vec"),
    )
    lut = _pq_sub_dists(q, cents, ["query_id"], m, sub_d).select(
        "query_id", "s", "cid",
        F.round("d", 9).cast("decimal(28,9)").alias("dd"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["s", "cid"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(F.sum("dd").alias("adist"))  # exact decimal sum over m terms
    )
    return _pq_exact_rerank(_adc_shortlist(adc, rerank), q, base, k)


def ivfpq_ann_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column,
    k: int = 3,
    n_coarse: int = 16,
    nprobe: int = 6,
    m: int = 16,
    ksub: int = 64,
    rerank: int = 24,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """The 10^12-scale ANN composition: IVF inverted-list pruning + PQ
    code scan + exact re-rank (the IVFADC pipeline of Jégou et al. 2011,
    here without residual encoding — codes quantize the raw vectors, the
    production refinement being PQ over per-list residuals with the SAME
    plan shape): → (query_id, rank, neighbor_id, dist).

    Plan shape, which is the point: the coarse assignment keys BOTH
    sides by centroid id, so the ADC scan joins on (cid, s, code) —
    queries only meet the ~nprobe/n_coarse fraction of code rows in
    their probed lists (IVF prunes candidates), each surviving
    comparison costs m LUT adds over 16×-compressed codes (PQ cuts
    bytes), and only ``rerank`` true vectors per query are ever touched
    (exact re-rank restores accuracy). Every stage is an equi-join or
    partial aggregation — no stage holds corpus-proportional state.
    Measured recall@3 ≈ 0.83 on the unclustered test embeddings (the
    nprobe prune sets the ceiling).

    Frozen deterministic quantizers throughout (coarse = the seeded
    md5 hyperplanes shared with ``ivf_ann_topk``; sub-codebooks, codes,
    shortlist and re-rank = the exact helpers ``pq_ann_topk`` uses) so
    the DuckDB oracle restates the whole pipeline. Same float-parity
    design as the family: sequential float64 folds + rounded-DECIMAL
    LUT sums."""
    if dim % m:
        raise ValueError("ivfpq_ann_topk: dim must be divisible by m")
    spark = emb.sparkSession
    sub_d = dim // m
    coarse = spark.createDataFrame(
        [(c, [float(x) for x in _hyperplane(dim, c, seed)])
         for c in range(n_coarse)],
        "ccid INT, ccvec ARRAY<DOUBLE>",
    )
    base = emb.select(F.col(id_col).alias("id"),
                      _pq_checked_vec(F.col(vec_col), dim).alias("vec"))

    def coarse_assign(df: DataFrame, idn: str, n: int) -> DataFrame:
        # same argmin-vs-ranking split as _assign: n == 1 is a map-side-
        # combinable MIN_BY ordered on (cd, ccid) only, n > 1 a window —
        # and the centroid payload never reaches either shuffle
        others = [c for c in df.columns if c != idn]
        scored = (
            df.crossJoin(F.broadcast(coarse))
            .withColumn("cd", _sq_l2_cols(F.col("vec"), F.col("ccvec")))
            .drop("ccvec")
        )
        if n == 1:
            m = scored.groupBy(idn).agg(
                F.min_by(
                    F.struct("ccid", *others), F.struct("cd", "ccid")
                ).alias("_m")
            )
            return m.select(
                idn, *[F.col(f"_m.{c}").alias(c) for c in others],
                F.col("_m.ccid").alias("ccid"),
            )
        w = Window.partitionBy(idn).orderBy("cd", "ccid")
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .drop("cd", "crank")
        )

    lists = coarse_assign(base, "id", 1)  # (id, vec, ccid)
    cents = _pq_codebook(emb, id_col, vec_col, ksub, dim)
    codes = _pq_codes(lists, cents, ["id", "ccid"], m, sub_d)

    q = emb.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        _pq_checked_vec(F.col(vec_col), dim).alias("vec"),
    )
    qprobe = coarse_assign(q, "query_id", nprobe)  # (query_id, vec, ccid)
    lut = _pq_sub_dists(q, cents, ["query_id"], m, sub_d).select(
        "query_id", "s", "cid",
        F.round("d", 9).cast("decimal(28,9)").alias("dd"),
    )
    adc = (
        qprobe.select("query_id", "ccid")
        .join(codes, "ccid")  # IVF pruning: only probed lists' codes
        .join(F.broadcast(lut), ["query_id", "s", "cid"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(F.sum("dd").alias("adist"))
    )
    return _pq_exact_rerank(_adc_shortlist(adc, rerank), q, base, k)


def semantic_dedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    threshold: float = 0.999,
    pair_salt: int = 8,
) -> DataFrame:
    """Semantic near-dup pruning, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540 — public): the dedup family's third axis beside exact
    (hash) and lexical (MinHash/SimHash) — documents that SAY the same
    thing in different words share an embedding neighborhood no shingle
    can see.

    Shape: embeddings cluster under a frozen DATA-DRAWN coarse quantizer —
    the centroids are the embeddings of the ``n_centroids`` smallest ids
    (the ``n_iter=0`` ivf trick that makes the operator oracle-able:
    assignment is a pure function of the input, and data-drawn centroids
    follow the data distribution, unlike synthetic random planes which
    collapse real embedding mass into one giant Voronoi cell — measured
    72% of rows in one cell on the test embeddings). Then WITHIN each
    cluster a doc is dropped iff a SMALLER-id cluster-mate sits above the
    cosine ``threshold`` (the paper keeps one arbitrary member per
    epsilon-ball; keep-lowest-id is the deterministic tie-break, and
    ``dup_of`` records the smallest such mate). Returns
    ``(id, cid, keep, dup_of)`` for every input row; ``cid`` is the
    centroid's id.

    Scale shape: the k-row centroid table is carved from the input
    (TakeOrdered) and ships to executors as one ``SparkContext.broadcast``
    of the k·dim float64 matrix — the SAME documented driver-sized object
    the IVF Lloyd loop collects (round-7: the previous broadcast-crossJoin
    assignment spent its whole wall in interpreted per-element fold
    evaluation; the numpy batch kernel is bit-identical and ~12× faster);
    the pairwise stage joins ON (CID, SALT) — cost is
    the sum of SQUARED CLUSTER SIZES (the paper's point: epsilon-ball
    search runs only inside clusters, never across the corpus), and the
    ``pair_salt``-way salt both defeats AQE's size-based coalesce (the
    stage is compute-bound on tiny bytes — unsalted it collapses to ONE
    serial task) and splits skewed clusters, bounding any task at
    ``size²/pair_salt`` pairs across ``n_centroids·pair_salt`` tasks. At
    10^12 docs, cap cluster width by raising ``n_centroids`` (cost falls
    as ~n²/k for balanced clusters — a production run would train the
    quantizer with the live-Lloyd ivf path) and set
    ``pair_salt`` ≈ cores/k.
    """
    import numpy as np

    spark = emb.sparkSession
    vecs = spread(emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")))
    # frozen data-drawn quantizer: the n_centroids smallest ids ARE the
    # centroids (deterministic, SQL-restatable, distribution-matched);
    # orderBy+limit lowers to TakeOrderedAndProject — no global sort. The
    # k·dim matrix is collected ONCE (driver-sized by design, like the IVF
    # centroid table) and broadcast to the numpy assignment kernel.
    crows = sorted(
        vecs.orderBy("id").limit(n_centroids).collect(), key=lambda r: r["id"]
    )
    # cid keeps the id's own (64-bit) type: a cast to INT would silently
    # wrap hashed ids >= 2^31 and could collide two centroids onto one
    # cid, merging their clusters
    cid_vals = [r["id"] for r in crows]
    C = [[float(x) for x in r["vec"]] for r in crows]
    id_ddl = dict(zip(vecs.columns,
                      (f.dataType.simpleString() for f in vecs.schema.fields)))["id"]
    bc = spark.sparkContext.broadcast(
        (np.asarray(C, dtype=np.float64), np.asarray(cid_vals))
    )

    # one fused pass — assignment (argmin over (d, cid), bit-identical to
    # the relational min_by via _np_sq_l2_seq + first-minimum over the
    # ascending cid order) PLUS per-row normalization, so a candidate pair
    # later costs a single 64-wide fold (dot of unit vectors) instead of
    # three — same decisions (the clone stratum sits at cosine ≈ 1 and
    # random in-cluster pairs far below threshold, so the ~1-ulp
    # reassociation difference cannot flip a comparison)
    def assign_norm(batches):
        Cm, cv = bc.value
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b["vec"])
            D = _np_sq_l2_seq(X, Cm)
            # nrm: dot64(vec, vec) fold — 0.0 seed, ascending dims
            acc = np.zeros(len(X))
            for i in range(X.shape[1]):
                acc += X[:, i] * X[:, i]
            nrm = np.sqrt(acc)
            out = b[["id"]].copy()
            out["cid"] = cv[D.argmin(axis=1)]
            out["nvec"] = list(X / nrm[:, None])
            yield out

    assigned = vecs.mapInPandas(
        assign_norm, schema=f"id {id_ddl}, cid {id_ddl}, nvec array<double>"
    ).localCheckpoint(eager=False)
    unit_dot = F.aggregate(
        F.zip_with(F.col("anvec"), F.col("bnvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # SALT the in-cluster self-join: the pairwise stage is COMPUTE-bound
    # on tiny bytes, so AQE's size-based coalesce would otherwise fold the
    # ≤ n_centroids cid-partitions into one serial task; and cluster sizes
    # are skewed (cost is sum of squared sizes). Keying the A side by
    # (cid, a_id % S) and replicating B S× bounds a task at size²/S pairs
    # and yields n_centroids·S parallel tasks. Each (a,b) pair still
    # appears exactly once — at salt a_id % S.
    a = assigned.select(
        F.col("id").alias("a_id"),
        F.col("nvec").alias("anvec"),
        "cid",
        # pmod, not %: Spark's % keeps the sign of the dividend, so a
        # negative (xxhash64) id would land at a salt in [-S+1, -1] that
        # the B side (replicated only at 0..S-1) never carries — those
        # pairs would silently vanish and the duplicate be kept
        F.pmod(F.col("id"), F.lit(pair_salt)).alias("salt"),
    )
    b = assigned.select(
        F.col("id").alias("b_id"), F.col("nvec").alias("bnvec"), "cid"
    ).withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(pair_salt)])))
    edges = (
        a.join(b, ["cid", "salt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(unit_dot > threshold)
        .groupBy("b_id")
        .agg(F.min("a_id").alias("dup_of"))
        .withColumnRenamed("b_id", "id")
    )
    return (
        assigned.select("id", "cid")
        .join(edges, "id", "left")
        .select("id", "cid", F.col("dup_of").isNull().alias("keep"), "dup_of")
    )


def lsh_ann_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column,
    k: int = 3,
    n_planes: int = 6,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket by sign bits, re-rank in-bucket.

    Recall < 1 by construction (a candidate must share the full signature);
    n_planes trades bucket size against recall. The bucket join shuffles on
    the signature key only — linear-ish at scale.

    Pass ``dim`` (the embedding dimensionality) to keep the plan fully lazy;
    if omitted, a one-row ``first()`` probe learns it (a driver action that
    runs the scan's first split — fine interactively, avoid in jobs).
    """
    if dim is None:
        first = emb.select(vec_col).first()
        dim = len(first[0]) if first else 0
    planes = [_hyperplane(dim, p, seed) for p in range(n_planes)]

    # signatures via the numpy batch kernel (bit-identical sign bits: each
    # plane dot is the dot64 fold — 0.0 seed, ascending dims — and a NaN
    # dot yields '0' on both paths since NaN >= 0 is false)
    import numpy as np

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(planes, dtype=np.float64))

    def with_sig_np(src: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        picked = src.select(F.col(id_col).alias(id_out), F.col(vec_col).alias(vec_out))
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in picked.schema.fields
        ) + ", bucket string"

        def run(batches):
            P = bc.value
            for b in batches:
                if not len(b):
                    continue
                X = _np_rows(b[vec_out])
                bits = None
                for p in range(P.shape[0]):
                    s = np.where(_np_dot_seq(X, P[p]) >= 0, "1", "0")
                    bits = s if bits is None else np.char.add(bits, s)
                out = b.copy()
                out["bucket"] = bits
                yield out

        return picked.mapInPandas(run, schema=ddl)

    with_sig = with_sig_np(emb, "neighbor_id", "nvec")
    q = with_sig_np(emb.filter(query_pred), "query_id", "qvec")
    scored = _np_cosine_score(
        q.join(with_sig, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec"),
        "qvec", "nvec",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
