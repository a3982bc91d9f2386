"""Similarity-operator semantics: the approximate paths must actually be
good approximations of the oracle-checked brute-force baseline."""

import pyspark.sql.functions as F

from b_pdf_parser_spark.operators.similarity import cosine_topk, ivf_ann_topk

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_brute_force(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(e, query_pred=pred, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_ann_topk(e, query_pred=pred, k=3).collect()}
    assert len(exact) > 0
    # every query answered with exactly k results
    per_q = {}
    for q, _ in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert set(per_q.values()) == {3}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall  # measured 0.967 (16 lists, nprobe 4)


def test_ivf_deterministic(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") % 100 == 0
    a = sorted(map(tuple, ivf_ann_topk(e, query_pred=pred, k=3).collect()))
    b = sorted(map(tuple, ivf_ann_topk(e, query_pred=pred, k=3).collect()))
    assert a == b and len(a) > 0


def test_ivf_full_probe_equals_brute_force(spark):
    # the limit property that certifies the probe machinery: with
    # nprobe == n_centroids every inverted list is searched, so IVF must
    # return EXACTLY the brute-force answer (same ranks, same neighbors) —
    # any divergence means list assignment or candidate routing drops rows
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    exact = sorted(map(tuple, cosine_topk(e, query_pred=pred, k=3).collect()))
    full = sorted(map(tuple, ivf_ann_topk(
        e, query_pred=pred, k=3, n_centroids=16, nprobe=16).collect()))
    assert full == exact


def test_ivf_recall_monotone_in_nprobe(spark):
    # widening the probe may only help: recall@3 is nondecreasing in
    # nprobe (each wider probe searches a superset of the lists)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(e, query_pred=pred, k=3).collect()}
    recalls = []
    for nprobe in (1, 4, 16):
        approx = {(r["query_id"], r["neighbor_id"])
                  for r in ivf_ann_topk(e, query_pred=pred, k=3,
                                        nprobe=nprobe).collect()}
        recalls.append(len(exact & approx) / len(exact))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls


def test_semantic_dedup_drops_planted_clones(spark):
    # plant clones (scaled by 1.001 → cosine ≈ 1, same direction) and
    # assert the SemDeDup pass drops exactly them, attributing dup_of to
    # the original; near-orthogonal originals must all be kept
    from b_pdf_parser_spark.operators.similarity import semantic_dedup

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    clones = e.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.001).cast("float")
        ).alias("embedding"),
    )
    out = semantic_dedup(e.unionByName(clones), threshold=0.999).collect()
    dropped = {r["id"]: r["dup_of"] for r in out if not r["keep"]}
    n_clones = e.filter(F.col("vec_id") % 7 == 0).count()
    assert len(dropped) == n_clones
    assert all(cid == oid + 100000 for cid, oid in
               ((k, v) for k, v in dropped.items())), dropped
    # every kept row has no dup_of; every row accounted for
    assert all(r["dup_of"] is None for r in out if r["keep"])
    assert len(out) == e.count() + n_clones


def test_semantic_dedup_negative_ids(spark):
    # xxhash64-style ids are negative ~half the time; Spark's % keeps the
    # dividend's sign, so a plain `id % pair_salt` A-side salt lands
    # negative-id rows at salts the replicated B side never carries and
    # their pairs silently vanish (ADVICE r5). pmod fixes it: a clone pair
    # whose smaller id is negative MUST still be detected.
    from b_pdf_parser_spark.operators.similarity import semantic_dedup

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    # shift all ids negative, then clone a subset with HIGHER (still
    # negative) ids so dup_of (the min mate) is the negative original
    neg = e.select((F.col("vec_id") - 10_000_000).alias("vec_id"), "embedding")
    clones = neg.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.001).cast("float")
        ).alias("embedding"),
    )
    out = semantic_dedup(neg.unionByName(clones), threshold=0.999).collect()
    dropped = {r["id"]: r["dup_of"] for r in out if not r["keep"]}
    n_clones = clones.count()
    assert len(dropped) == n_clones, (len(dropped), n_clones)
    assert all(cid == oid + 100000 for cid, oid in
               ((k, v) for k, v in dropped.items())), dropped
    assert all(v < 0 for v in dropped.values())


def test_semantic_dedup_partition_invariant(spark):
    # decisions are pure functions of (vec, seed, threshold): repartitioning
    # the input must not change a single keep/dup_of verdict
    from b_pdf_parser_spark.operators.similarity import semantic_dedup

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    a = sorted(map(tuple, semantic_dedup(e.coalesce(1)).collect()))
    b = sorted(map(tuple, semantic_dedup(e.repartition(16)).collect()))
    assert a == b


def test_pq_ann_rerank_recall_vs_exact_l2(spark):
    import numpy as np

    from b_pdf_parser_spark.operators.similarity import pq_ann_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    approx = {(r["query_id"], r["neighbor_id"])
              for r in pq_ann_topk(e, query_pred=pred, k=3).collect()}
    rows = sorted(e.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = set()
    for qi, q in zip(ids, X):
        if qi % 50:
            continue
        d = ((X - q) ** 2).sum(1)
        d[ids == qi] = np.inf
        exact |= {(int(qi), int(ids[j])) for j in np.lexsort((ids, d))[:3]}
    per_q = {}
    for q, _ in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert set(per_q.values()) == {3}
    recall = len(exact & approx) / len(exact)
    # measured 0.93 at m=16/ksub=64/rerank=32 on these unclustered
    # vectors; raw ADC ordering alone measures 0.03 — the re-rank stage
    # carries the accuracy, exactly as in the paper's ADC+R variant
    assert recall >= 0.8, recall


def test_pq_ann_partition_invariant(spark):
    from b_pdf_parser_spark.operators.similarity import pq_ann_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") % 100 == 0
    a = {(r["query_id"], r["rank"], r["neighbor_id"], r["dist"])
         for r in pq_ann_topk(e, query_pred=pred, k=3).collect()}
    b = {(r["query_id"], r["rank"], r["neighbor_id"], r["dist"])
         for r in pq_ann_topk(e.repartition(17), query_pred=pred, k=3).collect()}
    assert a == b


def test_ivfpq_recall_and_partition_invariance(spark):
    import numpy as np

    from b_pdf_parser_spark.operators.similarity import ivfpq_ann_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    got = ivfpq_ann_topk(e, query_pred=pred, k=3).collect()
    ap = {(r["query_id"], r["neighbor_id"]) for r in got}
    per_q = {}
    for q, _ in ap:
        per_q[q] = per_q.get(q, 0) + 1
    assert set(per_q.values()) == {3}
    rows = sorted(e.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = set()
    for qi, q in zip(ids, X):
        if qi % 50:
            continue
        d = ((X - q) ** 2).sum(1)
        d[ids == qi] = np.inf
        exact |= {(int(qi), int(ids[j])) for j in np.lexsort((ids, d))[:3]}
    recall = len(exact & ap) / len(exact)
    # measured 0.833 (nprobe 6/16 prunes the candidate ceiling; the ADC
    # shortlist + exact rerank recovers everything the probe didn't drop)
    assert recall >= 0.7, recall
    b = {(r["query_id"], r["rank"], r["neighbor_id"], r["dist"])
         for r in ivfpq_ann_topk(e.repartition(19), query_pred=pred, k=3).collect()}
    assert {(r["query_id"], r["rank"], r["neighbor_id"], r["dist"])
            for r in got} == b
