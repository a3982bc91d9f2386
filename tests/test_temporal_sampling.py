"""Unit tests for the as-of join, deterministic sampling, incremental dedup
and unigram-logprob operators (semantics beyond the DuckDB oracle parity,
which tests/test_entry_oracle.py covers)."""

import datetime as dt

import pytest
import pyspark.sql.functions as F

from b_pdf_parser_spark.operators.dedup import incremental_dedup
from b_pdf_parser_spark.operators.sampling import (
    hash_sample,
    hash_threshold,
    stratified_sample,
)
from b_pdf_parser_spark.operators.temporal import asof_join
from b_pdf_parser_spark.operators.textstats import bigram_logprob, unigram_logprob


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05")),  # between r1 and r2 → r1
            (2, 10, _ts("2024-01-10")),  # exactly at r2 → inclusive
            (3, 10, _ts("2024-01-01")),  # before everything → NULL
            (4, 20, _ts("2024-06-01")),  # other key
            (5, 30, _ts("2024-06-01")),  # key with no right rows → NULL
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-02"), 100),
            (10, _ts("2024-01-10"), 200),
            (10, _ts("2024-01-10"), 150),  # same-ts dup → max payload wins
            (20, _ts("2024-05-31"), 300),
        ],
        "k long, rts timestamp, val long",
    )
    return left, right


def test_asof_backward_inclusive(asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, left_on="k", right_on="k", left_ts="ts", right_ts="rts",
        payload={"val": "last_val"},
    )
    got = {r.event_id: r.last_val for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None, 4: 300, 5: None}


def test_asof_keeps_all_left_rows_and_columns(asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, left_on="k", right_on="k", left_ts="ts", right_ts="rts",
        payload={"val": "last_val"},
    )
    assert out.count() == left.count()
    assert out.columns == ["event_id", "k", "ts", "last_val"]


def test_asof_plan_has_single_exchange_no_cartesian(asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, left_on="k", right_on="k", left_ts="ts", right_ts="rts",
        payload={"val": "last_val"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # the union feeds ONE window exchange on _k (plus the small right-side
    # pre-aggregation); no per-row replication anywhere
    assert "Window" in plan


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_hash_threshold_values():
    assert hash_threshold(0.0) == "00000000"
    assert hash_threshold(0.25) == "40000000"
    assert hash_threshold(0.5) == "80000000"
    assert hash_threshold(1.0) == "ffffffff"
    with pytest.raises(ValueError):
        hash_threshold(1.5)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("stratum"),
    )


def test_hash_sample_rate_and_determinism(ids_df):
    kept = hash_sample(ids_df, "doc_id", 0.25)
    n = kept.count()
    assert abs(n / 4000 - 0.25) < 0.05  # uniform hash → close to rate
    # re-running with a different partitioning yields the identical set
    again = hash_sample(ids_df.repartition(13), "doc_id", 0.25)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_hash_sample_monotone_rates(ids_df):
    low = {r.doc_id for r in hash_sample(ids_df, "doc_id", 0.1).collect()}
    high = {r.doc_id for r in hash_sample(ids_df, "doc_id", 0.4).collect()}
    assert low <= high  # upsampling only ADDS rows


def test_stratified_rates_apply_per_stratum(ids_df):
    kept = stratified_sample(
        ids_df, "doc_id", "stratum", {"0": 0.8, "1": 0.2}, default_rate=0.0
    )
    by = {r.stratum: r.n for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert by.get("2") is None  # default 0 drops the unlisted stratum
    assert abs(by["0"] / 1334 - 0.8) < 0.1
    assert abs(by["1"] / 1333 - 0.2) < 0.1


# ---------------------------------------------------------------------------
# incremental dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_semantics(spark):
    base = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    inc = spark.createDataFrame(
        [
            (10, "alpha"),   # already in base → dropped
            (11, "gamma"),   # new → kept with min id
            (12, "gamma"),   # dup within batch → collapsed into 11
            (13, "delta"),   # new → kept
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup(base, inc, "doc_id", "text")
    assert sorted(r.keep_id for r in out.collect()) == [11, 13]


def test_incremental_dedup_empty_base(spark):
    base = spark.createDataFrame([], "doc_id long, text string")
    inc = spark.createDataFrame([(5, "x"), (6, "x")], "doc_id long, text string")
    out = incremental_dedup(base, inc, "doc_id", "text")
    assert [r.keep_id for r in out.collect()] == [5]


# ---------------------------------------------------------------------------
# unigram logprob
# ---------------------------------------------------------------------------


def test_unigram_logprob_uniform_corpus(spark):
    # 4 equally-frequent tokens → every doc's mean NLL is exactly 2 bits
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.nll_bits, r.n_toks) for r in unigram_logprob(df).collect()}
    assert out == {1: (2.0, 2), 2: (2.0, 2)}


def test_unigram_logprob_rare_tokens_score_higher(spark):
    df = spark.createDataFrame(
        [(1, "the the the the"), (2, "zyzzyva the")], "doc_id long, text string"
    )
    out = {r.doc_id: r.nll_bits for r in unigram_logprob(df).collect()}
    assert out[2] > out[1]  # rare token → more surprising document


def test_bigram_logprob_hand_computed(spark):
    # target corpus is one doc "a a a a": the only bigram (a,a) has
    # p = 0.7*(3/3) + 0.3*(4+1)/(4+1) = 1.0 → target doc scores exactly 0;
    # the out-of-domain doc "b b" sees only the add-one unigram floor,
    # p = 0.3 * (0+1)/(4+1) = 0.06 → -log2 ≈ 4.0589
    df = spark.createDataFrame(
        [(1, True, "a a a a"), (2, False, "b b"), (3, False, "a")],
        "doc_id long, is_t boolean, text string",
    )
    out = {
        r.doc_id: (r.n_bigrams, r.nll_bits)
        for r in bigram_logprob(df, F.col("is_t")).collect()
    }
    assert out[1] == (3, 0.0)
    assert out[2] == (1, 4.0589)
    assert 3 not in out  # single-token doc has no bigrams → excluded


def test_bigram_logprob_unseen_continuation_finite(spark):
    # w1 seen in-domain but the (w1, w2) continuation unseen: the bigram
    # term is zero and only the unigram floor carries — finite, and more
    # surprising than the attested continuation
    df = spark.createDataFrame(
        [(1, True, "a b a b"), (2, False, "a b"), (3, False, "a z")],
        "doc_id long, is_t boolean, text string",
    )
    out = {r.doc_id: r.nll_bits for r in bigram_logprob(df, F.col("is_t")).collect()}
    assert all(v == v and v != float("inf") for v in out.values())
    assert out[3] > out[2]


def test_bm25_topk_hand_computed(spark):
    import math

    from b_pdf_parser_spark.operators.textstats import bm25_topk

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a a"), (3, "c")], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(0, "a"), (0, "c")], "qid long, term string")
    out = [
        (r.rank, r.doc_id, r.n_hit, r.bm25)
        for r in bm25_topk(docs, qs, k=3).orderBy("rank").collect()
    ]

    def score(tf, dl, df, n=3, avgdl=5 / 3, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return round(idf * (tf * 2.2) / (tf + k1 * (0.25 + b * (dl / avgdl))), 4)

    # doc 3 matches the rarer term 'c' (idf ln(8/3)) and is short → wins;
    # doc 2 beats doc 1 on tf of 'a'
    assert out == [
        (1, 3, 1, score(1, 1, 1)),
        (2, 2, 1, score(2, 2, 2)),
        (3, 1, 1, score(1, 2, 2)),
    ]


def test_cc_luhn_scrub_validates_checksum(spark):
    from b_pdf_parser_spark.operators.textstats import with_cc_scrub

    df = spark.createDataFrame(
        [(1, "pay 4539148803436467 or 4539148803436462 now"),
         (2, "order 12345 plain")],
        "id long, text string",
    )
    out = {r.id: r for r in with_cc_scrub(df).collect()}
    # the first number is a genuinely Luhn-valid PAN, the second differs
    # only in the check digit — candidates 2, valid 1, only the real one
    # redacts; short digit runs are never candidates
    assert (out[1].n_candidates, out[1].n_valid) == (2, 1)
    assert out[1].scrubbed == "pay <CC> or 4539148803436462 now"
    assert (out[2].n_candidates, out[2].n_valid) == (0, 0)


def test_per_host_cap_exact_and_partitioning_independent(spark):
    from b_pdf_parser_spark.operators.sampling import per_host_cap

    rows = [(i, f"host{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = per_host_cap(df, "doc_id", "host", cap=4).collect()
    kept = [r for r in out if r["keep"]]
    assert len(out) == 30
    by_host = {}
    for r in kept:
        by_host.setdefault(r["host"], set()).add(r["doc_id"])
    assert all(len(v) == 4 for v in by_host.values())
    # the SAME docs survive under a different partitioning (determinism —
    # the property df.sample() does not have)
    again = {(r["doc_id"], r["keep"])
             for r in per_host_cap(df.repartition(7), "doc_id", "host", 4).collect()}
    assert again == {(r["doc_id"], r["keep"]) for r in out}


def test_quality_decisions_every_reason_reachable(spark):
    from b_pdf_parser_spark.operators.textstats import quality_decisions

    ok = "the cat and the dog ran off to a barn with hay and corn for all of them " \
         "so they could rest and eat well " * 2
    docs = [
        (1, "too short"),                                     # word_count
        (2, " ".join(["supercalifragilistic"] * 40)),         # mean_word_len (>10)
        (3, " ".join(["alpha beta"] * 40)),                   # repetition (top2 ≫ 6%)
        (4, " ".join(f"word{i}" for i in range(40))),         # stopwords (no hits)
        (5, ok),                                              # ok
        (6, ""),                                              # empty → word_count
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in quality_decisions(df).collect()}
    assert got[1] == (False, "word_count")
    assert got[2] == (False, "mean_word_len")
    assert got[3] == (False, "repetition")
    assert got[4] == (False, "stopwords")
    assert got[5] == (True, "ok")
    assert got[6] == (False, "word_count")


def test_token_shards_offsets_and_budget(spark):
    from b_pdf_parser_spark.operators.sampling import token_shards

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i))) for i in range(40)],
        "doc_id long, text string",
    )
    out = token_shards(docs, "doc_id", "text", tokens_per_shard=100).collect()
    assert len(out) == 40
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["n_toks"])
    # every shard except possibly the last starts within budget: a doc's
    # start offset is < (shard+1)*budget by construction, and shard ids
    # form a contiguous range from 0
    assert min(by_shard) == 0 and set(by_shard) == set(range(len(by_shard)))
    # determinism under repartition (hash-ordered layout, integer sums)
    again = {(r["doc_id"], r["shard"])
             for r in token_shards(docs.repartition(7), "doc_id", "text", 100).collect()}
    assert again == {(r["doc_id"], r["shard"]) for r in out}


def test_per_host_cap_threshold_matches_exact_under_cap(spark):
    # hosts at or under the cap keep everything — identical to the window
    # form; the windowless variant must not drop anything there
    from b_pdf_parser_spark.operators.sampling import (per_host_cap,
                                                       per_host_cap_threshold)

    rows = [(i, f"host{i % 5}") for i in range(15)]  # 3 per host, cap 4
    df = spark.createDataFrame(rows, "doc_id long, host string")
    thr = {(r["doc_id"], r["keep"])
           for r in per_host_cap_threshold(df, "doc_id", "host", 4).collect()}
    exact = {(r["doc_id"], r["keep"])
             for r in per_host_cap(df, "doc_id", "host", 4).collect()}
    assert thr == exact
    assert all(k for _, k in thr)


def test_per_host_cap_threshold_megahost_approx_and_deterministic(spark):
    from b_pdf_parser_spark.operators.sampling import per_host_cap_threshold

    # one 4000-row "mega host" + a tiny host; cap 40 → expect ~40 ± binomial
    rows = [(i, "mega") for i in range(4000)] + [(9990 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = per_host_cap_threshold(df, "doc_id", "host", 40).collect()
    kept_mega = [r["doc_id"] for r in out if r["host"] == "mega" and r["keep"]]
    assert 20 <= len(kept_mega) <= 60  # ±>3σ of Binomial(4000, 0.01)
    assert all(r["keep"] for r in out if r["host"] == "tiny")
    # partitioning-independent: identical keeps on a different layout
    again = {(r["doc_id"], r["keep"])
             for r in per_host_cap_threshold(df.repartition(13), "doc_id", "host", 40).collect()}
    assert again == {(r["doc_id"], r["keep"]) for r in out}


def test_token_shards_bucketed_matches_global_within_bucket(spark):
    # within one bucket the two-level packing IS the global packing of that
    # bucket's docs: sizes ≈ tokens_per_shard, order is the md5 layout
    from b_pdf_parser_spark.operators.sampling import (token_shards,
                                                       token_shards_bucketed)

    rows = [(i, " ".join(f"w{j}" for j in range(1 + i % 20))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_shards_bucketed(df, "doc_id", "text", 50).collect()
    assert len(out) == 300
    assert {r["bucket"] for r in out} <= set("0123456789abcdef")
    # per-bucket running sums: every shard except a bucket's last must have
    # total tokens in [tokens_per_shard - max_doc, tokens_per_shard + max_doc)
    from collections import defaultdict
    by_bucket = defaultdict(list)
    for r in out:
        by_bucket[r["bucket"]].append(r)
    for bucket, rs in by_bucket.items():
        tot = defaultdict(int)
        for r in rs:
            tot[r["shard"]] += r["n_toks"]
        shards = sorted(tot)
        assert shards == list(range(len(shards))), f"bucket {bucket}: gap in shard ids"
        for s in shards[:-1]:
            assert tot[s] >= 50 - 20, f"bucket {bucket} shard {s} underfull mid-stream"
    # determinism across partitioning
    again = {(r["doc_id"], r["bucket"], r["shard"])
             for r in token_shards_bucketed(df.repartition(11), "doc_id", "text", 50).collect()}
    assert again == {(r["doc_id"], r["bucket"], r["shard"]) for r in out}
    # global single-level form still packs the identical doc universe
    assert {r["doc_id"] for r in token_shards(df, "doc_id", "text", 50).collect()} == {
        r["doc_id"] for r in out
    }


def test_temperature_mix_properties(spark):
    # strata with a 20:4:1 imbalance
    rows = ([("en", i) for i in range(400)] + [("de", i + 1000) for i in range(80)]
            + [("id", i + 2000) for i in range(20)])
    df = spark.createDataFrame(
        [(d, l) for l, d in rows], "doc_id long, lang string"
    )
    from b_pdf_parser_spark.operators.sampling import temperature_mix

    def kept(t):
        return {r["doc_id"] for r in temperature_mix(df, "doc_id", "lang", t).collect()}

    def by_lang(ids):
        en = sum(1 for i in ids if i < 1000)
        de = sum(1 for i in ids if 1000 <= i < 2000)
        other = sum(1 for i in ids if i >= 2000)
        return en, de, other

    # T=1: natural proportions — everything kept at target_max_rate=1.0
    assert kept(1.0) == {d for _, d in rows}
    # T>1 flattens: the smallest stratum keeps everything, the head is
    # downsampled, and the kept head/tail ratio shrinks below the raw 20:1
    k2 = kept(2.0)
    en2, de2, id2 = by_lang(k2)
    assert id2 == 20 and en2 < 400
    assert en2 / max(id2, 1) < 400 / 20
    # raising T only REMOVES docs (monotone hash thresholds): kept(4) ⊆ kept(2)
    k4 = kept(4.0)
    assert k4 <= k2
    en4, de4, id4 = by_lang(k4)
    assert id4 == 20 and en4 <= en2
    # T→∞ limit direction: per-stratum kept counts approach each other
    assert (en4 - id4) < (en2 - id2)
    # determinism across partitioning
    assert kept(2.0) == {
        r["doc_id"]
        for r in temperature_mix(df.repartition(13), "doc_id", "lang", 2.0).collect()
    }


def test_chunk_documents_overlap_and_coverage(spark):
    from b_pdf_parser_spark.operators.sampling import chunk_documents

    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "short doc"), (3, "  ")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", tokens_per_chunk=64, stride=48)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: starts 0,48,96,144 → 4 chunks; sizes 64,64,54,6
    sizes = [rows[(1, c)]["n_chunk_toks"] for c in range(4)]
    assert sizes == [64, 64, 54, 6]
    # overlap: the last 16 tokens of chunk 0 are the first 16 of chunk 1
    c0 = rows[(1, 0)]["chunk_text"].split(" ")
    c1 = rows[(1, 1)]["chunk_text"].split(" ")
    assert c0[48:] == c1[:16]
    # full coverage in order: stitching at stride boundaries rebuilds the doc
    stitched = c0[:48] + c1[:48] + rows[(1, 2)]["chunk_text"].split(" ")[:48] \
        + rows[(1, 3)]["chunk_text"].split(" ")
    assert stitched == text.split(" ")
    # short doc → one chunk, whole text; whitespace-only doc → dropped
    assert rows[(2, 0)]["chunk_text"] == "short doc"
    assert not any(d == 3 for d, _ in rows)


def test_dsir_select_semantics_and_partition_invariance(spark):
    from b_pdf_parser_spark.operators.dsir import dsir_select

    # two vocabularies: target-domain docs talk about "spark sql engine",
    # off-domain docs about "cats dogs birds"; a mixed doc sits between
    rows = []
    for i in range(30):
        rows.append((i, "spark sql engine query plan spark sql", "en"))
    for i in range(30, 60):
        rows.append((i, "cats dogs birds fish cats dogs", "de"))
    rows.append((60, "spark sql cats dogs", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    out = dsir_select(df, F.col("lang") == "en", k=35).collect()
    assert len(out) == 35
    got = {r["doc_id"]: r for r in out}
    # importance weights must separate the domains: every target-vocab doc
    # outranks every off-domain doc in logw (Gumbel noise can reorder the
    # SELECTION, logw itself is noise-free)
    en_logw = min(r["logw"] for i, r in got.items() if i < 30)
    de_logw = max(r["logw"] for i, r in got.items() if 30 <= i < 60)
    if any(30 <= i < 60 for i in got):
        assert en_logw > de_logw
    # the mixed doc sits strictly between the two pure vocab weights
    full = {r["doc_id"]: r["logw"]
            for r in dsir_select(df, F.col("lang") == "en", k=61).collect()}
    assert full[0] > full[60] > full[59]
    # partition invariance: decimal-summed weights and md5 Gumbel noise
    # must make the SELECTED SET identical under any repartitioning
    out13 = dsir_select(df.repartition(13), F.col("lang") == "en", k=35).collect()
    assert {(r["doc_id"], r["score"]) for r in out} == \
        {(r["doc_id"], r["score"]) for r in out13}


def test_cc_scrub_does_not_rewrite_digits_inside_longer_runs(spark):
    from b_pdf_parser_spark.operators.textstats import with_cc_scrub

    # the valid PAN appears standalone AND embedded in a 20-digit
    # reference that is not even a candidate — only the standalone
    # occurrence may redact
    df = spark.createDataFrame(
        [(1, "pay 4539148803436467 ref 94539148803436467919 end")],
        "id long, text string",
    )
    r = with_cc_scrub(df).first()
    assert (r.n_candidates, r.n_valid) == (1, 1)
    assert r.scrubbed == "pay <CC> ref 94539148803436467919 end"
