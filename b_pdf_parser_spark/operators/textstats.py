"""Text-analysis operators for training-data pipelines (driver pack).

All pure column expressions (JVM-side, whole-stage codegen — zero Python).
Each formula is written to be *portably* re-expressible in ANSI/DuckDB SQL
so every operator has a DuckDB oracle in ``__spark_entry__.py``:

* token counting   — whitespace tokens + a BPE-ish word/punct regex count
* quality scoring  — stopword ratio, mean word length, punctuation ratio
* language ID      — stopword-vote heuristic with a fixed tie-break order
* fingerprinting   — md5 of whitespace-normalized text

Scale: all of these are map-only (no shuffle); they pipeline into the same
stage as the scan, and columnar parquet scans prune to ``text`` only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = [
    "STOPWORDS",
    "token_count",
    "bpe_ish_count",
    "mean_word_len",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "gopher_rules",
    "fingerprint",
    "langid",
    "unigram_logprob",
    "bm25_topk",
    "with_cc_scrub",
    "bigram_logprob",
    "word_ngrams",
    "intra_doc_repetition",
    "quality_decisions",
    "strip_boilerplate_lines",
    "with_compression_ratio",
    "with_text_stats",
]

# small fixed stopword sets; the langid vote is a heuristic, not a model
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "las", "por"),
    "id": ("yang", "dan", "di", "ke", "itu"),
}
_LANG_ORDER = ("en", "de", "fr", "es", "id")  # deterministic tie-break


def _toks(c: Column) -> Column:
    # lowercased so stopword matching (quality_score/stopword_ratio/langid)
    # is case-insensitive, matching the DuckDB oracles' lower(trim(text));
    # counts and lengths are unaffected by case
    return F.split(F.lower(F.trim(c)), " ")


def token_count(c: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(_toks(c)))


def bpe_ish_count(c: Column) -> Column:
    """BPE-ish token estimate: count of word-runs and single punctuation
    marks (``\\w+|[^\\w\\s]`` occurrences)."""
    return F.regexp_count(c, F.lit(r"\w+|[^\w\s]"))


def mean_word_len(c: Column) -> Column:
    nt = token_count(c)
    return F.when(nt == 0, F.lit(0.0)).otherwise(
        F.round(F.length(F.replace(F.trim(c), F.lit(" "), F.lit(""))) / nt, 4)
    )


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(n_punct / n, 4))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    nt = token_count(c)
    hits = F.size(F.filter(_toks(c), lambda t: t.isin(*STOPWORDS[lang])))
    return F.when(nt == 0, F.lit(0.0)).otherwise(F.round(hits / nt, 4))


def quality_score(c: Column) -> Column:
    """Length/punct/stopword composite in [0,1] — the usual cheap pre-filter
    for web text. Formula mirrored verbatim in the DuckDB oracle."""
    nt = token_count(c)
    swr = F.when(nt == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(_toks(c), lambda t: t.isin(*STOPWORDS["en"]))) / nt
    )
    mwl = F.when(nt == 0, F.lit(0.0)).otherwise(
        F.length(F.replace(F.trim(c), F.lit(" "), F.lit(""))) / nt
    )
    n = F.length(c)
    pr = F.when(n == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) / n
    )
    return F.round(
        F.lit(0.4) * swr + F.lit(0.4) * F.least(mwl / F.lit(8.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - pr),
        4,
    )


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def langid(c: Column) -> Column:
    """Stopword-vote language guess; max votes, ties broken by the fixed
    priority order en > de > fr > es > id; zero votes everywhere → 'und'."""
    def hits(words):
        ws = tuple(words)
        return F.size(F.filter(_toks(c), lambda t: t.isin(*ws)))

    votes = {lang: hits(words) for lang, words in STOPWORDS.items()}
    expr = F.lit("und")
    # build the nested CASE back-to-front: a lang wins if its vote is > 0 and
    # >= every lower-priority lang's vote (earlier langs checked first)
    for i in range(len(_LANG_ORDER) - 1, -1, -1):
        lang = _LANG_ORDER[i]
        cond = votes[lang] > 0
        for later in _LANG_ORDER[i + 1:]:
            cond = cond & (votes[lang] >= votes[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def with_langid(df: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """Two-phase langid: vote columns materialized once, then the CASE reads
    them — avoids the single-Column form's O(langs²) re-evaluation of the
    token filters inside the nested CASE."""
    c = F.col(text_col)

    def hits(words):  # single-arg lambda: PySpark binds extra params to the index
        ws = tuple(words)
        return F.size(F.filter(_toks(c), lambda t: t.isin(*ws)))

    votes = [hits(words).alias(f"_v_{lang}") for lang, words in STOPWORDS.items()]
    tmp = df.select("*", *votes)
    expr = F.lit("und")
    for i in range(len(_LANG_ORDER) - 1, -1, -1):
        lang = _LANG_ORDER[i]
        cond = F.col(f"_v_{lang}") > 0
        for later in _LANG_ORDER[i + 1:]:
            cond = cond & (F.col(f"_v_{lang}") >= F.col(f"_v_{later}"))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return tmp.select(*df.columns, expr.alias(out_col))


def gopher_rules(c: Column) -> Column:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 — public
    heuristics), as one struct of booleans. All pure column expressions:

    * 50 ≤ word count ≤ 100k
    * mean word length in [3, 10]
    * symbol-to-word ratio ≤ 0.1 (# and … as the symbol set)
    * ≥ 80% of words contain at least one alphabetic character
    * stopword hits ≥ 2 (the 'the/and/of/to/a' presence rule)
    """
    toks = _toks(c)
    nt = token_count(c)
    mwl = F.when(nt == 0, F.lit(0.0)).otherwise(
        F.length(F.replace(F.trim(c), F.lit(" "), F.lit(""))) / nt
    )
    n_sym = F.size(F.filter(toks, lambda t: t.rlike("[#…]")))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    return F.struct(
        ((nt >= 50) & (nt <= 100_000)).alias("word_count_ok"),
        ((mwl >= 3.0) & (mwl <= 10.0)).alias("mean_word_len_ok"),
        F.when(nt == 0, F.lit(False)).otherwise(n_sym / nt <= 0.1).alias("symbol_ratio_ok"),
        F.when(nt == 0, F.lit(False)).otherwise(n_alpha / nt >= 0.8).alias("alpha_ratio_ok"),
        (n_stop >= 2).alias("stopwords_ok"),
    )


def gopher_quality_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DataFrame form of :func:`gopher_rules` + the conjunction, as one
    Arrow batch kernel (round-7): every rule is per-document and the old
    column expressions evaluated three interpreted per-token filter
    lambdas per doc. Value-exact twin — same tokenization, unrounded
    mean-word-length bounds, rlike('[#…]') ≡ contains-any, null text →
    all-null rules and null conjunction, exactly like the old
    null-propagating expressions."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    id_ddl = src.schema.fields[0].dataType.simpleString()
    stop = set(STOPWORDS["en"])

    def run(batches):
        sym = set("#…")

        for b in batches:
            rows = {k: [] for k in ("doc_id", "word_count_ok", "mean_word_len_ok",
                                    "symbol_ratio_ok", "alpha_ratio_ok",
                                    "stopwords_ok", "passes")}
            for i, s in zip(b["doc_id"], b["text"]):
                rows["doc_id"].append(i)
                if s is None:
                    for k in ("word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
                              "alpha_ratio_ok", "stopwords_ok", "passes"):
                        rows[k].append(None)
                    continue
                t = s.strip(" ")
                if t == "":
                    nt = 0
                    toks = []
                else:
                    toks = t.lower().split(" ")
                    nt = len(toks)
                wc_ok = 50 <= nt <= 100_000
                if nt == 0:
                    mwl_ok = False  # mwl 0.0 is outside [3, 10]
                    sym_ok = False
                    alpha_ok = False
                else:
                    mwl = len(t.replace(" ", "")) / nt
                    mwl_ok = 3.0 <= mwl <= 10.0
                    n_sym = sum(1 for w in toks if any(c in sym for c in w))
                    sym_ok = n_sym / nt <= 0.1
                    n_alpha = sum(
                        1 for w in toks if any("a" <= c <= "z" for c in w)
                    )
                    alpha_ok = n_alpha / nt >= 0.8
                stop_ok = sum(1 for w in toks if w in stop) >= 2
                rows["word_count_ok"].append(wc_ok)
                rows["mean_word_len_ok"].append(mwl_ok)
                rows["symbol_ratio_ok"].append(sym_ok)
                rows["alpha_ratio_ok"].append(alpha_ok)
                rows["stopwords_ok"].append(stop_ok)
                rows["passes"].append(
                    wc_ok and mwl_ok and sym_ok and alpha_ok and stop_ok
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        run,
        schema=(
            f"doc_id {id_ddl}, word_count_ok boolean, mean_word_len_ok boolean,"
            " symbol_ratio_ok boolean, alpha_ratio_ok boolean,"
            " stopwords_ok boolean, passes boolean"
        ),
    )


def langid_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    out_col: str = "lang_guess",
) -> DataFrame:
    """DataFrame form of :func:`langid` as one Arrow batch kernel
    (round-7): the stopword votes ran five interpreted filter lambdas per
    document. Decision-exact twin of ``with_langid``'s nested CASE: a
    language wins if its vote is > 0 and ≥ every LOWER-priority
    language's vote, checked in the fixed en > de > fr > es > id order;
    zero votes everywhere (or null text) → 'und'."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    id_ddl = src.schema.fields[0].dataType.simpleString()
    stop_sets = {lang: set(words) for lang, words in STOPWORDS.items()}

    def run(batches):
        for b in batches:
            ids, langs = [], []
            for i, s in zip(b["doc_id"], b["text"]):
                ids.append(i)
                if s is None:
                    langs.append("und")
                    continue
                toks = s.strip(" ").lower().split(" ")
                votes = {
                    lang: sum(1 for w in toks if w in ws)
                    for lang, ws in stop_sets.items()
                }
                guess = "und"
                for k, lang in enumerate(_LANG_ORDER):
                    v = votes[lang]
                    if v > 0 and all(
                        v >= votes[later] for later in _LANG_ORDER[k + 1:]
                    ):
                        guess = lang
                        break
                langs.append(guess)
            yield pd.DataFrame({"doc_id": ids, out_col: langs})

    return src.mapInPandas(run, schema=f"doc_id {id_ddl}, {out_col} string")


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log2-probability under the corpus's own
    unigram LM (the CCNet-style perplexity proxy: low bits → repetitive /
    boilerplate, high bits → rare-token noise; the training-mix filter
    keeps the middle band).

    Unlike the column ops above this is a DataFrame op with two shuffles,
    both linear and skew-benign at 10^12 docs:

    1. ``explode → groupBy(token)`` for corpus term frequencies — map-side
       partial aggregation collapses each partition to its distinct tokens
       before the exchange, so the shuffle carries ~|vocab| rows per
       partition, not ~|tokens|;
    2. tokens ⋈ vocab on the token key + ``groupBy(doc)`` — the vocab side
       is Zipf-skewed but the join is a plain equi-join whose hot keys AQE
       splits; the per-doc re-aggregation is again partially aggregated
       map-side.

    The corpus total enters as a broadcast 1-row crossJoin (no driver
    collect). Determinism: count/total is int/int → identical IEEE double;
    log2 agrees between engines (same convention as the entropy oracle);
    the mean is rounded to 4 decimals.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n_total"))
    priced = vocab.crossJoin(F.broadcast(total))
    return (
        toks.join(priced, "tok")
        .groupBy("doc_id")
        .agg(
            F.round(-F.avg(F.log2(F.col("tf") / F.col("n_total"))), 4).alias("nll_bits"),
            F.count("*").alias("n_toks"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    target_pred: Column,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-shaped LM perplexity scoring, the interpolated-BIGRAM form of
    :func:`unigram_logprob`: the LM trains on the TARGET subset (CCNet
    trains on Wikipedia and scores the crawl — ``target_pred`` marks the
    in-domain rows) and every document is scored by its mean negative
    log2-probability under ``p(w2|w1) = λ·c(w1w2)/c(w1·) +
    (1−λ)·(c(w2)+1)/(N+V)`` — maximum-likelihood bigram interpolated with
    an add-one unigram floor, so unseen words and unseen continuations
    stay finite. → (doc_id, n_bigrams, nll_bits); documents with fewer
    than two tokens have no bigrams and are excluded.

    Scale shape: the model side is two map-side-combined aggregations
    over the target subset (distinct bigrams / unigrams — the CCNet LM
    is corpus-vocabulary-sized, not corpus-sized); scoring is equi-joins
    on the gram keys (Zipf-hot keys are AQE-splittable) + one doc-keyed
    partial aggregation. Determinism: counts are integers, the
    interpolation is fixed-expression IEEE arithmetic on identical
    doubles in both engines, and the per-doc mean is rounded to 4
    decimals (the same absorption the unigram oracle has used since
    round 2)."""
    text = F.col(text_col)
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_t"),
        F.explode(word_ngrams(text, 2)).alias("g"),
    ).select(
        "doc_id", "is_t",
        F.split("g", " ").getItem(0).alias("w1"),
        F.split("g", " ").getItem(1).alias("w2"),
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_t"),
        F.explode(F.split(F.lower(F.trim(text)), " ")).alias("tok"),
    )
    big = (
        grams.filter("is_t").groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    w1tot = big.groupBy("w1").agg(F.sum("cb").alias("cw1"))
    uni = (
        toks.filter("is_t").groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    scal = uni.agg(
        F.sum("cu").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    p = (
        F.lit(lam)
        * F.coalesce(F.col("cb") / F.col("cw1"), F.lit(0.0))
        + F.lit(1.0 - lam)
        * (F.coalesce(F.col("cu"), F.lit(0)) + 1)
        / (F.col("n_total") + F.col("v_size"))
    )
    return (
        grams.drop("is_t")
        .join(big, ["w1", "w2"], "left")
        .join(w1tot, "w1", "left")
        .join(uni.withColumnRenamed("tok", "w2"), "w2", "left")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg(F.log2(p)), 4).alias("nll_bits"),
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-``k`` retrieval (Robertson–Spärck Jones, the Lucene
    ``ln(1 + (N−df+0.5)/(df+0.5))`` idf variant) — the retrieval op a
    training-data pipeline runs for benchmark decontamination-by-retrieval
    and nearest-neighbour data selection. ``queries`` is a small
    ``(qid, term)`` relation; every query gets its ``k`` best documents by
    ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))``.

    Scale shape: ``tf`` is the posting list — the broadcast query side
    prunes it to matched terms BEFORE the df/dl joins, so the scored
    relation is |postings of query terms|, not |corpus|; df/avgdl are
    map-side-combined corpus aggregates; the (N, avgdl) scalar frame is
    broadcast; per-query top-k is a window over the tiny scored set.
    Determinism: each per-term contribution is one fixed-shape IEEE
    expression rounded to 9 decimals and cast to DECIMAL(28,9) before the
    per-doc SUM (the [[dsir]] idiom — exact, partition-order-independent),
    and ranking ties break on doc_id. → (qid, rank, doc_id, n_hit, bm25)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_toks(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfs = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    q = queries.select("qid", F.col("term").alias("tok")).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    tfn = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(q), "tok")
        .join(dfs, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            F.round(idf * tfn, 9).cast("decimal(28,9)").alias("c"),
        )
    )
    scores = contrib.groupBy("qid", "doc_id").agg(
        F.count(F.lit(1)).alias("n_hit"), F.sum("c").alias("sc")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sc"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "rank",
            "doc_id",
            "n_hit",
            F.round(F.col("sc").cast("double"), 4).alias("bm25"),
        )
    )


# Luhn mod-10 checksum as a pure Spark-SQL expression over a digit-string
# lambda variable `x` (ISO/IEC 7812 — public): double every 2nd digit from
# the right, subtract 9 when the double exceeds 9, valid iff sum % 10 == 0.
# Integer-only arithmetic → bit-exact in any engine; the DuckDB oracle
# restates the identical formula with list_sum/list_transform.
_LUHN_X = (
    "aggregate(sequence(1, length(x)), 0, (acc, p) -> acc + "
    "(CASE WHEN p % 2 = 0 THEN "
    "CASE WHEN (ascii(substr(reverse(x), p, 1)) - 48) * 2 > 9 "
    "THEN (ascii(substr(reverse(x), p, 1)) - 48) * 2 - 9 "
    "ELSE (ascii(substr(reverse(x), p, 1)) - 48) * 2 END "
    "ELSE ascii(substr(reverse(x), p, 1)) - 48 END)) % 10 = 0"
)


def with_cc_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Credit-card scrubbing with LUHN VALIDATION — the precision step a
    real PII pass needs: a 13–19-digit run is only a card number if its
    mod-10 checksum holds, so order ids, tracking numbers and timestamps
    survive while genuine PANs redact. Appends ``n_candidates`` (digit
    runs seen), ``n_valid`` (Luhn-passing) and ``scrubbed`` (only the
    valid ones replaced by ``<CC>``). Entirely relational — the candidate
    extraction, the checksum fold and the replacement fold are codegen'd
    higher-order expressions, no UDF, no shuffle."""
    out = (
        df.withColumn(
            "_cands",
            F.expr(
                f"regexp_extract_all({text_col},"
                " '\\\\b\\\\d{13,19}\\\\b', 0)"
            ),
        )
        .withColumn("_valid", F.expr(f"filter(_cands, x -> {_LUHN_X})"))
    )
    return out.select(
        *df.columns,
        F.size("_cands").alias("n_candidates"),
        F.size("_valid").alias("n_valid"),
        # boundary-anchored per-candidate replace: a bare replace() would
        # also rewrite the same digits INSIDE a longer (non-candidate or
        # invalid) run — '...9<PAN>9...' must survive intact
        F.expr(
            f"aggregate(_valid, {text_col}, (acc, x) ->"
            " regexp_replace(acc, concat('\\\\b', x, '\\\\b'), '<CC>'))"
        ).alias("scrubbed"),
    )


def word_ngrams(c: Column, n: int) -> Column:
    """Array of word ``n``-grams of the lowercased text — a map-only array
    expression (no explode/shuffle at this stage). Empty array for texts
    with fewer than ``n`` tokens (``sequence`` would otherwise count
    backwards and fabricate grams)."""
    toks = _toks(c)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def intra_doc_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style *repetition* signals (Rae et al. 2021 §A1.1 — the other
    half of the quality rules, which ``gopher_rules`` doesn't cover): per
    document,

    * ``top_2gram_frac`` — fraction of all word 2-gram instances taken by
      the single most frequent 2-gram (Gopher drops docs > 0.2), and
    * ``dup_3gram_frac`` — fraction of 3-gram instances whose gram occurs
      more than once in the document (Gopher's duplicate-n-gram family).

    Documents with fewer than 3 tokens have no 3-grams and are dropped.

    Scale shape (round-7): both signals are PER-DOCUMENT, so the whole
    operator is one Arrow batch kernel — map-only, zero Exchanges (the old
    plan paid two (doc, gram) groupBys + two (doc) groupBys + a join, and
    its ``word_ngrams`` lambda evaluated interpreted). The fractions stay
    unrounded int/int IEEE doubles (Python and JVM divide identical exact
    integers), so the DuckDB oracle remains bit-identical.
    """
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    id_ddl = src.schema.fields[0].dataType.simpleString()

    def run(batches):
        from collections import Counter

        for b in batches:
            ids, t2s, d3s = [], [], []
            for i, s in zip(b["doc_id"], b["text"]):
                if s is None:
                    continue
                ws = s.strip(" ").lower().split(" ")
                if len(ws) < 3:
                    continue
                c2 = Counter(" ".join(ws[p:p + 2]) for p in range(len(ws) - 1))
                c3 = Counter(" ".join(ws[p:p + 3]) for p in range(len(ws) - 2))
                n2 = len(ws) - 1
                n3 = len(ws) - 2
                ids.append(i)
                t2s.append(max(c2.values()) / n2)
                d3s.append(sum(c for c in c3.values() if c >= 2) / n3)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "top_2gram_frac": t2s, "dup_3gram_frac": d3s}
                )

    return src.mapInPandas(
        run,
        schema=f"doc_id {id_ddl}, top_2gram_frac double, dup_3gram_frac double",
    )


def quality_decisions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_tokens: int = 30, top2_max: float = 0.06,
) -> DataFrame:
    """Fused keep/drop verdict per document with the *first failing rule* as
    the reason — the auditable filter-decision table a production corpus
    pipeline materializes next to the data (so every dropped doc can answer
    "why"). Rules, in order:

    1. ``word_count``     — fewer than ``min_tokens`` tokens
    2. ``mean_word_len``  — mean word length outside [3, 10]
    3. ``repetition``     — top 2-gram fraction > ``top2_max`` (Gopher-style)
    4. ``stopwords``      — fewer than 2 English stopword hits
    5. ``ok``             — keep

    Round-7: every rule is per-document, so the whole decision table is
    one Arrow batch kernel — map-only, zero Exchanges (the old plan paid a
    (doc, gram) groupBy + (doc) groupBy + join for the repetition signal,
    and its token filters evaluated interpreted). The kernel is a
    value-exact twin of the old expressions: same tokenization, Spark's
    HALF_UP round for ``mean_word_len`` (``Decimal(repr(x))`` matches the
    JVM's shortest-decimal double conversion), identical null fall-through
    (a null text satisfies no rule and lands on 'ok'). The CASE is
    mirrored verbatim in the DuckDB oracle, which stays the referee.
    """
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    id_ddl = src.schema.fields[0].dataType.simpleString()
    stop = set(STOPWORDS["en"])

    def run(batches):
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        q4 = Decimal("0.0001")

        def reason_for(s):
            if s is None:
                return "ok"  # every rule's condition is null → fall through
            t = s.strip(" ")
            nt = 0 if t == "" else len(t.split(" "))
            if nt < min_tokens:
                return "word_count"
            toks = t.lower().split(" ")
            chars = len(t.replace(" ", ""))
            mwl = float(
                Decimal(repr(chars / nt)).quantize(q4, rounding=ROUND_HALF_UP)
            )
            if mwl < 3.0 or mwl > 10.0:
                return "mean_word_len"
            if nt >= 2:
                c2 = Counter(
                    toks[p] + " " + toks[p + 1] for p in range(nt - 1)
                )
                if max(c2.values()) / (nt - 1) > top2_max:
                    return "repetition"
            if sum(1 for w in toks if w in stop) < 2:
                return "stopwords"
            return "ok"

        for b in batches:
            reasons = [reason_for(s) for s in b["text"]]
            yield pd.DataFrame({
                "doc_id": list(b["doc_id"]),
                "keep": [r == "ok" for r in reasons],
                "reason": reasons,
            })

    out = src.mapInPandas(
        run, schema=f"doc_id {id_ddl}, keep boolean, reason string"
    )
    return out.withColumnRenamed("doc_id", id_col) if id_col != "doc_id" else out


def strip_boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str,
    min_docs: int = 3, min_len: int = 20,
) -> DataFrame:
    """Boilerplate line REMOVAL — the C4 cleanup rule (Raffel et al. 2020
    §2.2 dropped lines occurring ≥3 times in the corpus): sentences shared
    by ≥ ``min_docs`` distinct documents are cut from every document, and
    the text is rebuilt in original order. The detector twin is
    ``q_repeated_lines``; this is the operator that acts on its signal.

    Returns (doc_id, clean_text, n_lines, n_dropped). ``clean_text`` joins
    surviving sentences with ``". "`` — a normalized (not byte-preserving)
    reconstruction, deterministic across engines and cluster sizes.

    Scale shape: one explode, one hash groupBy on the trimmed line (map-side
    combined — the count-distinct is over doc ids per line), one hash join
    back, one per-doc re-aggregation. All linear; the hot key (a footer
    shared by 10^9 pages) is a build-side key AQE splits.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\.\s+")).alias("pos", "line"),
    ).withColumn("tline", F.trim("line"))
    lines = lines.localCheckpoint(eager=False)  # reused: bp build + probe
    boiler = (
        lines.filter(F.length("tline") >= min_len)
        .groupBy("tline")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("tline", F.lit(True).alias("bp"))
    )
    marked = lines.join(boiler, "tline", "left")
    kept = F.array_sort(
        F.collect_list(F.when(F.col("bp").isNull(), F.struct("pos", "line")))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(kept, lambda s: s["line"]), ". "
            ).alias("clean_text"),
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("bp"), 1).otherwise(0)).alias("n_dropped"),
        )
    )


def with_compression_ratio(
    df: DataFrame, text_col: str = "text", out_col: str = "zlib_ratio", level: int = 6
) -> DataFrame:
    """zlib compressed-size / raw-size per document — the redundancy signal
    RefinedWeb/MassiveText use to catch machine-generated or template text
    (which compresses far below natural language's ~0.3–0.5 band).

    No SQL engine exposes zlib, so this is the one textstats op without a
    DuckDB oracle; it is instead pinned by a unit test against direct
    ``zlib.compress`` on the same strings. Runs as an Arrow-batched
    ``mapInPandas`` (one Python dispatch per batch; zlib itself is C), and
    the compression level is pinned so results are reproducible across
    runs and cluster sizes. Empty/null text → ratio 0.0.
    """
    import zlib

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType())])

    def ratios(batches):
        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            comp = raw.map(lambda b: float(len(zlib.compress(b, level))))
            n = raw.str.len().astype("float64")
            pdf[out_col] = (comp / n.where(n > 0, 1.0)).where(n > 0, 0.0)
            yield pdf

    return df.mapInPandas(ratios, schema=out_schema)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_count(c).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars_calc"),
        mean_word_len(c).alias("mean_word_len"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
        langid(c).alias("lang_guess"),
    )
