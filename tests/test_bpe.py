"""BPE trainer/encoder: hand-computed merges (the Sennrich-paper-style
example), determinism, leftmost-vs-merge-all encode equivalence, and the
Spark operator against the pure-Python core."""

import random
import re

import pytest

from b_pdf_parser_spark.functions.bpe import (
    WORD_PATTERN,
    encode_text,
    encode_word,
    merge_ranks,
    train_bpe,
)


def test_train_hand_computed():
    # counts verifiable by hand: low:5 lower:2 newest:6 widest:3
    # step 1: (e,s)=9 ties (s,t)=9 -> lexicographic min (e,s)
    # step 2: (es,t)=9 beats (w,e)=8, (l,o)=(o,w)=7
    # step 3: max is 7, tie (l,o)/(o,w) -> (l,o)
    # step 4: (lo,w)=7 beats (n,e)=(e,w)=(w,est)=6
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(counts, 4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_encode_hand_computed():
    merges = [("e", "s"), ("es", "t"), ("w", "est"), ("l", "o")]
    ranks = merge_ranks(merges)
    assert encode_word("newest", ranks) == ["n", "e", "west"]
    assert encode_word("lowest", ranks) == ["lo", "west"]
    assert encode_word("low", ranks) == ["lo", "w"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]
    assert encode_word("", ranks) == []


def _encode_merge_all(word, merges):
    """Independent textbook implementation: apply each learned merge to
    ALL its occurrences, in rank order re-evaluated each step."""
    ranks = merge_ranks(merges)
    syms = list(word)
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        present = [p for p in pairs if p in ranks]
        if not present:
            break
        a, b = min(present, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_leftmost_equals_merge_all_randomized():
    # the equivalence the DuckDB oracle's one-merge-per-recursion-step
    # encode relies on (module docstring proof) — exercised on adversarial
    # alphabets where overlapping pairs (aaa...) actually occur
    rng = random.Random(7)
    for trial in range(200):
        alphabet = "ab" if trial % 2 else "abc"
        words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
                 for _ in range(30)]
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + rng.randint(1, 5)
        merges = train_bpe(counts, rng.randint(1, 12))
        ranks = merge_ranks(merges)
        probe = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        assert encode_word(probe, ranks) == _encode_merge_all(probe, merges), (
            probe, merges)


def test_train_deterministic_and_early_stop():
    counts = {"ab": 1, "cd": 1}  # every pair count == 1 -> nothing to learn
    assert train_bpe(counts, 10) == []
    counts = {"aaaa": 3}
    m = train_bpe(counts, 100)  # must stop, not loop, when words exhaust
    assert m == train_bpe(dict(counts), 100)
    ranks = merge_ranks(m)
    assert len(encode_word("aaaa", ranks)) == 1


def test_encode_text_order_and_cache():
    merges = [("t", "h"), ("th", "e")]
    ranks = merge_ranks(merges)
    cache = {}
    toks = encode_text("the theory, then 42!", ranks, cache=cache)
    assert toks == ["the", "the", "o", "r", "y", "the", "n", "4", "2"]
    assert set(cache) == {"the", "theory", "then", "42"}
    assert re.findall(WORD_PATTERN, "a-b c1") == ["a", "b", "c", "1"]


def test_spark_operator_matches_core(spark):
    import pyspark.sql.functions as F

    from b_pdf_parser_spark.operators.bpe import bpe_tokenize, train_bpe_on

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe_on(d, "text", n_merges=30)
    assert merges  # the 31-word corpus must yield real merges
    got = {
        r["doc_id"]: (r["n_tokens"], list(r["tokens"])[:6])
        for r in bpe_tokenize(d, "text", merges).limit(50).collect()
    }
    ranks = merge_ranks(merges)
    rows = {r["doc_id"]: r["text"] for r in d.limit(50).collect()}
    for doc_id, text in rows.items():
        want = encode_text(text, ranks)
        assert got[doc_id][0] == len(want)
        assert got[doc_id][1] == want[:6]


def test_train_bpe_on_matches_duckdb_counts(spark):
    # the Spark word-count path and an independent DuckDB count must feed
    # the trainer identical tables (this is what makes the driver oracle's
    # embedded merge literals a real cross-check of the Spark counts)
    import duckdb

    from b_pdf_parser_spark.operators.bpe import train_bpe_on

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    merges_spark = train_bpe_on(d, "text", n_merges=40)
    wc = duckdb.connect().execute(
        f"""WITH w AS (SELECT unnest(regexp_extract_all(text, '{WORD_PATTERN}')) AS word
                       FROM read_parquet('{sf}/documents.parquet'))
            SELECT word, count(*) c FROM w GROUP BY 1
            ORDER BY c DESC, word LIMIT 5000"""
    ).fetchall()
    merges_duck = train_bpe({w: c for w, c in wc}, 40)
    assert merges_spark == merges_duck
