"""URL canonicalization unit tests (oracle parity for `canonical_urls` is in
tests/test_entry_oracle.py)."""

import pyspark.sql.functions as F

from b_pdf_parser_spark.functions.urls import canonical_url, url_host

CASES = [
    ("HTTP://Host.Example:80/path#frag", "http://host.example/path"),
    ("https://x.example:443/?q=1#a", "https://x.example/?q=1"),
    ("https://x.example:8443/p", "https://x.example:8443/p"),  # non-default port kept
    ("http://x.example:8080/", "http://x.example:8080/"),
    ("https://X.example", "https://x.example/"),               # root path added
    ("ftp://Files.Example:21/pub", "ftp://files.example:21/pub"),  # unknown default kept
    ("  https://pad.example/a  ", "https://pad.example/a"),    # trimmed
    ("not a url", "not a url"),                                # opaque passthrough
    ("", ""),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    got = [r.c for r in df.select(canonical_url(F.col("raw")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_url_host(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Example:8443/p?q#f",), ("nope",)], "raw string"
    )
    got = [r.h for r in df.select(url_host(F.col("raw")).alias("h")).collect()]
    assert got == ["www.example:8443", ""]


def test_canonicalization_is_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    once = df.select(canonical_url(F.col("raw")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]
