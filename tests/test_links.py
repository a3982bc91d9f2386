"""Outlink harvesting: byte-level href walk edge cases + the host-degree
roll-up. (Value-level oracle parity for `outlinks`/`link_hosts` is covered
by tests/test_entry_oracle.py.)"""

from b_pdf_parser_spark.htmlmodel import extract_links

MESSY = b"""<html><body>
<a href="https://x.example/a">First &amp; best</a>
<a href='https://y.example/b?q=1'>two<b>bold</b></a>
<a href=https://z.example/c>bare</a>
<a name="noref">no href</a>
<abbr>not a link</abbr>
<!-- <a href="https://commented.example/">out</a> -->
<a href="https://t.example/d">unclosed anchor text"""


def test_extract_links_edge_cases():
    links = extract_links(MESSY)
    assert [l["href"] for l in links] == [
        "https://x.example/a",
        "https://y.example/b?q=1",
        "https://z.example/c",
        "https://commented.example/",  # commented markup is still bytes to a
        "https://t.example/d",         # frontier builder; droppable downstream
    ]
    by = {l["href"]: l["anchor"] for l in links}
    assert by["https://x.example/a"] == "First & best"   # entity decoded
    assert by["https://y.example/b?q=1"] == "two bold"   # inner tags stripped
    assert by["https://t.example/d"] == "unclosed anchor text"


def test_extract_links_empty_and_binary():
    assert extract_links(b"") == []
    assert extract_links(b"no markup at all") == []
    assert extract_links(b"\xff\xfe<\x00a\x00 \x00h\x00r\x00e\x00f\x00=\x00x\x00>\x00") != []


def test_host_degrees(spark):
    from b_pdf_parser_spark.operators.links import (
        extract_outlinks,
        host_degrees,
        synth_linkdoc_df,
    )

    edges = extract_outlinks(synth_linkdoc_df(spark, 40, num_partitions=4))
    # sum over i<40 of i%5 = 8 * (0+1+2+3+4)
    assert edges.count() == 80
    hosts = {r.host: (r.n_inlinks, r.n_docs) for r in host_degrees(edges).collect()}
    assert all(h.startswith("host") and h.endswith(".example") for h in hosts)
    assert sum(n for n, _ in hosts.values()) == 80
    # every host's distinct-doc count is bounded by its inlink count
    assert all(d <= n for n, d in hosts.values())


# ---- error-contract property tests ------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_links_is_total(data):
    # the href walk is a total function of bytes: any input → a list of
    # {href, anchor} string pairs, never an exception
    out = extract_links(data)
    assert all(
        isinstance(l["href"], str) and isinstance(l["anchor"], str) for l in out
    )


# ---- PDF link annotations ----------------------------------------------------

from b_pdf_parser_spark.pdfmodel import PdfError, link_annotations
from b_pdf_parser_spark.pdfwriter import build_pdf


def test_pdf_link_annotations_roundtrip():
    spans = [[(40.0, 700.0, "Hello")], [(40.0, 700.0, "Two")]]
    links = [(0, "https://a.example/x"), (1, "https://c.example/(z)")]
    for xs in (False, True):
        pdf = build_pdf(spans, xref_stream=xs, links=links)
        got = link_annotations(pdf)
        assert got == [
            {"page": 0, "uri": "https://a.example/x"},
            {"page": 1, "uri": "https://c.example/(z)"},  # escaped parens survive
        ]
        assert link_annotations(build_pdf(spans, xref_stream=xs)) == []


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2048))
def test_link_annotations_never_raises_anything_but_pdferror(data):
    try:
        link_annotations(b"%PDF-" + data)
    except PdfError:
        pass


def test_spark_pdf_outlinks(spark):
    from b_pdf_parser_spark.operators.links import (
        extract_pdf_outlinks,
        synth_pdflink_doc_df,
    )

    edges = extract_pdf_outlinks(synth_pdflink_doc_df(spark, 40, num_partitions=4))
    # sum over i<40 of i%4 = 10 * (0+1+2+3)
    assert edges.count() == 60
    r = {(e.doc_id, e.uri) for e in edges.collect()}
    assert (7, "https://host14.example/d2") in r  # (7*2)%20 = 14
