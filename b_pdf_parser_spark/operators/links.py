"""Outlink extraction + host-graph aggregation (the link-graph stage of a
web-scale pipeline: crawl frontiers, PageRank-style host ranking, spam-host
heuristics all start from exactly this edge table).

Spark shape: one Arrow-batch Python dispatch per document for the byte-level
href walk (``htmlmodel.extract_links``), then pure column expressions —
host parsing is a codegen'd ``regexp_extract`` and the degree aggregation is
one shuffle on the host key with map-side partial aggregation. At 10^12
pages the edge table is the biggest intermediate in the pipeline; keeping it
(url, href, anchor) narrow and letting the host roll-up reduce map-side is
what makes it tractable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "extract_outlinks",
    "host_degrees",
    "synth_linkdoc_df",
    "synth_pdflink_doc_df",
    "extract_pdf_outlinks",
]

LINKS_SCHEMA_DDL = "doc_id BIGINT, href STRING, anchor STRING"

# scheme://host[/...] — same regex evaluates identically in DuckDB, so the
# host roll-up stays oracle-portable (no engine-specific parse_url)
_HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def synth_linkdoc_df(spark, n: int, num_partitions: int = 8) -> DataFrame:
    """``n`` deterministic HTML documents, doc ``i`` carrying ``i % 5``
    outlinks to ``https://host{(i*k) % 20}.example/p{k}`` — every href a
    pure function of (i, k), so a DuckDB oracle recomputes the expected
    edge table while the Spark path walks REAL markup (nav boilerplate,
    nested tags, entities, unquoted attributes)."""
    base = spark.range(0, n, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for raw in b["id"]:
                i = int(raw)
                anchors = "".join(
                    (
                        f'<li><a href="https://host{(i * k) % 20}.example/p{k}">'
                        f"go &amp; see {k}</a></li>"
                        if k % 2
                        else f"<li><a href=https://host{(i * k) % 20}.example/p{k}>"
                             f"go &amp; see <b>{k}</b></a></li>"
                    )
                    for k in range(1, 1 + i % 5)
                )
                html = (
                    f"<html><head><title>doc {i}</title></head><body>"
                    f"<nav><a name='top'>menu</a></nav>"
                    f"<article><p>Body text of document {i}.</p>"
                    f"<ul>{anchors}</ul></article></body></html>"
                )
                rows.append({"doc_id": i, "html": html.encode("utf-8")})
            yield pd.DataFrame(rows, columns=["doc_id", "html"])

    return base.mapInPandas(gen, schema="doc_id BIGINT, html BINARY")


def extract_outlinks(docs: DataFrame, id_col: str = "doc_id", html_col: str = "html") -> DataFrame:
    """(doc, href, anchor) edges via the byte-level href walk."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from b_pdf_parser_spark.htmlmodel import extract_links

        for b in batches:
            rows = []
            for did, payload in zip(b[id_col], b[html_col]):
                if payload is None:
                    continue
                for link in extract_links(bytes(payload)):
                    rows.append({
                        "doc_id": int(did),
                        "href": link["href"],
                        "anchor": link["anchor"],
                    })
            yield pd.DataFrame(rows, columns=["doc_id", "href", "anchor"])

    return docs.mapInPandas(run, schema=LINKS_SCHEMA_DDL)


def host_degrees(edges: DataFrame) -> DataFrame:
    """Host-level in-degree: total inlinks + distinct linking documents.
    One shuffle on the host key; both aggregates partial-combine map-side."""
    return (
        edges.select(
            "doc_id", F.regexp_extract("href", _HOST_PATTERN, 1).alias("host")
        )
        .filter(F.col("host") != "")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_inlinks"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# PDF outlinks (URI link annotations — the PDF half of the link graph)
# ---------------------------------------------------------------------------

PDF_LINKS_SCHEMA_DDL = "doc_id BIGINT, page INT, uri STRING"


def synth_pdflink_doc_df(spark, n: int, num_partitions: int = 8) -> DataFrame:
    """``n`` deterministic PDFs, doc ``i`` carrying ``i % 4`` URI link
    annotations to ``https://host{(i*k) % 20}.example/d{k}`` — real PDFs
    through the writer (alternating emission modes), formulas the DuckDB
    oracle recomputes."""
    base = spark.range(0, n, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from b_pdf_parser_spark.pdfwriter import build_pdf

        for b in batches:
            rows = []
            for raw in b["id"]:
                i = int(raw)
                spans = [[(40.0, 700.0, f"pdf with links {i}")]]
                links = [
                    (0, f"https://host{(i * k) % 20}.example/d{k}")
                    for k in range(1, 1 + i % 4)
                ]
                rows.append({
                    "doc_id": i,
                    "pdf": build_pdf(spans, xref_stream=(i % 2 == 0), links=links),
                })
            yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

    return base.mapInPandas(gen, schema="doc_id BIGINT, pdf BINARY")


def extract_pdf_outlinks(docs: DataFrame, id_col: str = "doc_id", pdf_col: str = "pdf") -> DataFrame:
    """(doc, page, uri) edges from URI link annotations (one Arrow-batch
    Python dispatch per document; corrupt docs contribute no rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from b_pdf_parser_spark.pdfmodel import PdfError, link_annotations

        cols = ["doc_id", "page", "uri"]
        for b in batches:
            rows = []
            for did, payload in zip(b[id_col], b[pdf_col]):
                if payload is None:
                    continue
                try:
                    for rec in link_annotations(bytes(payload)):
                        rows.append({"doc_id": int(did), **rec})
                except PdfError:
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(run, schema=PDF_LINKS_SCHEMA_DDL)
