"""The extraction operator: ``pages`` → ``extracted`` (one row per url).

Spark-first design (SURVEY §3.2, §4.3):

* **Pure DataFrame + Arrow**: the document walk runs inside ``mapInPandas``
  (iterator form, so per-worker init happens once — the idiomatic analog of
  the reference's ``init_strategy='per-worker'``, batch.py:59,277). One
  Python dispatch per *document*, zero per-row Python anywhere else.
* **Partitioning**: a stable logical ``partition_id = pmod(xxhash64(url), P)``
  column is the checkpoint/lineage unit (resume-safe, independent of the
  physical layout). Physically, oversized payloads (> ``skew_threshold``
  bytes) take an independently salted hash key in the same single shuffle,
  so multi-MB documents never pile into one straggler task (north_rule
  salt-split; the indivisible-row analog of key salting) and the source is
  scanned exactly once.
* **Error capture**: a corrupt document sets the ``error`` column; the job
  never throws (reference semantics batch.py:134-190, S10).
* **Column pruning**: only ``url, html`` (+passthrough ``warc_ts``) are
  touched; Catalyst prunes ``text/lang`` out of the scan when the caller
  doesn't select them.

Reference parity for the per-document logic: pymupdf_parser.py:50-91
(page-0 metadata, filename account fallback, all-pages text, summary merge),
__init__.py:154-161 (verification attach).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

import re as _re

from .. import fields
from ..htmlmodel import _decode_html_bytes, extract_html_blocks, extract_html_tables

_TABLE_HINT_RE = _re.compile(r"<table", _re.I)
from ..pdfmodel import PdfError, extract_pdf_pages_and_tables

__all__ = [
    "EXTRACTED_SCHEMA",
    "extract_pages",
    "extract_kind_audit",
    "extract_partition_walls",
    "make_extract_batch",
    "DEFAULT_SKEW_THRESHOLD",
]

DEFAULT_SKEW_THRESHOLD = 512 * 1024  # bytes; > p99 of the synthetic corpus

_META_FIELDS = [StructField(k, StringType()) for k in fields.METADATA_KEYS]
_TXN_FIELDS = [StructField(k, StringType()) for k in fields.TXN_KEYS]
_VERIFY_FIELDS = [
    StructField("passed", BooleanType()),
    StructField("debit_match", BooleanType()),
    StructField("credit_match", BooleanType()),
    StructField("total_debit_extracted", StringType()),
    StructField("total_debit_calculated", DoubleType()),
    StructField("debit_discrepancy", DoubleType()),
    StructField("total_credit_extracted", StringType()),
    StructField("total_credit_calculated", DoubleType()),
    StructField("credit_discrepancy", DoubleType()),
    StructField("status", StringType()),
    StructField("message", StringType()),
]

EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("kind", StringType()),  # 'pdf' | 'html' | 'empty' | 'error'
        StructField("text", StringType()),
        StructField("metadata", StructType(_META_FIELDS)),
        StructField("transactions", ArrayType(StructType(_TXN_FIELDS))),
        StructField("n_transactions", IntegerType()),
        # which fallback strategy produced the transactions (S2/P15/A6):
        # 'table' | 'column' | 'inline' | 'none'
        StructField("txn_strategy", StringType()),
        StructField("valid", BooleanType()),
        StructField("verification", StructType(_VERIFY_FIELDS)),
        StructField("n_pages", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("n_tokens", LongType()),
        StructField("error", StringType()),
        StructField("partition_id", IntegerType()),
    ]
)


def _extract_one(url: str, payload: Optional[bytes]) -> dict:
    """Per-document walk → dict of EXTRACTED columns (metadata deferred)."""
    row = {
        "kind": None,
        "text": None,
        "first_page": "",
        "n_pages": 0,
        "payload_bytes": len(payload) if payload is not None else 0,
        "tables": [],
        "error": None,
    }
    if payload is None or len(payload) == 0:
        row["kind"] = "empty"
        row["error"] = "empty payload"
        return row
    try:
        if payload[:1024].lstrip()[:5] == b"%PDF-":
            pages, tables = extract_pdf_pages_and_tables(payload)
            row["kind"] = "pdf"
            row["text"] = "".join(p + "\n" for p in pages)
            row["first_page"] = pages[0]
            row["n_pages"] = len(pages)
            row["tables"] = tables
        else:
            row["kind"] = "html"
            # decode ONCE: blocks, the table hint and the table walk all
            # read the same decoded string (a raw-byte hint would miss
            # UTF-16 pages, whose tag bytes are interleaved with NULs)
            html = _decode_html_bytes(payload)
            blocks = extract_html_blocks(html)
            row["text"] = "\n".join(b.text for b in blocks if b.is_content)
            # label scans (metadata, summary totals) run over ALL blocks:
            # header label/value lines are short and link-poor, so the
            # boilerplate classifier rightly drops them from the content
            # text — but they are exactly what the field extractor needs
            row["first_page"] = "\n".join(b.text for b in blocks)
            row["n_pages"] = 1
            # HTML <table> rows feed the same table→transactions strategy
            # as PDF span-cluster tables (an HTML bank statement and a PDF
            # one are the same document to the field layer). One cheap
            # C-level scan gates the full table walk — most pages have no
            # table at all
            if _TABLE_HINT_RE.search(html):
                row["tables"] = extract_html_tables(html)
    except PdfError as e:
        row["kind"] = "error"
        row["error"] = f"pdf: {e}"
    except Exception as e:  # never fail the batch (S10)
        row["kind"] = "error"
        row["error"] = f"{type(e).__name__}: {e}"
    return row


def _url_stem(url: str) -> str:
    tail = url.rsplit("/", 1)[-1]
    dot = tail.rfind(".")
    return tail[:dot] if dot > 0 else tail


def make_extract_batch(verify: bool = True):
    """Build the mapInPandas body. ``verify`` mirrors the reference's
    ``verify_turnover`` toggle (S11: __init__.py:133-137, .env-driven) —
    off → the ``verification`` struct is null, nothing else changes."""

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # columnar pulls once per batch (no per-row .iloc in the loop)
            urls = b["url"].tolist()
            warc = b["warc_ts"].tolist()
            pids = b["partition_id"].tolist()
            per_doc = [_extract_one(u, p) for u, p in zip(urls, b["html"])]
            texts = [d["text"] or "" for d in per_doc]
            firsts = pd.Series([d["first_page"] or "" for d in per_doc])

            # vectorized header metadata over the whole Arrow batch (page-0
            # text); one C-backed records conversion instead of 11 scalar
            # .iloc accesses per row
            meta_records = fields.extract_metadata_batch(firsts).to_dict("records")

            out_rows = []
            for idx, d in enumerate(per_doc):
                meta = meta_records[idx]
                full_text = texts[idx]
                url = urls[idx]
                meta["account_no"] = fields.account_no_from_url(_url_stem(url), meta["account_no"])
                # strategy fallback chain (S2 semantics): cell tables first
                # (pdfplumber_parser.py:212-250 tries extract_tables() before
                # any text strategy), then the column-layout cursor walk, then
                # inline one-line rows. NOTE on text strategies: the
                # reference's pdfplumber path tries inline before the column
                # walk; we deliberately invert — the column walk takes
                # precedence for pymupdf parity (the primary backend). Orders
                # coincide whenever exactly one strategy matches (true for
                # the whole corpus).
                txns, strategy = [], "none"
                if d["tables"]:
                    txns = fields.transactions_from_table_rows(d["tables"])
                    if txns:
                        strategy = "table"
                if not txns and full_text:
                    txns = fields.extract_transactions(full_text)
                    if txns:
                        strategy = "column"
                if not txns and d["kind"] == "pdf" and full_text:
                    txns = fields.extract_transactions_inline(full_text)
                    if txns:
                        strategy = "inline"
                # summary labels live in ALL blocks for html (the content
                # classifier rightly drops short label lines); for pdf the
                # full multi-page text is the scan surface
                scan_text = (
                    (d["first_page"] or "") if d["kind"] == "html" else full_text
                )
                summary = (
                    fields.extract_summary_totals(scan_text)
                    if scan_text
                    else dict.fromkeys(
                        ("total_debit", "total_credit", "opening_balance", "closing_balance")
                    )
                )
                for k in ("total_debit", "total_credit", "opening_balance", "closing_balance"):
                    meta[k] = summary.get(k) or ""  # merge rule: only truthy values
                # summary passed through: the line scan already ran above
                ver = fields.verify_turnover(txns, 0.01, summary=summary) if verify else None
                out_rows.append(
                    {
                        "url": url,
                        "warc_ts": warc[idx],
                        "kind": d["kind"],
                        "text": d["text"],
                        "metadata": meta,
                        "transactions": txns,
                        "n_transactions": len(txns),
                        "txn_strategy": strategy,
                        "valid": fields.is_valid_parse(meta, txns),
                        "verification": ver,
                        "n_pages": d["n_pages"],
                        "payload_bytes": d["payload_bytes"],
                        "n_tokens": len(full_text.split()) if full_text else 0,
                        "error": d["error"],
                        "partition_id": int(pids[idx]),
                    }
                )
            yield pd.DataFrame(out_rows, columns=[f.name for f in EXTRACTED_SCHEMA.fields])

    return extract_batch


# default instance (verification on) — used by the streaming lift
extract_batch = make_extract_batch()


def extract_pages(
    pages: DataFrame,
    *,
    num_partitions: Optional[int] = None,
    checkpoint_partitions: int = 64,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    verify: bool = True,
) -> DataFrame:
    """Build the extraction plan over a ``pages`` DataFrame.

    ``checkpoint_partitions`` fixes the *logical* partition_id space (stable
    across cluster sizes → resume works after rescale); ``num_partitions``
    sizes the physical shuffle (defaults to 2× parallelism). ``verify``
    toggles turnover verification (S11 parity: the reference resolves it
    from param-or-.env, tests/test_parsers.py:245-276 exercise both).
    """
    return _shuffled(pages, num_partitions, checkpoint_partitions, skew_threshold).mapInPandas(
        make_extract_batch(verify), schema=EXTRACTED_SCHEMA
    )


def _shuffled(
    pages: DataFrame,
    num_partitions: Optional[int],
    checkpoint_partitions: int,
    skew_threshold: int,
) -> DataFrame:
    """The shared pre-UDF plan: tag + single salted shuffle.

    Salt-split of oversized payloads in a SINGLE scan + shuffle: rows above
    the skew threshold are keyed by an independent salted hash, so multi-MB
    documents decorrelate from the url-hash placement of small rows and
    spread uniformly (the indivisible-row analog of key salting; a
    two-branch filter+union would scan the 100 TB source twice).
    """
    spark = pages.sparkSession
    p_phys = num_partitions or spark.sparkContext.defaultParallelism * 2
    oversized = F.coalesce(F.length("html") > skew_threshold, F.lit(False))
    part_key = F.when(
        oversized, F.xxhash64("url", F.lit("skew-salt"))
    ).otherwise(F.xxhash64("url"))
    tagged = pages.select(
        "url",
        "warc_ts",
        "html",
        F.pmod(F.xxhash64("url"), F.lit(checkpoint_partitions))
        .cast("int")
        .alias("partition_id"),
        part_key.alias("_pkey"),
    )
    return tagged.repartition(p_phys, F.col("_pkey")).drop("_pkey")


def extract_kind_audit(
    pages: DataFrame,
    *,
    num_partitions: Optional[int] = None,
    checkpoint_partitions: int = 64,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
) -> DataFrame:
    """Corpus-audit projection of the extraction: one ``(kind, error)`` row
    per document, from the IDENTICAL per-document walk (``_extract_one`` —
    the full PDF/HTML parse with its whole error-capture surface; kind and
    error are decided there and never touched by the field layer).

    Round-7: the audit aggregations only read these two columns, but the
    full operator shipped every parsed text, transaction array and
    metadata struct back through Arrow just to drop them — hand-done
    column pruning for an opaque UDF stage (the optimizer cannot see
    inside ``mapInPandas``). A parity test pins per-kind/error counts
    equal to :func:`extract_pages` on the same corpus."""

    def audit_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            per_doc = [
                _extract_one(u, p) for u, p in zip(b["url"].tolist(), b["html"])
            ]
            yield pd.DataFrame(
                {
                    "kind": [d["kind"] for d in per_doc],
                    "error": [d["error"] for d in per_doc],
                }
            )

    return _shuffled(
        pages, num_partitions, checkpoint_partitions, skew_threshold
    ).mapInPandas(audit_batch, schema="kind string, error string")


def extract_partition_walls(
    pages: DataFrame,
    *,
    num_partitions: Optional[int] = None,
    checkpoint_partitions: int = 64,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    verify: bool = True,
) -> DataFrame:
    """Straggler diagnostics: run the IDENTICAL extraction plan (same tag,
    same salted shuffle, same batch body) but emit one row per physical
    task — ``(wall_sec, n_docs)`` — instead of the documents. The
    straggler ratio max/median over tasks that processed rows is the
    measured effectiveness of the salt-split (a number, not a design
    note): 1.0 = perfectly level waves, >>1 = one task pins the stage."""
    import time

    inner = make_extract_batch(verify)

    def timed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.time()
        n = 0
        for out in inner(batches):
            n += len(out)
        yield pd.DataFrame({"wall_sec": [time.time() - t0], "n_docs": [n]})

    return _shuffled(pages, num_partitions, checkpoint_partitions, skew_threshold).mapInPandas(
        timed, schema="wall_sec double, n_docs long"
    )
