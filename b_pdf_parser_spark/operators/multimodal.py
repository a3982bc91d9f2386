"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video libraries are not available in this runtime, so the
*decode* step is stubbed (clearly marked), but everything Spark-side is real
and tested: schema, Arrow batch shape, partitioning, the ``mapInPandas``
feature-extraction signature, and a deterministic fake codec so pipelines
exercise end-to-end.

Fake container format (deterministic, self-describing):
``b"FAKE" + kind(3s) + width(u16be) + height(u16be) + channels(u8) + pixels``
— enough structure to make header parse, validation, resize bookkeeping and
frame sampling meaningful without a real codec.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "MEDIA_SCHEMA_DDL",
    "FEATURES_SCHEMA_DDL",
    "encode_fake_media",
    "synth_media_df",
    "decode_features",
    "frame_sample",
    "synth_imagedoc_df",
    "pdf_image_features",
]

MEDIA_SCHEMA_DDL = "media_id BIGINT, kind STRING, payload BINARY"
FEATURES_SCHEMA_DDL = (
    "media_id BIGINT, kind STRING, width INT, height INT, channels INT, "
    "n_bytes BIGINT, byte_entropy DOUBLE, error STRING"
)

_MAGIC = b"FAKE"


def encode_fake_media(media_id: int, kind: str = "img") -> bytes:
    """Deterministic fake payload for ``media_id`` (no RNG, pure function)."""
    w = 4 + (media_id % 13)
    h = 4 + (media_id % 7)
    ch = 1 + (media_id % 3)
    pixels = bytes(((media_id * 31 + i * 7) % 251) for i in range(w * h * ch))
    return (
        _MAGIC
        + kind.encode("ascii")[:3].ljust(3)
        + w.to_bytes(2, "big")
        + h.to_bytes(2, "big")
        + bytes([ch])
        + pixels
    )


def synth_media_df(spark, n: int, num_partitions: int = 8) -> DataFrame:
    base = spark.range(0, n, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            kinds = ["img", "aud", "vid"]
            rows = [
                {
                    "media_id": int(i),
                    "kind": kinds[int(i) % 3],
                    "payload": encode_fake_media(int(i), kinds[int(i) % 3]),
                }
                for i in b["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA_DDL)


def _decode_one(media_id: int, kind: str, payload: Optional[bytes]) -> dict:
    row = {
        "media_id": media_id, "kind": kind, "width": None, "height": None,
        "channels": None, "n_bytes": len(payload) if payload else 0,
        "byte_entropy": None, "error": None,
    }
    if not payload:
        row["error"] = "empty payload"
        return row
    if payload[:4] != _MAGIC:
        # REAL-FORMAT DECODE IS STUBBED: no image/audio libs in this runtime.
        # In production this branch dispatches to PIL/ffmpeg inside the same
        # Arrow batch; the Spark plumbing around it is identical.
        row["error"] = "NotImplementedError: real codec decode is stubbed"
        return row
    try:
        w = int.from_bytes(payload[7:9], "big")
        h = int.from_bytes(payload[9:11], "big")
        ch = payload[11]
        pixels = payload[12:]
        counts: dict = {}
        for byte in pixels:
            counts[byte] = counts.get(byte, 0) + 1
        n = len(pixels)
        ent = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
        row.update(width=w, height=h, channels=ch, byte_entropy=round(ent, 6))
    except Exception as e:  # malformed container → error column
        row["error"] = f"{type(e).__name__}: {e}"
    return row


def decode_features(media: DataFrame) -> DataFrame:
    """Header parse + byte-entropy features via Arrow batches (one Python
    dispatch per payload, never per byte-row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                _decode_one(int(i), k, p)
                for i, k, p in zip(b["media_id"], b["kind"], b["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "channels",
                         "n_bytes", "byte_entropy", "error"],
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA_DDL)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Treat each pixel-row of a 'vid' payload as a frame; emit every k-th
    frame's byte offset + length (the video-sampling plumbing, sans codec)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for i, k, p in zip(b["media_id"], b["kind"], b["payload"]):
                if k != "vid" or not p or p[:4] != _MAGIC:
                    continue
                w = int.from_bytes(p[7:9], "big")
                h = int.from_bytes(p[9:11], "big")
                ch = p[11]
                frame_len = w * ch
                for f in range(0, h, every):
                    out.append({
                        "media_id": int(i), "frame": f,
                        "offset": 12 + f * frame_len, "length": frame_len,
                    })
            yield pd.DataFrame(out, columns=["media_id", "frame", "offset", "length"])

    return media.mapInPandas(run, schema="media_id BIGINT, frame INT, offset BIGINT, length INT")


# ---------------------------------------------------------------------------
# PDF-embedded images (the multimodal face of the PDF walk)
# ---------------------------------------------------------------------------

IMAGEDOC_SCHEMA_DDL = "doc_id BIGINT, pdf BINARY"
IMAGE_INV_SCHEMA_DDL = (
    "doc_id BIGINT, page INT, name STRING, width INT, height INT, "
    "filter STRING, n_bytes BIGINT"
)

_IMG_FILTERS = ("DCTDecode", "CCITTFaxDecode", "JPXDecode")


def synth_imagedoc_df(spark, n: int, num_partitions: int = 8) -> DataFrame:
    """``n`` deterministic PDFs carrying ``doc_id % 4`` embedded image
    XObjects each (mixed DCT/CCITT/JPX filters, classic and xref-stream
    emission) — every byte a pure function of doc_id, so a DuckDB oracle
    can recompute the expected inventory while the Spark path exercises
    the REAL writer → parser roundtrip."""
    base = spark.range(0, n, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from b_pdf_parser_spark.pdfwriter import build_pdf, make_image

        for b in batches:
            rows = []
            for raw in b["id"]:
                i = int(raw)
                spans = [[(40.0, 700.0, f"image doc {i}"),
                          (40.0, 680.0, "with pictures")]]
                imgs = [
                    make_image(
                        0,
                        8 + (i + j) % 32,
                        8 + (i * j) % 24,
                        _IMG_FILTERS[(i + j) % 3],
                        seed=i * 17 + j,
                    )
                    for j in range(i % 4)
                ]
                rows.append({
                    "doc_id": i,
                    "pdf": build_pdf(spans, xref_stream=(i % 2 == 0), images=imgs),
                })
            yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

    return base.mapInPandas(gen, schema=IMAGEDOC_SCHEMA_DDL)


def pdf_image_features(docs: DataFrame) -> DataFrame:
    """Inventory every image XObject in each PDF payload (one Arrow-batch
    Python dispatch per document; pixels are never decoded — see
    ``pdfmodel.image_inventory``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from b_pdf_parser_spark.pdfmodel import image_inventory

        cols = ["doc_id", "page", "name", "width", "height", "filter", "n_bytes"]
        for b in batches:
            rows = []
            for did, pdf in zip(b["doc_id"], b["pdf"]):
                try:
                    for rec in image_inventory(bytes(pdf)):
                        rows.append({"doc_id": int(did), **rec})
                except Exception as e:  # corrupt doc → error row, job survives
                    rows.append({
                        "doc_id": int(did), "page": -1, "name": "",
                        "width": 0, "height": 0,
                        "filter": f"error:{type(e).__name__}", "n_bytes": 0,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(run, schema=IMAGE_INV_SCHEMA_DDL)
