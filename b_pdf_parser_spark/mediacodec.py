"""From-scratch stdlib-only media codecs: PNG, BMP, WAV — REAL decoders.

The multimodal stub (operators/multimodal.py) honestly raised for "real
codec decode" because PIL/ffmpeg/opencv are absent from this runtime. But
three real container formats need nothing beyond the standard library, so
their decode paths are implemented for real here, from the public specs:

* **PNG** (RFC 2083 / W3C PNG spec): 8-bit greyscale / truecolor / RGBA,
  non-interlaced; chunk walk with CRC-32 verification, multi-IDAT
  concatenation, zlib inflate, and per-row unfiltering for ALL five filter
  types (None/Sub/Up/Average/Paeth — the same predictor family the PDF
  xref-stream decoder already implements, reimplemented here over the
  pixel byte stream).
* **BMP** (BITMAPINFOHEADER, BI_RGB): 24-bit uncompressed, bottom-up rows,
  BGR order, 4-byte row padding — decoded back to canonical top-down RGB.
* **WAV** (RIFF/WAVE, PCM): 16-bit little-endian PCM, fmt/data chunk walk
  (unknown chunks skipped per spec), any channel count.

Every decoder returns canonical values (top-down RGB pixel bytes / int16
samples) so value-level oracles can recompute exact integer features
(sums, position-weighted sums) from the generating formulas — the
real-roundtrip-vs-formula pattern. Encoders exist to build the test
corpus deterministically; the PNG encoder rotates the row filter type so
the decoder's whole unfilter surface is exercised by round-trips.

What remains stubbed — and why: JPEG/DCT, JPEG2000, CCITT, and every
audio/video compression codec require entropy-coded bitstream decoders
(or the absent native libs); those payloads still take the honest
NotImplementedError path in operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

__all__ = [
    "encode_png",
    "decode_png",
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CT_TO_CH = {0: 1, 2: 3, 6: 4}  # greyscale / truecolor / truecolor+alpha
_CH_TO_CT = {1: 0, 3: 2, 4: 6}


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + typ
        + body
        + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(f: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``f`` to a raw row (encoder side)."""
    n = len(row)
    out = bytearray(n)
    for x in range(n):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if f == 0:
            v = row[x]
        elif f == 1:
            v = row[x] - a
        elif f == 2:
            v = row[x] - b
        elif f == 3:
            v = row[x] - (a + b) // 2
        else:
            v = row[x] - _paeth(a, b, c)
        out[x] = v & 0xFF
    return bytes(out)


def _unfilter_row(f: int, row: bytearray, prev: bytes, bpp: int) -> bytearray:
    """Invert PNG filter ``f`` in place (decoder side)."""
    n = len(row)
    for x in range(n):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if f == 0:
            v = row[x]
        elif f == 1:
            v = row[x] + a
        elif f == 2:
            v = row[x] + b
        elif f == 3:
            v = row[x] + (a + b) // 2
        elif f == 4:
            v = row[x] + _paeth(a, b, c)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        row[x] = v & 0xFF
    return row


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, filter_seed: int = 0
) -> bytes:
    """Serialize canonical top-down pixels (8-bit, ``channels`` ∈ {1,3,4})
    as a real PNG. The per-row filter type rotates ``(filter_seed + y) % 5``
    so round-trips cover the full unfilter surface; the IDAT stream is
    split into two chunks when it is big enough to exercise concatenation."""
    if channels not in _CH_TO_CT:
        raise ValueError("channels must be 1, 3 or 4")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _CH_TO_CT[channels], 0, 0, 0)
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        f = (filter_seed + y) % 5
        raw.append(f)
        raw += _filter_row(f, row, prev, channels)
        prev = row
    comp = zlib.compress(bytes(raw), 6)
    mid = len(comp) // 2 if len(comp) > 64 else len(comp)
    idat = _chunk(b"IDAT", comp[:mid])
    if mid < len(comp):
        idat += _chunk(b"IDAT", comp[mid:])
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + idat + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> Tuple[int, int, int, bytes]:
    """→ (width, height, channels, canonical top-down pixel bytes)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat: List[bytes] = []
    w = h = ch = None
    while pos + 12 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        if (zlib.crc32(typ + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ct not in _CT_TO_CH:
                raise ValueError(f"unsupported color type {ct}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            ch = _CT_TO_CH[ct]
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("decompressed size does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    p = 0
    for _y in range(h):
        f = raw[p]
        row = _unfilter_row(f, bytearray(raw[p + 1 : p + 1 + stride]), prev, ch)
        p += 1 + stride
        out += row
        prev = bytes(row)
    return w, h, ch, bytes(out)


def encode_bmp(width: int, height: int, pixels_rgb: bytes) -> bytes:
    """Canonical top-down RGB → 24-bit BI_RGB BMP (bottom-up, BGR, rows
    padded to 4 bytes — the format's actual on-disk shape)."""
    if len(pixels_rgb) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            o = (y * width + x) * 3
            r, g, b = pixels_rgb[o], pixels_rgb[o + 1], pixels_rgb[o + 2]
            row += bytes((b, g, r))  # BGR on disk
        row += bytes(pad)
        rows.append(bytes(row))
    body = b"".join(rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + dib + body


def decode_bmp(data: bytes) -> Tuple[int, int, int, bytes]:
    """→ (width, height, 3, canonical top-down RGB pixel bytes)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    _sig, _size, _r1, _r2, off = struct.unpack("<2sIHHI", data[:14])
    hsz, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    pad = (-(w * 3)) % 4
    stride = w * 3 + pad
    out = bytearray(w * h * 3)
    for row_i in range(h):
        y = (h - 1 - row_i) if bottom_up else row_i  # canonical row index
        base = off + row_i * stride
        for x in range(w):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            o = (y * w + x) * 3
            out[o], out[o + 1], out[o + 2] = r, g, b
    return w, h, 3, bytes(out)


def encode_wav(sample_rate: int, channels: int, samples: List[int]) -> bytes:
    """Interleaved int16 samples → RIFF/WAVE PCM16. A junk ``LIST`` chunk
    is inserted before ``data`` so decoders must actually walk chunks."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    junk = b"INFOsynthetic corpus\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(junk)) + junk + (b"\x00" if len(junk) % 2 else b"")
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> Tuple[int, int, List[int]]:
    """→ (sample_rate, channels, interleaved int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = ch = None
    samples: List[int] = []
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            samples = list(struct.unpack(f"<{ln // 2}h", body[: (ln // 2) * 2]))
        pos += 8 + ln + (ln % 2)  # chunks are word-aligned
    if rate is None:
        raise ValueError("missing fmt chunk")
    return rate, ch, samples
