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
* **WAV** (RIFF/WAVE): 16-bit little-endian PCM and 8-bit G.711 μ-law
  (ITU-T G.711 — decoded by the public complement/exponent/mantissa
  integer expansion, so a SQL oracle can restate it); fmt/data chunk walk
  (unknown chunks skipped per spec), any channel count.
* **GIF** (GIF89a): the LSB-first variable-code-width LZW that is the
  bit-order twin of the PDF ``LZWDecode`` filter (pdfmodel._lzw is
  MSB-first with EarlyChange; GIF packs codes little-endian with a
  per-image minimum code size and no early change), global color table
  lookup back to canonical RGB, sub-block reassembly, extension-block
  skipping, and both sequential and 4-pass interlaced row order.
* **TIFF** (TIFF 6.0 / class F): both byte orders, IFD walk with
  inline-vs-offset value slots, strip organization (RowsPerStrip), 8-bit
  gray/RGB uncompressed, and Compression=4 fax strips routed through the
  from-scratch CCITT Group 4 codec (``ccittcodec.py``) with
  PhotometricInterpretation honored — the container scanned documents
  actually travel the web in.

Every decoder returns canonical values (top-down RGB pixel bytes / int16
samples) so value-level oracles can recompute exact integer features
(sums, position-weighted sums) from the generating formulas — the
real-roundtrip-vs-formula pattern. Encoders exist to build the test
corpus deterministically; the PNG encoder rotates the row filter type so
the decoder's whole unfilter surface is exercised by round-trips.

JPEG (entropy-coded DCT, baseline SOF0/SOF1 and progressive SOF2) lives
in the sibling module ``jpegcodec.py``, and CCITT Group 4 fax (ITU-T
T.6) in ``ccittcodec.py`` — both implemented from scratch as of round
5. What remains stubbed — and why: arithmetic-coded JPEG, JPEG2000, and
every audio/video compression codec still need decoders we haven't
built (or the absent native libs); those payloads take the honest
NotImplementedError path in operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Tuple

__all__ = [
    "encode_png",
    "decode_png",
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
    "encode_gif",
    "decode_gif",
    "encode_tiff",
    "decode_tiff",
    "ulaw_expand",
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


def encode_wav(
    sample_rate: int, channels: int, samples: List[int], ulaw: bool = False
) -> bytes:
    """Interleaved samples → RIFF/WAVE. PCM16 by default (``samples`` are
    int16); with ``ulaw=True`` the samples are raw G.711 μ-law code bytes
    (0–255) and the fmt chunk says audio format 7 / 8 bits. A junk
    ``LIST`` chunk is inserted before ``data`` so decoders must actually
    walk chunks."""
    if ulaw:
        body = bytes(samples)
        fmt = struct.pack(
            "<HHIIHH", 7, channels, sample_rate,
            sample_rate * channels, channels, 8,
        )
    else:
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
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def ulaw_expand(b: int) -> int:
    """ITU-T G.711 μ-law code byte → linear int16 sample (the public
    complement / exponent / mantissa integer expansion — pure integer
    arithmetic, so a SQL oracle can restate it verbatim)."""
    u = ~b & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    mag -= 0x84
    return -mag if u & 0x80 else mag


def decode_wav(
    data: bytes, return_codec: bool = False
) -> Tuple[int, ...]:
    """→ (sample_rate, channels, interleaved linear int16 samples)
    [+ codec name ``"pcm16"``/``"ulaw"`` when ``return_codec``].

    Accepts PCM16 (audio format 1) and G.711 μ-law (format 7, 8-bit);
    μ-law code bytes are expanded to linear int16 so both forms return
    canonical values."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = ch = None
    audio_fmt = None
    samples: List[int] = []
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if (audio_fmt, bits) not in ((1, 16), (7, 8)):
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            if audio_fmt == 7:
                samples = [ulaw_expand(v) for v in body]
            else:
                samples = list(struct.unpack(f"<{ln // 2}h", body[: (ln // 2) * 2]))
        pos += 8 + ln + (ln % 2)  # chunks are word-aligned
    if rate is None:
        raise ValueError("missing fmt chunk")
    if return_codec:
        return rate, ch, samples, ("ulaw" if audio_fmt == 7 else "pcm16")
    return rate, ch, samples


# ---------------------------------------------------------------------------
# GIF — the LSB-first LZW sibling of the PDF LZWDecode filter
# ---------------------------------------------------------------------------

# GIF's 4-pass interlace: (first row, row step) per pass
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(height: int) -> List[int]:
    return [y for start, step in _GIF_INTERLACE for y in range(start, height, step)]


def _gif_lzw_compress(indices: bytes, mcs: int) -> bytes:
    """Real dictionary LZW, GIF flavor: codes packed LSB-first, width
    grows 1 past each power of two the *decoder's* table crosses (the
    encoder runs one dictionary entry ahead of the decoder, hence the
    ``next_code == (1 << width) + 1`` bump — no EarlyChange, unlike the
    PDF filter), clear code emitted whenever the table fills at 4096."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    w = b""
    for byte in indices:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decompress(data: bytes, mcs: int, expect: int) -> bytes:
    """Inverse of :func:`_gif_lzw_compress`; stops after ``expect`` output
    bytes or the EOI code."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    prev: bytes = b""
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = mcs + 1
                prev = b""
                continue
            if code == eoi:
                return bytes(out)
            if not prev:
                if code >= len(table):
                    raise ValueError("GIF LZW: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW: code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    raise ValueError("GIF LZW: ran out of data before EOI")


def encode_gif(
    width: int,
    height: int,
    palette: List[Tuple[int, int, int]],
    indices: bytes,
    interlace: bool = False,
) -> bytes:
    """Palette (power-of-two length 2–256) + per-pixel palette indices →
    a real GIF89a. A comment extension and a graphic control extension
    precede the image so decoders must walk 0x21 blocks; ``interlace``
    writes rows in the 4-pass order."""
    psize = len(palette)
    if psize < 2 or psize & (psize - 1):
        raise ValueError("palette length must be a power of two in [2, 256]")
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    if max(indices) >= psize:
        raise ValueError("palette index out of range")
    depth = psize.bit_length() - 1  # log2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes((0x80 | ((depth - 1) & 7) << 4 | (depth - 1) & 7, 0, 0))
    for r, g, b in palette:
        out += bytes((r, g, b))
    # graphic control + comment extensions: decoders must skip these
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x21\xfe\x10synthetic corpus\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes((0x40 if interlace else 0,))
    if interlace:
        rows = _gif_interlace_order(height)
        body = b"".join(indices[y * width : (y + 1) * width] for y in rows)
    else:
        body = indices
    mcs = max(2, depth)
    out.append(mcs)
    comp = _gif_lzw_compress(body, mcs)
    for off in range(0, len(comp), 255):
        block = comp[off : off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> Tuple[int, int, int, bytes]:
    """→ (width, height, 3, canonical top-down RGB pixel bytes): walks the
    header/extensions, reassembles sub-blocks, LZW-decodes the index
    stream, undoes interlacing, and maps through the color table."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed, _bg, _aspect = data[10], data[11], data[12]
    pos = 13
    gct: List[Tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 7)
        for j in range(n):
            o = pos + 3 * j
            gct.append((data[o], data[o + 1], data[o + 2]))
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte then sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
        flags = data[pos + 8]
        pos += 9
        pal = gct
        if flags & 0x80:  # local color table
            n = 2 << (flags & 7)
            pal = [
                (data[pos + 3 * j], data[pos + 3 * j + 1], data[pos + 3 * j + 2])
                for j in range(n)
            ]
            pos += 3 * n
        if not pal:
            raise ValueError("GIF image has no color table")
        mcs = data[pos]
        pos += 1
        comp = bytearray()
        while data[pos]:
            ln = data[pos]
            comp += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decompress(bytes(comp), mcs, w * h)
        if flags & 0x40:  # undo 4-pass interlace
            ordered = bytearray(w * h)
            for src, y in enumerate(_gif_interlace_order(h)):
                ordered[y * w : (y + 1) * w] = idx[src * w : (src + 1) * w]
            idx = bytes(ordered)
        out = bytearray(w * h * 3)
        for k, v in enumerate(idx):
            if v >= len(pal):
                raise ValueError("GIF palette index out of range")
            out[3 * k], out[3 * k + 1], out[3 * k + 2] = pal[v]
        return w, h, 3, bytes(out)
    raise ValueError("GIF contains no image descriptor")


# ---------------------------------------------------------------------------
# TIFF 6.0 (Adobe spec, public) — baseline strip-organized reader/writer in
# both byte orders, plus TIFF class F: Compression=4 routes each strip
# through the from-scratch CCITT Group 4 codec (ccittcodec.py), which is
# how scanned documents actually travel the web (fax TIFFs). Strips are
# independent G4 blocks (each restarts from the imaginary all-white row,
# TIFF 6.0 §Section 11).
# ---------------------------------------------------------------------------

_TIFF_COMP_NONE = 1
_TIFF_COMP_G4 = 4


def encode_tiff(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    *,
    compression: int = _TIFF_COMP_NONE,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Minimal-but-valid TIFF: 8-bit gray (ch 1) or RGB (ch 3) with
    Compression=1, or bi-level class-F fax (ch 1, bytes 0=black else
    white) with Compression=4 (CCITT G4). Strip-organized; ``pixels``
    is row-major top-down."""
    if channels not in (1, 3):
        raise ValueError("TIFF: only 1 or 3 samples/pixel supported")
    if len(pixels) != width * height * channels:
        raise ValueError("TIFF: pixel buffer size mismatch")
    if compression == _TIFF_COMP_G4 and channels != 1:
        raise ValueError("TIFF: G4 compression is bi-level (1 sample)")
    if compression not in (_TIFF_COMP_NONE, _TIFF_COMP_G4):
        raise ValueError(f"TIFF: unsupported compression {compression}")
    end = ">" if big_endian else "<"
    rps = height if rows_per_strip is None else max(1, int(rows_per_strip))

    strips: List[bytes] = []
    row_bytes = width * channels
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        raw = pixels[y0 * row_bytes : (y0 + rows) * row_bytes]
        if compression == _TIFF_COMP_G4:
            from .ccittcodec import encode_g4

            strips.append(encode_g4(width, rows, raw))
        else:
            strips.append(raw)

    # photometric: fax default 0 (WhiteIsZero); gray 1 (BlackIsZero); RGB 2
    photometric = 0 if compression == _TIFF_COMP_G4 else (1 if channels == 1 else 2)
    bits = 1 if compression == _TIFF_COMP_G4 else 8

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # value left-justified in its 4-byte slot per the spec
        if typ == 3 and count == 1:  # SHORT
            return struct.pack(end + "HHI", tag, typ, count) + struct.pack(
                end + "HH", value, 0
            )
        return struct.pack(end + "HHII", tag, typ, count, value)

    n_strips = len(strips)
    # layout: header(8) | IFD | [bits array][strip offsets][strip counts] | strips
    tags = [256, 257, 258, 259, 262, 273, 277, 278, 279]
    ifd_size = 2 + len(tags) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size

    def put_array(values: List[int], typ: int) -> int:
        """Append a SHORT/LONG array to the extra area, return its offset."""
        off = extra_base + len(extra)
        fmt = "H" if typ == 3 else "I"
        extra.extend(struct.pack(end + fmt * len(values), *values))
        return off

    if channels == 3:
        bits_value = put_array([8, 8, 8], 3)
        bits_entry = entry(258, 3, 3, bits_value)
    else:
        bits_entry = entry(258, 3, 1, bits)

    # strip offset/count arrays (reserve now, fill after sizes are known)
    data_base_guess = None
    counts = [len(s) for s in strips]
    if n_strips == 1:
        counts_entry = entry(279, 4, 1, counts[0])
    else:
        counts_entry = entry(279, 4, n_strips, put_array(counts, 4))
    # strip data begins after the extra area; offsets are computable now
    # (extra grows only by the offsets array itself below, so account it)
    off_array_len = 0 if n_strips == 1 else 4 * n_strips
    data_base_guess = extra_base + len(extra) + off_array_len
    offsets = []
    pos = data_base_guess
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n_strips == 1:
        offsets_entry = entry(273, 4, 1, offsets[0])
    else:
        offsets_entry = entry(273, 4, n_strips, put_array(offsets, 4))

    entries = [
        entry(256, 4, 1, width),
        entry(257, 4, 1, height),
        bits_entry,
        entry(259, 3, 1, compression),
        entry(262, 3, 1, photometric),
        offsets_entry,
        entry(277, 3, 1, channels),
        entry(278, 4, 1, rps),
        counts_entry,
    ]
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(end + "HI", 42, 8)
    out += struct.pack(end + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(end + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(data: bytes) -> Tuple[int, int, int, bytes]:
    """→ (width, height, channels, row-major top-down pixel bytes).
    Handles both byte orders, multi-strip organization, Compression 1
    (8-bit gray / 24-bit RGB) and Compression 4 (CCITT G4 bi-level via
    ``ccittcodec``, honoring PhotometricInterpretation). Fails loud on
    anything else."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("TIFF: bad byte-order mark")
    end = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(end + "HI", data, 2)
    if magic != 42:
        raise ValueError("TIFF: bad magic")
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack_from(end + "H", data, ifd_off)
    tag_sizes = {1: 1, 3: 2, 4: 4}

    def values(tag_typ: int, count: int, slot: bytes) -> List[int]:
        size = tag_sizes.get(tag_typ)
        if size is None:
            raise ValueError(f"TIFF: unsupported field type {tag_typ}")
        fmt = {1: "B", 3: "H", 4: "I"}[tag_typ]
        total = size * count
        if total <= 4:
            return list(struct.unpack_from(end + fmt * count, slot, 0))
        (off,) = struct.unpack_from(end + "I", slot, 0)
        if off + total > len(data):
            raise ValueError("TIFF: value offset out of range")
        return list(struct.unpack_from(end + fmt * count, data, off))

    tags: Dict[int, List[int]] = {}
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        if base + 12 > len(data):
            raise ValueError("TIFF: truncated IFD")
        tag, typ, count = struct.unpack_from(end + "HHI", data, base)
        tags[tag] = values(typ, count, data[base + 8 : base + 12])

    def one(tag: int, default: int | None = None) -> int:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF: required tag {tag} missing")
            return default
        return tags[tag][0]

    width = one(256)
    height = one(257)
    comp = one(259, 1)
    photometric = one(262)
    channels = one(277, 1)
    rps = one(278, height)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: missing/mismatched strip tables")
    bits = tags.get(258, [8])
    if one(266, 1) != 1:  # FillOrder: LSB-first fax bytes would feed the
        raise ValueError("TIFF: FillOrder 2 (LSB-first) unsupported")
    if comp == _TIFF_COMP_G4:
        if channels != 1 or bits != [1]:
            raise ValueError("TIFF: G4 must be 1 sample at 1 bit")
        if photometric not in (0, 1):
            raise ValueError(f"TIFF: fax photometric {photometric} invalid")
    elif comp == _TIFF_COMP_NONE:
        if bits != [8] * channels or channels not in (1, 3):
            raise ValueError("TIFF: only 8-bit gray/RGB uncompressed")
        if channels == 3 and photometric != 2:
            raise ValueError(f"TIFF: RGB needs photometric 2, got {photometric}")
        if channels == 1 and photometric not in (0, 1):
            raise ValueError(f"TIFF: gray photometric {photometric} invalid")
    else:
        raise ValueError(f"TIFF: unsupported compression {comp}")

    out = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise ValueError("TIFF: strip out of range")
        strip = data[off : off + cnt]
        rows = min(rps, height - rows_done)
        if rows <= 0:
            raise ValueError("TIFF: more strips than image rows")
        if comp == _TIFF_COMP_G4:
            from .ccittcodec import decode_g4

            px = decode_g4(strip, width, rows)
            if photometric == 1:  # BlackIsZero fax: invert our convention
                px = bytes(255 - v for v in px)
            out += px
        else:
            if cnt != rows * width * channels:
                raise ValueError("TIFF: strip byte count mismatch")
            if channels == 1 and photometric == 0:
                # WhiteIsZero grayscale (some scanners): canonicalize
                out += bytes(255 - v for v in strip)
            else:
                out += strip
        rows_done += rows
    if rows_done != height:
        raise ValueError("TIFF: strips cover wrong number of rows")
    return width, height, channels, bytes(out)
