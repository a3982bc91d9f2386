"""From-scratch CCITT Group 3 / Group 4 (ITU-T T.4 / T.6) bi-level codecs.

This is the PDF ``/CCITTFaxDecode`` filter (ISO 32000-2 §7.4.6) across
all three ``K`` regimes:

* ``K < 0`` — **Group 4** (T.6 MMR), the variant real scanned-document
  PDFs and TIFF class-F files use. Every row is coded two-dimensionally
  against the row above it (the first row against an imaginary all-white
  row) with three modes — PASS, HORIZONTAL and VERTICAL(±3) — where
  horizontal mode falls back to the one-dimensional run-length alphabets
  of ITU-T T.4 §4.1.
* ``K = 0`` — **Group 3 one-dimensional** (T.4 §4.1, Modified Huffman):
  every row is an independent sequence of alternating white/black run
  codes (starting white, with a zero-length white run when the row opens
  black), each row preceded by an EOL code whose leading zeros absorb
  fill bits.
* ``K > 0`` — **Group 3 two-dimensional** (T.4 §4.2): each EOL carries a
  one-bit tag — ``1`` means the next row is coded 1-D, ``0`` means it is
  coded 2-D with the same PASS/HORIZONTAL/VERTICAL modes as Group 4 —
  and at least every ``K``-th row must be 1-D so damage cannot propagate
  more than ``K`` rows (this encoder makes rows ``y % K == 0`` 1-D).

The shared T.4 §4.1 run alphabets are the separate white/black
terminating codes 0–63 and makeup codes 64–1728, plus the shared
extended makeup codes 1792–2560.

Bi-level coding is LOSSLESS, so decode(encode(x)) == x bit-for-bit —
which is what lets embedded CCITT images join the exact-integer value
oracles the same way flat-block JPEG does (``operators/multimodal``).

Pixel convention: 1 byte per pixel, ``0`` = black, anything else =
white (callers map PDF ``/BlackIs1`` themselves if they ever emit it;
this repo's writer uses the PDF default).

Reference analog: the reference repo (rager306/b-pdf-parser) delegates
all image handling to PyMuPDF, which links libtiff's G4 codec; no CCITT
code exists there to port — this implementation is written from the
public ITU-T T.4/T.6 specifications.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .mediacodec import _check_pixel_budget

__all__ = ["encode_g4", "decode_g4", "encode_g3", "decode_g3"]


# ---------------------------------------------------------------------------
# ITU-T T.4 §4.1 run-length alphabets (public tables).
# Values are code strings of '0'/'1' — kept as strings so the tables are
# directly comparable against the spec; tests assert prefix-freedom.
# ---------------------------------------------------------------------------

WHITE_CODES: Dict[int, str] = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

BLACK_CODES: Dict[int, str] = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes (T.4 table 3): shared by both colors
EXT_MAKEUP: Dict[int, str] = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 §2.2.4 vertical/pass/horizontal mode codes
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}
_MODE_H = "001"
_MODE_PASS = "0001"

_EOL = "000000000001"  # EOFB = two of these


def _decode_table(codes: Dict[int, str]) -> Dict[str, int]:
    t = {bits: run for run, bits in codes.items()}
    for run, bits in EXT_MAKEUP.items():
        t[bits] = run
    return t


_WHITE_DEC = _decode_table(WHITE_CODES)
_BLACK_DEC = _decode_table(BLACK_CODES)
_MODE_DEC = {bits: d for d, bits in _MODE_V.items()}
_MODE_DEC[_MODE_H] = "H"
_MODE_DEC[_MODE_PASS] = "P"
_MODE_DEC[_EOL] = "EOL"
_MAX_CODE_LEN = 14


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: str) -> None:
        for ch in bits:
            self.acc = (self.acc << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        """Zero-pad to the next byte boundary (EncodedByteAlign)."""
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def align(self) -> None:
        """Skip to the next byte boundary (EncodedByteAlign)."""
        self.pos = (self.pos + 7) & ~7

    def bit(self) -> int:
        byte, off = divmod(self.pos, 8)
        if byte >= len(self.data):
            raise ValueError("CCITT: bitstream ran out")
        self.pos += 1
        return (self.data[byte] >> (7 - off)) & 1

    def code(self, table: Dict[str, int | str], what: str):
        acc = ""
        for _ in range(_MAX_CODE_LEN):
            acc += "1" if self.bit() else "0"
            if acc in table:
                return table[acc]
        raise ValueError(f"CCITT: invalid {what} code {acc!r}")


def _transitions(row: bytes) -> List[int]:
    """Positions where the color changes, starting from imaginary white
    before pixel 0 (so an even-index entry is a white→black change)."""
    out: List[int] = []
    prev_white = True
    for x, px in enumerate(row):
        white = px != 0
        if white != prev_white:
            out.append(x)
            prev_white = white
    return out


def _emit_run(out: _BitWriter, run: int, white: bool) -> None:
    codes = WHITE_CODES if white else BLACK_CODES
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        # don't strand a sub-64 remainder the tables can't terminate:
        # only makeups that leave 0..63 (or another full makeup) are legal
        out.put(codes[m] if m <= 1728 else EXT_MAKEUP[m])
        run -= m
    out.put(codes[run])


def _b1_b2(ref: List[int], a0: int, color_white: bool, width: int) -> Tuple[int, int]:
    """First changing element on the reference line right of ``a0`` with
    color opposite to a0's color (T.6 §2.2.1), and its successor."""
    # a white→black change sits at an even index of the transition list
    want_parity = 0 if color_white else 1
    j = 0
    while j < len(ref) and (ref[j] <= a0 or (j & 1) != want_parity):
        j += 1
    b1 = ref[j] if j < len(ref) else width
    b2 = ref[j + 1] if j + 1 < len(ref) else width
    return b1, b2


def _encode_row_2d(out: _BitWriter, cur: List[int], ref: List[int], width: int) -> None:
    """Code one row's transition list two-dimensionally against ``ref``
    (T.6 §2.2 — shared verbatim by Group 4 and Group 3 2-D rows)."""
    a0 = -1
    color_white = True
    ci = 0  # index into cur of the next change (= a1)
    while a0 < width:
        a1 = cur[ci] if ci < len(cur) else width
        b1, b2 = _b1_b2(ref, a0, color_white, width)
        if b2 < a1:
            out.put(_MODE_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            out.put(_MODE_V[a1 - b1])
            a0 = a1
            color_white = not color_white
            ci += 1
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else width
            r1 = a1 - (a0 if a0 > 0 else 0)
            r2 = a2 - a1
            out.put(_MODE_H)
            _emit_run(out, r1, color_white)
            _emit_run(out, r2, not color_white)
            a0 = a2
            ci += 2


def _encode_row_1d(out: _BitWriter, cur: List[int], width: int) -> None:
    """Code one row as T.4 §4.1 Modified Huffman: alternating white/black
    runs starting white (a row that opens black gets a zero-length white
    run — ``WHITE_CODES[0]`` exists exactly for this)."""
    white = True
    prev = 0
    for t in cur + [width]:  # transitions are < width, so the sentinel
        _emit_run(out, t - prev, white)  # always closes the row exactly
        white = not white
        prev = t


def encode_g4(
    width: int, height: int, pixels: bytes, byte_align: bool = False
) -> bytes:
    """``width*height`` pixel bytes (0 = black, else white), row-major →
    Group 4 encoded stream, terminated by EOFB. ``byte_align`` pads each
    coded row to a byte boundary (PDF /EncodedByteAlign)."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT: empty image")
    if len(pixels) != width * height:
        raise ValueError("CCITT: pixel buffer size mismatch")
    out = _BitWriter()
    ref: List[int] = []  # imaginary all-white row above row 0
    for y in range(height):
        if byte_align:
            out.align()
        cur = _transitions(pixels[y * width : (y + 1) * width])
        _encode_row_2d(out, cur, ref, width)
        ref = cur
    out.put(_EOL)
    out.put(_EOL)  # EOFB
    return out.flush()


def encode_g3(
    width: int,
    height: int,
    pixels: bytes,
    k: int = 0,
    eol: bool = True,
    byte_align: bool = False,
) -> bytes:
    """``width*height`` pixel bytes (0 = black, else white), row-major →
    Group 3 encoded stream (T.4). ``k == 0``: pure 1-D, every row is
    EOL + Modified-Huffman runs — or, with ``eol=False``, rows packed
    back-to-back with NO framing at all (the PDF /EndOfLine-false
    default shape). ``k > 0``: 2-D extension — every EOL carries a tag
    bit (1 = next row 1-D, 0 = 2-D); rows ``y % k == 0`` are coded 1-D
    so corruption cannot propagate further than ``k`` rows (EOLs are
    mandatory: the tag bit rides on them). Ends with RTC (six EOLs)
    when framed. ``byte_align`` pads so each EOL (or, unframed, each
    row) starts on a byte boundary (PDF /EncodedByteAlign)."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT: empty image")
    if len(pixels) != width * height:
        raise ValueError("CCITT: pixel buffer size mismatch")
    if k < 0:
        raise ValueError("CCITT: G3 k must be >= 0 (use encode_g4 for MMR)")
    if k > 0 and not eol:
        raise ValueError("CCITT: G3 2-D needs EOL framing for its tag bits")
    out = _BitWriter()
    ref: List[int] = []
    for y in range(height):
        one_d = k == 0 or y % k == 0
        if byte_align:
            out.align()
        if eol:
            out.put(_EOL)
            if k > 0:
                out.put("1" if one_d else "0")
        cur = _transitions(pixels[y * width : (y + 1) * width])
        if one_d:
            _encode_row_1d(out, cur, width)
        else:
            _encode_row_2d(out, cur, ref, width)
        ref = cur
    if eol:
        for _ in range(6):  # RTC
            out.put(_EOL)
            if k > 0:
                out.put("1")
    return out.flush()


def _read_run(br: _BitReader, white: bool) -> int:
    table = _WHITE_DEC if white else _BLACK_DEC
    total = 0
    while True:
        v = br.code(table, "white run" if white else "black run")
        total += v
        if v < 64:  # terminating code (0..63) ends the run
            return total
        # makeup (multiple of 64): a terminating code must follow


def _decode_row_2d(br: _BitReader, ref: List[int], columns: int) -> List[int]:
    """Decode one 2-D-coded row into its transition list (T.6 §2.2 —
    shared verbatim by Group 4 and Group 3 2-D rows)."""
    cur: List[int] = []
    a0 = -1
    color_white = True
    while a0 < columns:
        mode = br.code(_MODE_DEC, "mode")
        if mode == "EOL":
            raise ValueError("CCITT: premature EOL/EOFB inside image")
        if mode == "P":
            _b1, b2 = _b1_b2(ref, a0, color_white, columns)
            a0 = b2
        elif mode == "H":
            r1 = _read_run(br, color_white)
            r2 = _read_run(br, not color_white)
            base = a0 if a0 > 0 else 0
            a1 = base + r1
            a2 = a1 + r2
            if a2 > columns:
                raise ValueError("CCITT: horizontal run overflows row")
            if a1 <= a0:  # transitions must be strictly increasing
                raise ValueError("CCITT: non-monotone horizontal run")
            if a1 < columns:
                if a2 <= a1:  # a zero second run is only legal at the
                    raise ValueError(  # right edge (both runs hit width)
                        "CCITT: non-monotone horizontal run"
                    )
                cur.append(a1)
                if a2 < columns:
                    cur.append(a2)
            a0 = a2
        else:  # vertical mode, offset in -3..3
            b1, _b2 = _b1_b2(ref, a0, color_white, columns)
            a1 = b1 + mode
            if a1 <= a0 or a1 > columns:
                raise ValueError("CCITT: vertical mode leaves the row")
            if a1 < columns:
                cur.append(a1)
            a0 = a1
            color_white = not color_white
    return cur


def _decode_row_1d(br: _BitReader, columns: int) -> List[int]:
    """Decode one Modified-Huffman row (T.4 §4.1) into its transition
    list: alternating white/black runs starting white, total exactly
    ``columns``."""
    cur: List[int] = []
    pos = 0
    white = True
    first = True
    while pos < columns:
        run = _read_run(br, white)
        if run == 0 and not first:
            # a zero-length run is only legal as the leading white run
            # of a row that opens black (T.4 §4.1.1)
            raise ValueError("CCITT: zero-length run mid-row")
        first = False
        pos += run
        if pos > columns:
            raise ValueError("CCITT: 1-D run overflows row")
        if pos < columns:
            cur.append(pos)
        white = not white
    return cur


def _render_row(cur: List[int], columns: int) -> bytearray:
    """Transition list → pixel bytes (0 = black, 255 = white)."""
    row = bytearray(b"\xff" * columns)
    white = True
    prev = 0
    for t in cur + [columns]:
        if not white:
            for x in range(prev, t):
                row[x] = 0
        white = not white
        prev = t
    return row


def decode_g4(
    data: bytes, columns: int, rows: int, byte_align: bool = False
) -> bytes:
    """Group 4 stream → ``columns*rows`` pixel bytes (0 = black,
    255 = white), row-major. ``byte_align`` expects each coded row on a
    byte boundary (PDF /EncodedByteAlign). Fails loud on truncation,
    coder overruns and invalid codes (the corrupt-row-skip contract
    lives in the callers, same as ``jpegcodec``)."""
    if columns <= 0 or rows <= 0:
        raise ValueError("CCITT: empty image")
    # columns/rows come from untrusted PDF /Width//Height — bound the
    # output allocation before decoding (decompression-bomb guard)
    _check_pixel_budget(columns * rows)
    br = _BitReader(data)
    out = bytearray()
    ref: List[int] = []
    for y in range(rows):
        if byte_align:
            br.align()
        cur = _decode_row_2d(br, ref, columns)
        out += _render_row(cur, columns)
        ref = cur
    return bytes(out)


def _read_eol(br: _BitReader, what: str) -> None:
    """Consume fill bits + one EOL: zero or more 0-fill bits then the
    ``000000000001`` code — i.e. at least eleven 0s ending in a 1
    (T.4 §4.1.2; fill bits are 0s, so they simply extend the zero run)."""
    zeros = 0
    while True:
        if br.bit():
            break
        zeros += 1
        if zeros > 64 * 8:  # no sane fill run is this long
            raise ValueError(f"CCITT: runaway fill before {what} EOL")
    if zeros < 11:
        raise ValueError(f"CCITT: expected EOL before {what}")


def _peek_eol(br: _BitReader) -> bool:
    """True iff an EOL (with optional fill) starts at the current bit
    position — detectable without ambiguity because no T.4 run or mode
    code begins with more than 7 zeros, while EOL is eleven. Rewinds on
    a negative answer; consumes the EOL on a positive one."""
    mark = br.pos
    try:
        _read_eol(br, "peek")
        return True
    except ValueError:
        br.pos = mark
        return False


def decode_g3(
    data: bytes, columns: int, rows: int, k: int = 0, byte_align: bool = False
) -> bytes:
    """Group 3 stream → ``columns*rows`` pixel bytes (0 = black,
    255 = white), row-major. ``k == 0`` decodes 1-D rows — WITH or
    WITHOUT EOL framing: PDF's /EndOfLine default is FALSE (ISO 32000-2
    table 11), so conforming K=0 streams may pack rows back-to-back with
    no EOLs at all; EOLs are auto-detected per row (unambiguous — no
    T.4 code starts with more than 7 zeros, EOL is eleven). ``k > 0``
    requires EOLs, because the 1-D/2-D tag bit rides on them. Fill bits
    before EOLs are absorbed; the trailing RTC is ignored (``rows``
    bounds the decode, same contract as :func:`decode_g4`).
    ``byte_align`` expects each EOL (or, unframed, each row) on a byte
    boundary (PDF /EncodedByteAlign)."""
    if columns <= 0 or rows <= 0:
        raise ValueError("CCITT: empty image")
    if k < 0:
        raise ValueError("CCITT: G3 k must be >= 0 (use decode_g4 for MMR)")
    _check_pixel_budget(columns * rows)
    br = _BitReader(data)
    out = bytearray()
    ref: List[int] = []
    for y in range(rows):
        if byte_align:
            br.align()
        if k > 0:
            _read_eol(br, f"row {y}")
            one_d = br.bit() == 1
        else:
            _peek_eol(br)  # consume optional EOL (+fill); tolerate absence
            one_d = True
        if one_d:
            cur = _decode_row_1d(br, columns)
        else:
            if y == 0:
                # T.4 §4.2.1.1: the first row after RTC/start must be 1-D
                raise ValueError("CCITT: first G3 row cannot be 2-D")
            cur = _decode_row_2d(br, ref, columns)
        out += _render_row(cur, columns)
        ref = cur
    return bytes(out)
