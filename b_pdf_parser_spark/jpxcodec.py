"""From-scratch JPEG 2000 Part-1 (ISO/IEC 15444-1 / ITU-T T.800) subset —
the PDF ``/JPXDecode`` filter (ISO 32000-2 §7.4.9), lossless profile.

What is implemented (all from the public specification):

* the **MQ arithmetic coder** (T.800 Annex C — the 47-state Qe table,
  NMPS/NLPS/SWITCH transitions, byte-stuffed renormalization), encoder
  and decoder;
* the **EBCOT Tier-1 code-block coder** (Annex D): significance
  propagation / magnitude refinement / cleanup passes over 4-row
  stripes, the 9 zero-coding contexts per subband orientation, sign
  coding with XOR bit, run-length mode with UNIFORM index, 19 contexts
  with the standard initial states;
* **Tier-2 packet headers** (Annex B.10): inclusion and
  missing-bit-plane tag trees, pass-count code, Lblock length coding,
  0xFF bit-stuffing;
* the **reversible 5/3 wavelet** (Annex F, lifting with symmetric
  extension), any number of decomposition levels;
* **codestream framing**: SOC/SIZ/COD/QCD/SOT/SOD/EOC, single tile,
  LRCP progression, one quality layer, one precinct.

Profile restrictions (enforced loudly — this decodes every stream the
sibling encoder emits, which is the oracle contract, and any conformant
stream within the same profile):

* single tile covering the image, origin 0;
* every subband fits ONE 64x64 code-block → image ≤ 128x128 at one
  decomposition level (the writer emits thumbnail-scale XObjects, same
  scale as the DCT/CCITT strata);
* 8-bit unsigned components, no subsampling, no multi-component
  transform (components coded independently), reversible path only
  (no quantization), no SOP/EPH, default code-block style.

The 5/3 + MQ path is LOSSLESS: decode(encode(x)) == x exactly, which is
what lets embedded JPX images join the exact-integer value oracles the
same way the CCITT and flat-block-JPEG strata do.

Reference analog: none — the reference repo (rager306/b-pdf-parser)
delegates everything to PyMuPDF (which links OpenJPEG) and never decodes
images at all; this module is written from the public specification.

Validation stance (stated honestly): the MQ pair is verified by
exhaustive randomized encode→decode roundtrips and the published state
table, the full codec by pixel-exact roundtrips across sizes, levels and
component counts, plus truncation/bit-flip fuzz (ValueError contract).
The official Annex-H test vectors are not available in this offline
sandbox; conformance against OTHER encoders' streams inside the profile
is therefore believed-but-unproven, and the profile gate fails loudly
rather than guessing.
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Optional, Tuple

from .mediacodec import _check_pixel_budget

__all__ = ["encode_jpx", "decode_jpx"]

# ---------------------------------------------------------------------------
# MQ coder (T.800 Annex C) — (Qe, NMPS, NLPS, SWITCH)
# ---------------------------------------------------------------------------

_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

# context ids (Annex D): 0-8 zero coding, 9-13 sign, 14-16 refinement,
# 17 run-length, 18 uniform
_N_CTX = 19
_CTX_RL = 17
_CTX_UNI = 18


def _init_ctx() -> List[List[int]]:
    """[state_index, mps] per context — T.800 D.2 initial states."""
    st = [[0, 0] for _ in range(_N_CTX)]
    st[0][0] = 4       # ZC context 0
    st[_CTX_RL][0] = 3
    st[_CTX_UNI][0] = 46
    return st


class _MQEncoder:
    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(b"\x00")  # artificial carry byte, stripped
        self.ctx = _init_ctx()

    def _byteout(self) -> None:
        o = self.out
        if o[-1] == 0xFF:
            o.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c & 0x8000000:
            o[-1] = (o[-1] + 1) & 0xFF
            self.c &= 0x7FFFFFF
            if o[-1] == 0xFF:
                o.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                o.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
        else:
            o.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8

    def encode(self, bit: int, cx: int) -> None:
        st = self.ctx[cx]
        qe, nmps, nlps, switch = _QE[st[0]]
        if bit == st[1]:  # MPS path
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            st[0] = nmps
        else:  # LPS path
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                st[1] ^= 1
            st[0] = nlps
        while True:  # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (openjpeg convention) + two byteouts
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        out = self.out
        if out[-1] == 0xFF:  # a codeword may not end with 0xFF
            del out[-1]
        if out[0] != 0:
            raise ValueError("MQ: carry escaped the code segment")
        return bytes(out[1:])


class _MQDecoder:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000
        self.ctx = _init_ctx()

    def _bytein(self) -> None:
        d, bp = self.data, self.bp
        cur = d[bp] if bp < len(d) else 0xFF
        nxt = d[bp + 1] if bp + 1 < len(d) else 0xFF
        if cur == 0xFF:
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += nxt << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        st = self.ctx[cx]
        qe, nmps, nlps, switch = _QE[st[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = st[1] ^ 1
                if switch:
                    st[1] ^= 1
                st[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return st[1]
            if self.a < qe:
                d = st[1] ^ 1
                if switch:
                    st[1] ^= 1
                st[0] = nlps
            else:
                d = st[1]
                st[0] = nmps
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


# ---------------------------------------------------------------------------
# packet-header bit I/O with 0xFF stuffing (B.10.1)
# ---------------------------------------------------------------------------


class _HdrWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0  # bits available in current byte (8, or 7 after 0xFF)
        self.cap = 8

    def bit(self, b: int) -> None:
        self.buf = (self.buf << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == self.cap:
            self.out.append(self.buf)
            self.cap = 7 if self.buf == 0xFF else 8
            self.buf = 0
            self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((value >> i) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf << (self.cap - self.nbits))
            self.buf = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)  # header may not end with 0xFF
        return bytes(self.out)


class _HdrReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPX: truncated packet header")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if self.prev_ff else 8
            if self.prev_ff and (self.buf & 0x80):
                raise ValueError("JPX: missing stuff bit after 0xFF")
            self.prev_ff = self.buf == 0xFF
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header: discard partial byte, return byte pos."""
        self.nbits = 0
        if self.prev_ff:
            # a header ending on a 0xFF byte carries a mandatory stuffed
            # 0x00 byte the body does not own
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1
            self.prev_ff = False
        return self.pos


# ---------------------------------------------------------------------------
# tag trees (B.10.2)
# ---------------------------------------------------------------------------


class _TagTree:
    """Shared encoder/decoder node state; 1-based levels from leaves up."""

    def __init__(self, w: int, h: int) -> None:
        self.levels: List[List[List[int]]] = []  # [value, low, known] grids
        self.dims: List[Tuple[int, int]] = []
        while True:
            self.dims.append((w, h))
            self.levels.append([[0, 0, 0] for _ in range(w * h)])
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2

    def _path(self, x: int, y: int) -> List[List[int]]:
        path = []
        for lvl, (w, _h) in enumerate(self.dims):
            path.append(self.levels[lvl][y * w + x])
            x, y = x // 2, y // 2
        return list(reversed(path))  # root first

    def set_value(self, x: int, y: int, v: int) -> None:
        """Encoder: set a leaf value and propagate mins upward."""
        w0, _ = self.dims[0]
        self.levels[0][y * w0 + x][0] = v
        for lvl in range(1, len(self.dims)):
            w, h = self.dims[lvl]
            wc, _ = self.dims[lvl - 1]
            for yy in range(h):
                for xx in range(w):
                    vals = []
                    for dy in (0, 1):
                        for dx in (0, 1):
                            cx, cy = 2 * xx + dx, 2 * yy + dy
                            cw, ch = self.dims[lvl - 1]
                            if cx < cw and cy < ch:
                                vals.append(self.levels[lvl - 1][cy * cw + cx][0])
                    self.levels[lvl][yy * w + xx][0] = min(vals)

    def encode(self, w: _HdrWriter, x: int, y: int, threshold: int) -> None:
        low = 0
        for node in self._path(x, y):
            if node[1] < low:
                node[1] = low
            while node[1] < threshold:
                if node[1] >= node[0]:
                    if not node[2]:
                        w.bit(1)
                        node[2] = 1
                    break
                w.bit(0)
                node[1] += 1
            low = node[1]

    def decode(self, r: _HdrReader, x: int, y: int, threshold: int) -> bool:
        """True iff leaf value < threshold (value then in node[0])."""
        low = 0
        leaf = None
        for node in self._path(x, y):
            if node[1] < low:
                node[1] = low
            while node[1] < threshold and not node[2]:
                if r.bit():
                    node[0] = node[1]
                    node[2] = 1
                else:
                    node[1] += 1
            low = node[1] if not node[2] else node[0]
            leaf = node
        return bool(leaf[2]) and leaf[0] < threshold


# ---------------------------------------------------------------------------
# Tier-1 code-block coder (Annex D)
# ---------------------------------------------------------------------------

# zero-coding context from (h, v, d) neighbor significance counts
def _zc_ctx(band: str, h: int, v: int, d: int) -> int:
    if band == "HL":  # transpose
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d  # d in {0,1} → ctx 0/1
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv  # ctx 0/1/2


_SC_TABLE = {  # (hc, vc) -> (context, xor)
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _Block:
    """Shared encoder/decoder pass machinery over one code-block."""

    def __init__(self, w: int, h: int, band: str) -> None:
        self.w, self.h, self.band = w, h, band
        n = w * h
        self.mag = [0] * n
        self.sgn = [0] * n
        self.sig = [0] * n
        self.visited = [0] * n
        self.refined = [0] * n
        self.became = [0] * n  # plane index + 1 when became significant

    def _nbhd(self, i: int) -> Tuple[int, int, int]:
        w, h = self.w, self.h
        x, y = i % w, i // w
        sig = self.sig

        def s(xx: int, yy: int) -> int:
            return sig[yy * w + xx] if 0 <= xx < w and 0 <= yy < h else 0

        hh = s(x - 1, y) + s(x + 1, y)
        vv = s(x, y - 1) + s(x, y + 1)
        dd = (s(x - 1, y - 1) + s(x + 1, y - 1)
              + s(x - 1, y + 1) + s(x + 1, y + 1))
        return hh, vv, dd

    def _sign_ctx(self, i: int) -> Tuple[int, int]:
        w, h = self.w, self.h
        x, y = i % w, i // w

        def c(xx: int, yy: int) -> int:
            if not (0 <= xx < w and 0 <= yy < h):
                return 0
            j = yy * w + xx
            if not self.sig[j]:
                return 0
            return -1 if self.sgn[j] else 1

        hc = max(-1, min(1, c(x - 1, y) + c(x + 1, y)))
        vc = max(-1, min(1, c(x, y - 1) + c(x, y + 1)))
        return _SC_TABLE[(hc, vc)]

    def _stripes(self):
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                yield x, y0, min(4, self.h - y0)


def _t1_encode(coefs: List[int], w: int, h: int, band: str) -> Tuple[bytes, int, int]:
    """Code a block of signed coefficients → (mq bytes, npasses, mb)."""
    blk = _Block(w, h, band)
    for i, v in enumerate(coefs):
        blk.mag[i] = abs(v)
        blk.sgn[i] = 1 if v < 0 else 0
    mb = max(blk.mag).bit_length() if any(blk.mag) else 0
    if mb == 0:
        return b"", 0, 0
    mq = _MQEncoder()

    def code_sig(i: int, p: int) -> None:
        bit = (blk.mag[i] >> p) & 1
        hh, vv, dd = blk._nbhd(i)
        mq.encode(bit, _zc_ctx(band, hh, vv, dd))
        if bit:
            cx, xr = blk._sign_ctx(i)
            mq.encode(blk.sgn[i] ^ xr, cx)
            blk.sig[i] = 1
            blk.became[i] = p + 1

    npasses = 0
    for p in range(mb - 1, -1, -1):
        if p != mb - 1:
            # significance propagation
            for x, y0, sh in blk._stripes():
                for dy in range(sh):
                    i = (y0 + dy) * w + x
                    if blk.sig[i]:
                        continue
                    hh, vv, dd = blk._nbhd(i)
                    if hh + vv + dd == 0:
                        continue
                    code_sig(i, p)
                    blk.visited[i] = 1
            npasses += 1
            # magnitude refinement
            for x, y0, sh in blk._stripes():
                for dy in range(sh):
                    i = (y0 + dy) * w + x
                    if not blk.sig[i] or blk.became[i] == p + 1:
                        continue
                    bit = (blk.mag[i] >> p) & 1
                    if blk.refined[i]:
                        cx = 16
                    else:
                        hh, vv, dd = blk._nbhd(i)
                        cx = 15 if hh + vv + dd else 14
                    mq.encode(bit, cx)
                    blk.refined[i] = 1
            npasses += 1
        # cleanup
        for x, y0, sh in blk._stripes():
            dy = 0
            if sh == 4:
                all_skip = True
                for k in range(4):
                    i = (y0 + k) * w + x
                    if blk.sig[i] or blk.visited[i]:
                        all_skip = False
                        break
                    hh, vv, dd = blk._nbhd(i)
                    if hh + vv + dd:
                        all_skip = False
                        break
                if all_skip:
                    bits = [(blk.mag[(y0 + k) * w + x] >> p) & 1 for k in range(4)]
                    if not any(bits):
                        mq.encode(0, _CTX_RL)
                        continue
                    mq.encode(1, _CTX_RL)
                    r = bits.index(1)
                    mq.encode((r >> 1) & 1, _CTX_UNI)
                    mq.encode(r & 1, _CTX_UNI)
                    i = (y0 + r) * w + x
                    cx, xr = blk._sign_ctx(i)
                    mq.encode(blk.sgn[i] ^ xr, cx)
                    blk.sig[i] = 1
                    blk.became[i] = p + 1
                    dy = r + 1
            for k in range(dy, sh):
                i = (y0 + k) * w + x
                if blk.sig[i] or blk.visited[i]:
                    continue
                code_sig(i, p)
        npasses += 1
        blk.visited = [0] * (w * h)
    return mq.flush(), npasses, mb


def _t1_decode(data: bytes, w: int, h: int, band: str, mb: int,
               npasses: int) -> List[int]:
    """Inverse of :func:`_t1_encode` — same pass walk, MQ decoding."""
    blk = _Block(w, h, band)
    mq = _MQDecoder(data)
    passes_done = 0
    p = mb - 1

    def decode_sig(i: int, p: int) -> None:
        hh, vv, dd = blk._nbhd(i)
        if mq.decode(_zc_ctx(band, hh, vv, dd)):
            cx, xr = blk._sign_ctx(i)
            blk.sgn[i] = mq.decode(cx) ^ xr
            blk.mag[i] |= 1 << p
            blk.sig[i] = 1
            blk.became[i] = p + 1

    while passes_done < npasses and p >= 0:
        if p != mb - 1:
            for x, y0, sh in blk._stripes():
                for dy in range(sh):
                    i = (y0 + dy) * w + x
                    if blk.sig[i]:
                        continue
                    hh, vv, dd = blk._nbhd(i)
                    if hh + vv + dd == 0:
                        continue
                    decode_sig(i, p)
                    blk.visited[i] = 1
            passes_done += 1
            if passes_done >= npasses:
                break
            for x, y0, sh in blk._stripes():
                for dy in range(sh):
                    i = (y0 + dy) * w + x
                    if not blk.sig[i] or blk.became[i] == p + 1:
                        continue
                    if blk.refined[i]:
                        cx = 16
                    else:
                        hh, vv, dd = blk._nbhd(i)
                        cx = 15 if hh + vv + dd else 14
                    if mq.decode(cx):
                        blk.mag[i] |= 1 << p
                    blk.refined[i] = 1
            passes_done += 1
            if passes_done >= npasses:
                break
        for x, y0, sh in blk._stripes():
            dy = 0
            if sh == 4:
                all_skip = True
                for k in range(4):
                    i = (y0 + k) * w + x
                    if blk.sig[i] or blk.visited[i]:
                        all_skip = False
                        break
                    hh, vv, dd = blk._nbhd(i)
                    if hh + vv + dd:
                        all_skip = False
                        break
                if all_skip:
                    if not mq.decode(_CTX_RL):
                        continue
                    r = (mq.decode(_CTX_UNI) << 1) | mq.decode(_CTX_UNI)
                    i = (y0 + r) * w + x
                    cx, xr = blk._sign_ctx(i)
                    blk.sgn[i] = mq.decode(cx) ^ xr
                    blk.mag[i] |= 1 << p
                    blk.sig[i] = 1
                    blk.became[i] = p + 1
                    dy = r + 1
            for k in range(dy, sh):
                i = (y0 + k) * w + x
                if blk.sig[i] or blk.visited[i]:
                    continue
                decode_sig(i, p)
        passes_done += 1
        blk.visited = [0] * (w * h)
        p -= 1
    return [(-m if s else m)
            for m, s in zip(blk.mag, blk.sgn)]


# ---------------------------------------------------------------------------
# reversible 5/3 wavelet (Annex F) — 1D lifting with symmetric extension
# ---------------------------------------------------------------------------


def _mirror(i: int, n: int) -> int:
    if n == 1:
        return 0
    period = 2 * (n - 1)
    i %= period
    if i < 0:
        i += period
    return i if i < n else period - i


def _fwd53(x: List[int]) -> Tuple[List[int], List[int]]:
    # symmetric extension mirrors in the FULL-signal index domain (the
    # mirror of an odd index is odd and of an even index even, so the
    # extended detail/approx samples are d[m//2] / even[m//2])
    n = len(x)
    if n == 1:
        return list(x), []
    nd = n // 2
    ns = n - nd

    def xe(i: int) -> int:
        return x[_mirror(i, n)]

    d = [x[2 * k + 1] - ((xe(2 * k) + xe(2 * k + 2)) >> 1) for k in range(nd)]

    def de(k: int) -> int:  # detail at full index 2k+1, mirrored
        return d[_mirror(2 * k + 1, n) // 2]

    s = [x[2 * k] + ((de(k - 1) + de(k) + 2) >> 2) for k in range(ns)]
    return s, d


def _inv53(s: List[int], d: List[int]) -> List[int]:
    ns, nd = len(s), len(d)
    n = ns + nd
    if n == 1:
        return list(s)

    def de(k: int) -> int:
        return d[_mirror(2 * k + 1, n) // 2]

    ev = [s[k] - ((de(k - 1) + de(k) + 2) >> 2) for k in range(ns)]

    def ee(k: int) -> int:  # even sample at full index 2k, mirrored
        return ev[_mirror(2 * k, n) // 2]

    x = [0] * n
    for k in range(ns):
        x[2 * k] = ev[k]
    for k in range(nd):
        x[2 * k + 1] = d[k] + ((ee(k) + ee(k + 1)) >> 1)
    return x


def _dwt2_fwd(m: List[List[int]]) -> Dict[str, List[List[int]]]:
    """One 2D level: horizontal then vertical split → LL/HL/LH/HH."""
    lo_rows, hi_rows = [], []
    for row in m:
        s, d = _fwd53(row)
        lo_rows.append(s)
        hi_rows.append(d)

    def vsplit(cols_mat: List[List[int]]):
        if not cols_mat or not cols_mat[0]:
            return [], []
        w = len(cols_mat[0])
        los, his = [], []
        for c in range(w):
            s, d = _fwd53([r[c] for r in cols_mat])
            los.append(s)
            his.append(d)
        lo = [[los[c][r] for c in range(w)] for r in range(len(los[0]))]
        hi = [[his[c][r] for c in range(w)] for r in range(len(his[0]))] \
            if his and his[0] else []
        return lo, hi

    ll, lh = vsplit(lo_rows)
    hl, hh = vsplit(hi_rows)
    return {"LL": ll, "HL": hl, "LH": lh, "HH": hh}


def _dwt2_inv(bands: Dict[str, List[List[int]]], w: int, h: int) -> List[List[int]]:
    wl, wh = (w + 1) // 2, w // 2
    hl_, hh_ = (h + 1) // 2, h // 2

    def vmerge(lo: List[List[int]], hi: List[List[int]], width: int):
        if not width:
            return []
        out_cols = []
        for c in range(width):
            s = [r[c] for r in lo]
            d = [r[c] for r in hi] if hi else []
            out_cols.append(_inv53(s, d))
        return [[out_cols[c][r] for c in range(width)]
                for r in range(len(out_cols[0]))]

    lo_rows = vmerge(bands["LL"], bands["LH"], wl)
    hi_rows = vmerge(bands["HL"], bands["HH"], wh)
    out = []
    for r in range(h):
        s = lo_rows[r] if lo_rows else []
        d = hi_rows[r] if hi_rows else []
        out.append(_inv53(s, d))
    return out


# ---------------------------------------------------------------------------
# codestream (Annex A) — markers, packets, public API
# ---------------------------------------------------------------------------

_GUARD = 2
_MAX_CB = 64  # one 64x64 code-block per subband (profile gate)


def _band_dims(w: int, h: int, levels: int) -> List[Tuple[int, str, int, int]]:
    """(resolution, band, bw, bh) in packet order for one component."""
    dims = []
    ws, hs = [w], [h]
    for _ in range(levels):
        ws.append((ws[-1] + 1) // 2)
        hs.append((hs[-1] + 1) // 2)
    dims.append((0, "LL", ws[levels], hs[levels]))
    for r in range(1, levels + 1):
        lev = levels - r + 1  # decomposition level of these subbands
        pw, ph = ws[lev - 1], hs[lev - 1]
        dims.append((r, "HL", pw // 2, (ph + 1) // 2))
        dims.append((r, "LH", (pw + 1) // 2, ph // 2))
        dims.append((r, "HH", pw // 2, ph // 2))
    return dims


def _code_npasses(wtr: _HdrWriter, n: int) -> None:
    if n == 1:
        wtr.bit(0)
    elif n == 2:
        wtr.bits(0b10, 2)
    elif n <= 5:
        wtr.bits(0b11, 2)
        wtr.bits(n - 3, 2)
    elif n <= 36:
        wtr.bits(0b1111, 4)
        wtr.bits(n - 6, 5)
    elif n <= 164:
        wtr.bits(0b111111111, 9)
        wtr.bits(n - 37, 7)
    else:
        raise ValueError("JPX: pass count out of range")


def _read_npasses(rdr: _HdrReader) -> int:
    if not rdr.bit():
        return 1
    if not rdr.bit():
        return 2
    v = rdr.bits(2)
    if v != 3:
        return 3 + v
    v = rdr.bits(5)
    if v != 31:
        return 6 + v
    return 37 + rdr.bits(7)


def encode_jpx(width: int, height: int, ncomp: int, samples: bytes,
               levels: int = 1) -> bytes:
    """Encode 8-bit interleaved samples as a lossless JPEG 2000
    codestream (profile in the module docstring)."""
    if width <= 0 or height <= 0 or ncomp not in (1, 3):
        raise ValueError("JPX: bad dimensions/components")
    if len(samples) != width * height * ncomp:
        raise ValueError("JPX: sample count mismatch")
    if not 0 <= levels <= 5:
        raise ValueError("JPX: levels out of range")
    for _r, _b, bw, bh in _band_dims(width, height, levels):
        if bw > _MAX_CB or bh > _MAX_CB:
            raise ValueError(
                "JPX profile: every subband must fit one 64x64 code-block"
            )
    out = bytearray()
    out += b"\xff\x4f"  # SOC
    # SIZ
    siz = struct.pack(">HIIIIIIIIH", 0, width, height, 0, 0, width, height,
                      0, 0, ncomp)
    siz += b"".join(struct.pack(">BBB", 7, 1, 1) for _ in range(ncomp))
    out += b"\xff\x51" + struct.pack(">H", 2 + len(siz)) + siz
    # COD: Scod=0; SGcod: LRCP, 1 layer, no MCT; SPcod: levels, 64x64, 5/3
    cod = struct.pack(">BBHBBBBBB", 0, 0, 1, 0, levels, 4, 4, 0, 1)
    out += b"\xff\x52" + struct.pack(">H", 2 + len(cod)) + cod

    # transform all components, choose per-subband exponents from data
    band_list = _band_dims(width, height, levels)
    comps_bands: List[Dict[Tuple[int, str], List[List[int]]]] = []
    for c in range(ncomp):
        plane = [[samples[(y * width + x) * ncomp + c] - 128
                  for x in range(width)] for y in range(height)]
        cur = plane
        bands: Dict[Tuple[int, str], List[List[int]]] = {}
        for lev in range(1, levels + 1):
            b = _dwt2_fwd(cur)
            r = levels - lev + 1
            bands[(r, "HL")] = b["HL"]
            bands[(r, "LH")] = b["LH"]
            bands[(r, "HH")] = b["HH"]
            cur = b["LL"]
        bands[(0, "LL")] = cur
        comps_bands.append(bands)
    # QCD exponents: max magnitude across components per subband slot
    exps = []
    for r, bname, bw, bh in band_list:
        mx = 0
        for c in range(ncomp):
            for row in comps_bands[c][(r, bname)]:
                for v in row:
                    mx = max(mx, abs(v))
        mb_needed = max(1, mx.bit_length())
        eps = max(0, mb_needed - _GUARD + 1)
        if eps > 31:
            raise ValueError("JPX: coefficient range exceeds QCD exponent")
        exps.append(eps)
    qcd = bytes([_GUARD << 5]) + bytes(e << 3 for e in exps)
    out += b"\xff\x5c" + struct.pack(">H", 2 + len(qcd)) + qcd

    # tile data: packets in LRCP (1 layer → res outer, component inner)
    body = bytearray()
    for r in range(levels + 1):
        for c in range(ncomp):
            sub = [bd for bd in band_list if bd[0] == r]
            wtr = _HdrWriter()
            datas = []
            any_included = any(
                any(any(row) for row in comps_bands[c][(rr, bn)])
                for rr, bn, _w, _h in sub
            )
            wtr.bit(1 if any_included else 0)
            if any_included:
                for rr, bname, bw, bh in sub:
                    grid = comps_bands[c][(rr, bname)]
                    coefs = [v for row in grid for v in row]
                    data, npasses, mbact = _t1_encode(
                        coefs, bw or 1, bh or 1, bname
                    ) if bw and bh else (b"", 0, 0)
                    slot = band_list.index((rr, bname, bw, bh))
                    mb_band = exps[slot] + _GUARD - 1
                    inc = _TagTree(1, 1)
                    imsb = _TagTree(1, 1)
                    if not bw or not bh or mbact == 0:
                        inc.set_value(0, 0, 1)  # not included in layer 0
                        inc.encode(wtr, 0, 0, 1)
                        continue
                    if mbact > mb_band:
                        raise ValueError("JPX: magnitude exceeds Mb")
                    inc.set_value(0, 0, 0)
                    inc.encode(wtr, 0, 0, 1)
                    zbp = mb_band - mbact
                    imsb.set_value(0, 0, zbp)
                    k = 1
                    while True:
                        imsb.encode(wtr, 0, 0, k)
                        if k > zbp:
                            break
                        k += 1
                    _code_npasses(wtr, npasses)
                    # Lblock length coding
                    lblock = 3
                    nbits = max(1, len(data).bit_length())
                    avail = lblock + int(math.log2(npasses))
                    while avail < nbits:
                        wtr.bit(1)
                        lblock += 1
                        avail += 1
                    wtr.bit(0)
                    wtr.bits(len(data), avail)
                    datas.append(data)
            body += wtr.flush()
            for d in datas:
                body += d

    psot = 12 + 2 + len(body)  # SOT(12) + SOD marker(2) + body
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + body
    out += b"\xff\xd9"  # EOC
    return bytes(out)


def _expect(cond: bool, what: str) -> None:
    if not cond:
        raise ValueError(f"JPX: {what}")


def decode_jpx(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode a codestream within the profile → (w, h, ncomp, samples).

    Fails loud (ValueError) on truncation, unknown markers in the main
    header, profile violations, and coder overruns — the corrupt-row
    contract of every decoder in this repo."""
    try:
        return _decode_jpx(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"JPX: malformed stream ({type(e).__name__})") from e


def _decode_jpx(data: bytes) -> Tuple[int, int, int, bytes]:
    _expect(data[:2] == b"\xff\x4f", "missing SOC")
    pos = 2
    width = height = ncomp = None
    levels = None
    exps: Optional[List[int]] = None
    body = None
    while pos < len(data):
        _expect(data[pos] == 0xFF, "marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOC
            break
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + ln]
        _expect(len(seg) == ln - 2, "truncated marker segment")
        if marker == 0x51:  # SIZ
            (_rsiz, width, height, xo, yo, xt, yt, xto, yto,
             ncomp) = struct.unpack(">HIIIIIIIIH", seg[:36])
            _expect(xo == yo == xto == yto == 0, "profile: origin 0")
            _expect(xt == width and yt == height, "profile: single tile")
            _expect(ncomp in (1, 3), "profile: 1 or 3 components")
            _check_pixel_budget(width * height * ncomp)
            for c in range(ncomp):
                ss, xr, yr = seg[36 + 3 * c:39 + 3 * c]
                _expect(ss == 7, "profile: 8-bit unsigned")
                _expect(xr == 1 and yr == 1, "profile: no subsampling")
        elif marker == 0x52:  # COD
            scod, prog, layers, mct, lev, xcb, ycb, style, xform = (
                struct.unpack(">BBHBBBBBB", seg[:10]))
            _expect(scod == 0 and prog == 0 and layers == 1 and mct == 0,
                    "profile: LRCP, 1 layer, no MCT")
            _expect(style == 0 and xform == 1, "profile: default style, 5/3")
            levels = lev
        elif marker == 0x5C:  # QCD
            _expect(seg[0] >> 5 == _GUARD and seg[0] & 0x1F == 0,
                    "profile: reversible, guard 2")
            exps = [b >> 3 for b in seg[1:]]
        elif marker == 0x90:  # SOT
            _expect(None not in (width, levels) and exps is not None,
                    "SOT before main header complete")
            psot = struct.unpack(">I", seg[2:6])[0]
            sod_at = pos + ln
            _expect(data[sod_at:sod_at + 2] == b"\xff\x93", "missing SOD")
            end = (pos - 2) + psot if psot else len(data) - 2
            body = data[sod_at + 2:end]
            pos = end
            continue
        else:
            _expect(False, f"unsupported marker 0x{marker:02x}")
        pos += ln
    _expect(body is not None, "no tile data")
    band_list = _band_dims(width, height, levels)
    _expect(len(exps) == len(band_list), "QCD subband count mismatch")
    for _r, _b, bw, bh in band_list:
        _expect(bw <= _MAX_CB and bh <= _MAX_CB, "profile: one code-block")

    comps_bands: List[Dict[Tuple[int, str], List[List[int]]]] = [
        {} for _ in range(ncomp)
    ]
    bpos = 0
    for r in range(levels + 1):
        for c in range(ncomp):
            sub = [bd for bd in band_list if bd[0] == r]
            rdr = _HdrReader(body, bpos)
            blocks = []  # (band entry, mb, npasses, length)
            if rdr.bit():
                for rr, bname, bw, bh in sub:
                    inc = _TagTree(1, 1)
                    if not bw or not bh:
                        included = inc.decode(rdr, 0, 0, 1)
                        _expect(not included, "empty subband included")
                        blocks.append(((rr, bname, bw, bh), 0, 0, 0))
                        continue
                    if not inc.decode(rdr, 0, 0, 1):
                        blocks.append(((rr, bname, bw, bh), 0, 0, 0))
                        continue
                    imsb = _TagTree(1, 1)
                    k = 1
                    while not imsb.decode(rdr, 0, 0, k):
                        k += 1
                    zbp = imsb.levels[0][0][0]
                    slot = band_list.index((rr, bname, bw, bh))
                    mb_band = exps[slot] + _GUARD - 1
                    mb = mb_band - zbp
                    _expect(mb >= 1, "zero bitplanes exceed Mb")
                    npasses = _read_npasses(rdr)
                    lblock = 3
                    while rdr.bit():
                        lblock += 1
                    nlen = lblock + int(math.log2(npasses))
                    length = rdr.bits(nlen)
                    blocks.append(((rr, bname, bw, bh), mb, npasses, length))
            else:
                blocks = [((rr, bname, bw, bh), 0, 0, 0)
                          for rr, bname, bw, bh in sub]
            bpos = rdr.align()
            for (rr, bname, bw, bh), mb, npasses, length in blocks:
                if mb == 0:
                    if bw and bh:
                        comps_bands[c][(rr, bname)] = [
                            [0] * bw for _ in range(bh)
                        ]
                    else:
                        comps_bands[c][(rr, bname)] = []
                    continue
                _expect(bpos + length <= len(body), "truncated packet body")
                coefs = _t1_decode(body[bpos:bpos + length], bw, bh, bname,
                                   mb, npasses)
                bpos += length
                comps_bands[c][(rr, bname)] = [
                    coefs[y * bw:(y + 1) * bw] for y in range(bh)
                ]

    # inverse transform
    ws, hs = [width], [height]
    for _ in range(levels):
        ws.append((ws[-1] + 1) // 2)
        hs.append((hs[-1] + 1) // 2)
    out = bytearray(width * height * ncomp)
    for c in range(ncomp):
        cur = comps_bands[c][(0, "LL")]
        for r in range(1, levels + 1):
            lev = levels - r + 1
            pw, ph = ws[lev - 1], hs[lev - 1]
            cur = _dwt2_inv(
                {"LL": cur, "HL": comps_bands[c][(r, "HL")],
                 "LH": comps_bands[c][(r, "LH")],
                 "HH": comps_bands[c][(r, "HH")]}, pw, ph)
        for y in range(height):
            row = cur[y]
            for x in range(width):
                v = row[x] + 128
                out[(y * width + x) * ncomp + c] = 0 if v < 0 else (
                    255 if v > 255 else v)
    return width, height, ncomp, bytes(out)
