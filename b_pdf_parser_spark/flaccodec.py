"""FLAC (Free Lossless Audio Codec) — encoder and decoder from scratch,
from the public format spec (RFC 9639 / the xiph.org FLAC format
documents): STREAMINFO metadata, frame headers with CRC-8, UTF-8-coded
frame numbers, subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC,
Rice-coded residual partitions (both 4- and 5-bit parameter variants,
including escape partitions), stereo decorrelation (independent,
left/side, right/side, mid/side), frame CRC-16, and the STREAMINFO MD5
of the raw audio — which this decoder VERIFIES, so a decode that drifts
by even one sample fails loud instead of returning plausible garbage.

FLAC is lossless, so the corpus value oracle is simply the generating
sample formula, while every decode-path hazard — Rice parameters,
partition orders, predictor orders, LPC coefficients/shift, channel
decorrelation — rotates freely underneath it (the same tractable-slice
economics as the other lossless codecs here, without even needing a
slice).

The encoder is corpus-grade, not ratio-chasing: fixed blocksize, one
subframe strategy per call (chosen by the caller so the corpus can
rotate them deterministically), Rice parameter picked by a simple mean
heuristic. The decoder accepts the full scope above and rejects what it
does not implement (bps other than 8/16, variable blocksize strategy)
with ValueError.

Reference parity note: the reference pipeline (SURVEY.md §2) has no
audio handling; the contract is the public spec.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional, Sequence, Tuple

from .mediacodec import _check_pixel_budget, _fail_loud

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self._acc = 0
        self._n = 0

    def bits(self, nbits: int) -> int:
        while self._n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def sbits(self, nbits: int) -> int:
        v = self.bits(nbits)
        return v - (1 << nbits) if nbits and v >> (nbits - 1) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("FLAC: runaway unary code")
        return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes((n,))
    out = []
    nbytes = 2
    # an nbytes-long code carries (7 - nbytes) + 6*(nbytes-1) payload bits
    while n >= (1 << (5 * nbytes + 1)):
        nbytes += 1
        if nbytes > 6:
            raise ValueError("FLAC: frame number too large")
    head = (0xFF00 >> nbytes) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(head | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: malformed coded number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: malformed coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_residual(bw: _BitWriter, res: Sequence[int], order: int,
                    blocksize: int, partition_order: int) -> None:
    # a short final frame may not divide into the requested partitions
    # (or would leave a negative first partition) — clamp, don't fail
    while partition_order and (
        blocksize % (1 << partition_order)
        or blocksize >> partition_order < order
    ):
        partition_order -= 1
    bw.write(0, 2)  # method 00: 4-bit Rice
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        part = res[idx : idx + cnt]
        idx += cnt
        # mean-based Rice parameter heuristic
        mean = (sum(_zigzag(v) for v in part) // max(len(part), 1)) if part else 0
        k = 0
        while (1 << (k + 1)) < mean + 1 and k < 14:
            k += 1
        bw.write(k, 4)
        for v in part:
            u = _zigzag(v)
            bw.write_unary(u >> k)
            bw.write(u, k)


def _read_residual(br: _BitReader, order: int, blocksize: int) -> List[int]:
    method = br.bits(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    partition_order = br.bits(4)
    nparts = 1 << partition_order
    # a zero-sample FIRST partition (order == blocksize >> partition_order)
    # is legal — only a NEGATIVE first partition is malformed
    if blocksize % nparts or blocksize // nparts < order:
        raise ValueError("FLAC: invalid partition order")
    res: List[int] = []
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        k = br.bits(plen)
        if k == escape:
            n = br.bits(5)
            res.extend(br.sbits(n) if n else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.unary()
                u = (q << k) | br.bits(k)
                res.append((u >> 1) if u % 2 == 0 else -((u + 1) >> 1))
    return res


def encode_flac(
    rate: int,
    channels: int,
    samples: Sequence[int],
    *,
    blocksize: int = 96,
    subframe: str = "fixed2",
    stereo: str = "indep",
    partition_order: int = 0,
    lpc_coefs: Optional[Sequence[int]] = None,
    lpc_shift: int = 1,
) -> bytes:
    """Interleaved 16-bit samples → FLAC. ``subframe`` ∈ fixed0/fixed1/
    fixed2/fixed3/fixed4/verbatim (rotated by the corpus, not chosen
    adaptively) or ``lpc`` with explicit quantized ``lpc_coefs``/
    ``lpc_shift``; ``stereo`` ∈ indep/left_side/mid_side (2-channel
    input only)."""
    if channels not in (1, 2):
        raise ValueError("FLAC encoder: 1 or 2 channels")
    if len(samples) % channels:
        raise ValueError("FLAC encoder: ragged channel data")
    nsamples = len(samples) // channels
    if any(not -32768 <= s <= 32767 for s in samples):
        raise ValueError("FLAC encoder: sample out of int16 range")

    md5 = hashlib.md5(
        b"".join(struct.pack("<h", s) for s in samples)
    ).digest()
    out = bytearray(b"fLaC")
    # STREAMINFO (type 0), last metadata block
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bps-1 = 15
    si.write(nsamples, 36)
    body = bytes(si.out) + md5
    out += bytes((0x80,)) + struct.pack(">I", len(body))[1:] + body

    chans = [list(samples[c::channels]) for c in range(channels)]

    def encode_subframe(bw: _BitWriter, s: List[int], bps: int) -> None:
        if subframe == "verbatim":
            bw.write(0, 1)
            bw.write(1, 6)
            bw.write(0, 1)
            for v in s:
                bw.write(v, bps)
            return
        if subframe == "constant" or len(set(s)) == 1:
            bw.write(0, 1)
            bw.write(0, 6)
            bw.write(0, 1)
            bw.write(s[0], bps)
            return
        if subframe == "lpc":
            coefs = list(lpc_coefs or (2, -1))
            order = len(coefs)
            if len(s) <= order:  # short final frame: verbatim fallback
                bw.write(0, 1)
                bw.write(1, 6)
                bw.write(0, 1)
                for v in s:
                    bw.write(v, bps)
                return
            prec = max(max(abs(c) for c in coefs).bit_length() + 1, 2)
            bw.write(0, 1)
            bw.write(0x20 | (order - 1), 6)
            bw.write(0, 1)
            for v in s[:order]:
                bw.write(v, bps)
            bw.write(prec - 1, 4)
            bw.write(lpc_shift, 5)
            for c in coefs:
                bw.write(c, prec)
            res = [
                s[i] - (sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
                        >> lpc_shift)
                for i in range(order, len(s))
            ]
            _write_residual(bw, res, order, len(s), partition_order)
            return
        # a short FINAL frame cannot carry the requested order (the spec
        # needs blocksize > order): clamp per block, like real encoders
        order = min(int(subframe[-1]), len(s) - 1)
        coefs = _FIXED_COEFS[order]
        bw.write(0, 1)
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write(v, bps)
        res = [
            s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(s))
        ]
        _write_residual(bw, res, order, len(s), partition_order)

    frame_no = 0
    pos = 0
    # a zero-sample stream encodes as STREAMINFO with no frames at all
    # (total=0, md5 of empty input) — the decoder accepts that directly
    while pos < nsamples:
        bs = min(blocksize, nsamples - pos)
        fb = _BitWriter()
        fb.write(0b11111111111110, 14)
        fb.write(0, 1)  # reserved
        fb.write(0, 1)  # fixed-blocksize strategy
        fb.write(0b0111, 4)  # blocksize: 16-bit value follows header
        fb.write(0b0000, 4)  # sample rate: from STREAMINFO
        if channels == 2 and stereo == "left_side":
            fb.write(0b1000, 4)
        elif channels == 2 and stereo == "mid_side":
            fb.write(0b1010, 4)
        else:
            fb.write(channels - 1, 4)
        fb.write(0b100, 3)  # 16 bps
        fb.write(0, 1)  # reserved
        header = bytes(fb.out)
        header += _utf8_number(frame_no)
        header += struct.pack(">H", bs - 1)
        header += bytes((_crc8(header),))

        body_bw = _BitWriter()
        block = [ch[pos : pos + bs] for ch in chans]
        if channels == 2 and stereo == "left_side":
            side = [l - r for l, r in zip(block[0], block[1])]
            encode_subframe(body_bw, block[0], 16)
            encode_subframe(body_bw, side, 17)
        elif channels == 2 and stereo == "mid_side":
            mid = [(l + r) >> 1 for l, r in zip(block[0], block[1])]
            side = [l - r for l, r in zip(block[0], block[1])]
            encode_subframe(body_bw, mid, 16)
            encode_subframe(body_bw, side, 17)
        else:
            for ch_block in block:
                encode_subframe(body_bw, ch_block, 16)
        body_bw.align()
        frame = header + bytes(body_bw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        pos += bs
        frame_no += 1
    return bytes(out)


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> List[int]:
    if br.bits(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = br.bits(6)
    wasted = 0
    if br.bits(1):  # wasted-bits flag: unary count - 1
        wasted = br.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        s = [br.sbits(bps)] * bs
    elif ftype == 1:  # VERBATIM
        s = [br.sbits(bps) for _ in range(bs)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        s = [br.sbits(bps) for _ in range(order)]
        res = _read_residual(br, order, bs)
        coefs = _FIXED_COEFS[order]
        for r in res:
            s.append(r + sum(c * s[-1 - j] for j, c in enumerate(coefs)))
    elif ftype >= 32:  # LPC, order = low 5 bits + 1
        order = (ftype & 0x1F) + 1
        s = [br.sbits(bps) for _ in range(order)]
        prec = br.bits(4)
        if prec == 15:
            raise ValueError("FLAC: invalid LPC precision")
        prec += 1
        shift = br.sbits(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        res = _read_residual(br, order, bs)
        for r in res:
            s.append(r + (sum(c * s[-1 - j] for j, c in enumerate(coefs))
                          >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        s = [v << wasted for v in s]
    return s


@_fail_loud
def decode_flac(data: bytes) -> Tuple[int, int, List[int]]:
    """→ (sample_rate, channels, interleaved signed samples), with the
    frame CRC-8/CRC-16 and the STREAMINFO MD5 all verified — a decode
    that differs from the encoder's input in ANY sample fails loud."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC marker)")
    pos = 4
    rate = channels = bps = None
    total = 0
    md5 = b"\x00" * 16
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            if ln < 34:
                raise ValueError("FLAC: short STREAMINFO")
            br = _BitReader(body, 0)
            br.bits(16)  # min blocksize
            br.bits(16)  # max blocksize
            br.bits(24)
            br.bits(24)
            rate = br.bits(20)
            channels = br.bits(3) + 1
            bps = br.bits(5) + 1
            total = br.bits(36)
            md5 = body[18:34]
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type")
        pos += 4 + ln
    if rate is None:
        raise ValueError("FLAC: no STREAMINFO")
    if bps not in (8, 16):
        raise ValueError(f"FLAC: {bps}-bit streams unsupported")
    _check_pixel_budget(max(total, 1) * channels)

    chans: List[List[int]] = [[] for _ in range(channels)]
    decoded = 0
    while decoded < total:
        frame_start = pos
        br = _BitReader(data, pos)
        if br.bits(14) != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        if br.bits(1):
            raise ValueError("FLAC: reserved sync bit set")
        if br.bits(1):
            raise ValueError("FLAC: variable-blocksize strategy unsupported")
        bs_code = br.bits(4)
        rate_code = br.bits(4)
        chan_code = br.bits(4)
        bps_code = br.bits(3)
        if br.bits(1):
            raise ValueError("FLAC: reserved frame header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved blocksize code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.bits(8) + 1
        elif bs_code == 7:
            bs = br.bits(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 12:
            br.bits(8)
        elif rate_code in (13, 14):
            br.bits(16)
        elif rate_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        hdr_end = br.pos  # header is byte-aligned here by construction
        if _crc8(data[frame_start:hdr_end]) != br.bits(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(bps_code, bps)
        if fbps != bps:
            raise ValueError("FLAC: frame/stream bps mismatch")

        if chan_code < 8:
            if chan_code + 1 != channels:
                raise ValueError("FLAC: frame/stream channel mismatch")
            sub = [_decode_subframe(br, bs, bps) for _ in range(channels)]
            block = sub
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC: decorrelated frame in non-stereo stream")
            if chan_code == 8:  # left/side
                left = _decode_subframe(br, bs, bps)
                side = _decode_subframe(br, bs, bps + 1)
                block = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(br, bs, bps + 1)
                right = _decode_subframe(br, bs, bps)
                block = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(br, bs, bps)
                side = _decode_subframe(br, bs, bps + 1)
                block = [
                    [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
                    [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
                ]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        br.align()
        crc_end = br.pos
        if _crc16(data[frame_start:crc_end]) != br.bits(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = br.pos
        for c in range(channels):
            chans[c].extend(block[c])
        decoded += bs
    if decoded != total:
        raise ValueError(f"FLAC: decoded {decoded} of {total} samples")
    out: List[int] = []
    for i in range(decoded):
        for c in range(channels):
            out.append(chans[c][i])
    if md5 != b"\x00" * 16:
        width = {8: "<b", 16: "<h"}[bps]
        calc = hashlib.md5(
            b"".join(struct.pack(width, s) for s in out)
        ).digest()
        if calc != md5:
            raise ValueError("FLAC: STREAMINFO MD5 mismatch")
    return rate, channels, out
