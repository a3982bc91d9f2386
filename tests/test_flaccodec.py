"""From-scratch FLAC: lossless roundtrips across the whole strategy
surface (fixed 0-4 / verbatim / constant / LPC × stereo decorrelation ×
Rice partition orders), integrity enforcement (CRC-8, CRC-16, MD5 —
each must individually catch a corruption), compression sanity, escape
partitions, and the coded-number edge cases
(see b_pdf_parser_spark/flaccodec.py)."""

import random

import pytest

from b_pdf_parser_spark.flaccodec import (
    _BitReader,
    _BitWriter,
    _read_residual,
    _read_utf8_number,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def _sig(i, n):
    return [((i * 13 + k * 7) % 2003) - 1001 for k in range(n)]


@pytest.mark.parametrize("sub", ["fixed0", "fixed1", "fixed2", "fixed3",
                                 "fixed4", "verbatim", "lpc"])
@pytest.mark.parametrize("po", [0, 1])
def test_mono_roundtrip_all_subframes(sub, po):
    s = _sig(3, 200)
    data = encode_flac(8000, 1, s, subframe=sub, partition_order=po,
                       lpc_coefs=(3, -3, 1), lpc_shift=1)
    assert decode_flac(data) == (8000, 1, s)


@pytest.mark.parametrize("stereo", ["indep", "left_side", "mid_side"])
def test_stereo_decorrelation_roundtrip(stereo):
    rng = random.Random(11)
    s = [rng.randint(-32768, 32767) for _ in range(2 * 300)]
    data = encode_flac(16000, 2, s, subframe="fixed2", stereo=stereo)
    assert decode_flac(data) == (16000, 2, s)


def test_constant_and_short_final_frame():
    # 97 samples at blocksize 96: final frame is ONE sample — fixed
    # orders must clamp, not fail
    for sub in ("constant", "fixed4", "lpc"):
        s = [7] * 97 if sub == "constant" else _sig(5, 97)
        data = encode_flac(8000, 1, s, subframe=sub, lpc_coefs=(3, -3, 1))
        assert decode_flac(data) == (8000, 1, s)


def test_compresses_smooth_content():
    s = [k % 100 for k in range(2000)]  # 4000 raw bytes
    assert len(encode_flac(8000, 1, s, subframe="fixed2")) < 2000


def test_each_integrity_layer_catches_corruption():
    s = _sig(9, 300)
    data = bytearray(encode_flac(8000, 1, s, subframe="fixed1"))
    # STREAMINFO MD5 lives at bytes 8+18 .. 8+34: flip one bit there —
    # frame CRCs still pass, only the MD5 check can catch it
    md5_flip = bytearray(data)
    md5_flip[8 + 20] ^= 1
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(md5_flip))
    # flip a bit in the audio payload: CRC-16 (or CRC-8) must object
    # before the MD5 stage
    body_flip = bytearray(data)
    body_flip[len(data) - 10] ^= 4
    with pytest.raises(ValueError, match="CRC|sync|truncated|Rice|unary|partition"):
        decode_flac(bytes(body_flip))


def test_truncation_fails_loud():
    data = encode_flac(8000, 1, _sig(2, 300), subframe="fixed2")
    with pytest.raises(ValueError):
        decode_flac(data[: len(data) - 7])
    with pytest.raises(ValueError):
        decode_flac(data[:20])


def test_not_flac():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")


def test_utf8_coded_number_roundtrip():
    for n in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1):
        br = _BitReader(_utf8_number(n), 0)
        assert _read_utf8_number(br) == n


def test_escape_partition_decodes():
    # hand-built residual: method 00, partition order 0, k=1111 (escape),
    # 5-bit width 6, raw 6-bit two's-complement residuals
    vals = [-17, 3, 0, 31, -32, 8]
    bw = _BitWriter()
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(0xF, 4)
    bw.write(6, 5)
    for v in vals:
        bw.write(v, 6)
    bw.align()
    br = _BitReader(bytes(bw.out), 0)
    assert _read_residual(br, 0, len(vals)) == vals


def test_five_bit_rice_method_decodes():
    # method 01 (5-bit Rice parameters): decoder-only surface, built by
    # hand since the encoder always emits method 00
    vals = [5, -3, 0, 12, -9]
    bw = _BitWriter()
    bw.write(1, 2)  # method 01
    bw.write(0, 4)  # partition order 0
    bw.write(2, 5)  # k = 2
    for v in vals:
        u = (v << 1) if v >= 0 else (-(v << 1) - 1)
        bw.write_unary(u >> 2)
        bw.write(u, 2)
    bw.align()
    br = _BitReader(bytes(bw.out), 0)
    assert _read_residual(br, 0, len(vals)) == vals
