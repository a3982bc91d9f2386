"""From-scratch CCITT Group 4 (ITU-T T.6): lossless roundtrips over
patterns that exercise every coding mode, spec known-vectors, run-table
prefix-freedom, and loud failure on truncated/malformed streams (see
b_pdf_parser_spark/ccittcodec.py)."""

import random

import pytest

from b_pdf_parser_spark.ccittcodec import (
    BLACK_CODES,
    EXT_MAKEUP,
    WHITE_CODES,
    decode_g4,
    encode_g4,
)


def _bits(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


@pytest.mark.parametrize("name,codes", [
    ("white", WHITE_CODES), ("black", BLACK_CODES),
])
def test_run_tables_prefix_free_and_complete(name, codes):
    # T.4 alphabets: terminating 0..63, makeup 64..1728 step 64, plus the
    # shared extended makeups 1792..2560 — prefix-free within each color
    assert sorted(k for k in codes if k < 64) == list(range(64))
    assert sorted(k for k in codes if k >= 64) == list(range(64, 1729, 64))
    assert sorted(EXT_MAKEUP) == list(range(1792, 2561, 64))
    full = list(codes.values()) + list(EXT_MAKEUP.values())
    assert len(set(full)) == len(full)
    for a in full:
        for b in full:
            assert a == b or not b.startswith(a), (name, a, b)


def test_known_vector_first_row_horizontal():
    # 4 white + 4 black, single row: horizontal mode (001) + white-4
    # (1011) + black-4 (011), then EOFB — hand-decodable from the spec
    data = encode_g4(8, 1, bytes([255] * 4 + [0] * 4))
    assert _bits(data).startswith("0011011011" + "000000000001" * 2)


def test_known_vector_all_white_row_is_v0():
    # all-white row vs imaginary white reference: a1=b1=width -> one V0 bit
    data = encode_g4(16, 1, bytes([255] * 16))
    assert _bits(data).startswith("1" + "000000000001" * 2)


@pytest.mark.parametrize("style", range(5))
def test_roundtrip_exact(style):
    rng = random.Random(style)
    for _ in range(30):
        w = rng.randint(1, 70)
        h = rng.randint(1, 20)
        if style == 0:  # blocky checker: horizontal + vertical modes
            px = bytes(255 if (x // 4 + y // 3) % 2 else 0
                       for y in range(h) for x in range(w))
        elif style == 1:  # all white
            px = bytes([255]) * (w * h)
        elif style == 2:  # all black
            px = bytes(w * h)
        elif style == 3:  # per-pixel noise: worst case, heavy horizontal
            px = bytes(rng.choice((0, 255)) for _ in range(w * h))
        else:  # curved pattern: pass-mode rows
            px = bytes(255 if (x * x + y * y) % 7 < 3 else 0
                       for y in range(h) for x in range(w))
        dec = decode_g4(encode_g4(w, h, px), w, h)
        assert dec == bytes(255 if p else 0 for p in px), (style, w, h)


@pytest.mark.parametrize("w", [64, 1728, 1729, 2560, 2561, 3000])
def test_long_runs_makeup_codes(w):
    # runs spanning makeup (64..1728) and extended makeup (1792..2560,
    # repeated for longer) territory roundtrip exactly
    px = bytes([0]) * w + bytes([255]) * w
    assert decode_g4(encode_g4(w, 2, px), w, 2) == px


def test_truncated_stream_raises():
    px = bytes(255 if (x + y) % 5 < 2 else 0 for y in range(10) for x in range(40))
    enc = encode_g4(40, 10, px)
    with pytest.raises(ValueError):
        decode_g4(enc[: len(enc) // 2], 40, 10)


def test_garbage_raises():
    with pytest.raises(ValueError):
        decode_g4(b"\xaa\x55" * 40, 32, 8)  # hits an invalid code or overrun


def test_bad_dims_raise():
    with pytest.raises(ValueError):
        encode_g4(0, 4, b"")
    with pytest.raises(ValueError):
        encode_g4(4, 4, bytes(15))  # size mismatch
    with pytest.raises(ValueError):
        decode_g4(b"\x00", 0, 4)


def test_nonzero_is_white_convention():
    # encoder treats any nonzero byte as white; decoder emits exactly 0/255
    px_in = bytes([0, 1, 128, 255] * 4)
    out = decode_g4(encode_g4(16, 1, px_in), 16, 1)
    assert out == bytes(255 if p else 0 for p in px_in)
    assert set(out) <= {0, 255}


# ---------------------------------------------------------------------------
# Group 3 (ITU-T T.4): 1-D Modified Huffman (K=0) and the 2-D extension
# (K>0) — EOL framing, tag bits, fill tolerance, loud failure.
# ---------------------------------------------------------------------------

from b_pdf_parser_spark.ccittcodec import decode_g3, encode_g3  # noqa: E402


@pytest.mark.parametrize("k", [0, 1, 2, 4, 7])
@pytest.mark.parametrize("style", range(5))
def test_g3_roundtrip_exact(k, style):
    rng = random.Random(1000 * k + style)
    for _ in range(12):
        w = rng.randint(1, 70)
        h = rng.randint(1, 20)
        if style == 0:
            px = bytes(255 if (x // 4 + y // 3) % 2 else 0
                       for y in range(h) for x in range(w))
        elif style == 1:
            px = bytes([255]) * (w * h)
        elif style == 2:
            px = bytes(w * h)
        elif style == 3:
            px = bytes(rng.choice((0, 255)) for _ in range(w * h))
        else:
            px = bytes(255 if (x * x + y * y) % 7 < 3 else 0
                       for y in range(h) for x in range(w))
        dec = decode_g3(encode_g3(w, h, px, k=k), w, h, k=k)
        assert dec == bytes(255 if p else 0 for p in px), (k, style, w, h)


def test_g3_known_vector_1d_row():
    # hand-built stream: EOL + W4(1011) + B3(10) + W1(000111), one row
    bits = "000000000001" + "1011" + "10" + "000111"
    bits += "0" * ((8 - len(bits) % 8) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    assert decode_g3(data, 8, 1, k=0) == bytes([255] * 4 + [0] * 3 + [255])


def test_g3_row_opening_black_uses_zero_white_run():
    # a row that opens black must be coded W0 + black runs (T.4 §4.1.1)
    px = bytes([0] * 5 + [255] * 3)
    enc = encode_g3(8, 1, px, k=0)
    bits = _bits(enc)
    # EOL then WHITE_CODES[0] then BLACK_CODES[5]
    assert bits.startswith("000000000001" + WHITE_CODES[0] + BLACK_CODES[5])
    assert decode_g3(enc, 8, 1, k=0) == px


def test_g3_fill_bits_absorbed():
    px = bytes(255 if (x + y) % 3 else 0 for y in range(4) for x in range(9))
    enc = encode_g3(9, 4, px, k=0)
    # a leading fill byte of zeros extends the first EOL's zero run
    assert decode_g3(b"\x00" + enc, 9, 4, k=0) == decode_g3(enc, 9, 4, k=0)


def test_g3_2d_matches_g4_pixels():
    # same input through G3-2D and G4 must decode to identical pixels
    px = bytes(255 if (x * 7 + y * 3) % 11 < 6 else 0
               for y in range(9) for x in range(17))
    a = decode_g3(encode_g3(17, 9, px, k=9), 17, 9, k=9)
    b = decode_g4(encode_g4(17, 9, px), 17, 9)
    assert a == b == px


def test_g3_k_rotation_changes_bitstream_not_pixels():
    px = bytes(255 if (x // 2 + y) % 3 else 0 for y in range(6) for x in range(13))
    enc0 = encode_g3(13, 6, px, k=0)
    enc4 = encode_g3(13, 6, px, k=4)
    assert enc0 != enc4  # different coding regimes on the wire
    assert decode_g3(enc0, 13, 6, k=0) == decode_g3(enc4, 13, 6, k=4) == px


@pytest.mark.parametrize("style", range(4))
def test_g3_1d_no_eol_streams_decode(style):
    # PDF /EndOfLine defaults to FALSE: conforming K=0 streams pack rows
    # back-to-back with no framing — the decoder auto-detects per row
    rng = random.Random(style)
    for _ in range(10):
        w = rng.randint(1, 50)
        h = rng.randint(1, 12)
        if style == 0:
            px = bytes(255 if (x // 3 + y) % 2 else 0
                       for y in range(h) for x in range(w))
        elif style == 1:
            px = bytes([255]) * (w * h)
        elif style == 2:
            px = bytes(w * h)
        else:
            px = bytes(rng.choice((0, 255)) for _ in range(w * h))
        enc = encode_g3(w, h, px, k=0, eol=False)
        framed = encode_g3(w, h, px, k=0, eol=True)
        assert len(enc) < len(framed)  # really no EOLs on the wire
        assert decode_g3(enc, w, h, k=0) == bytes(255 if p else 0 for p in px)


def test_g3_stripped_eol_stream_still_decodes_k0():
    # with per-row auto-detect, a framed stream missing its first EOL is
    # just a mixed-framing stream — k=0 decode must survive it
    enc = encode_g3(8, 2, bytes([255]) * 16, k=0)
    bits = _bits(enc)[12:]
    bits += "0" * ((8 - len(bits) % 8) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    assert decode_g3(data, 8, 2, k=0) == bytes([255]) * 16


def test_g3_2d_missing_eol_raises():
    # k>0 carries the 1-D/2-D tag on the EOL: framing is mandatory
    enc = encode_g3(8, 2, bytes([255]) * 16, k=2)
    bits = _bits(enc)[12:]
    bits += "0" * ((8 - len(bits) % 8) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    with pytest.raises(ValueError):
        decode_g3(data, 8, 2, k=2)
    with pytest.raises(ValueError, match="EOL framing"):
        encode_g3(8, 2, bytes(16), k=2, eol=False)


def test_g3_first_row_2d_rejected():
    # hand-built: EOL + tag 0 (2-D) as the very first row is illegal
    bits = "000000000001" + "0" + "1"  # EOL, 2-D tag, V0
    bits += "0" * ((8 - len(bits) % 8) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    with pytest.raises(ValueError):
        decode_g3(data, 4, 1, k=2)


def test_g3_truncated_raises():
    px = bytes(255 if (x + y) % 5 < 2 else 0 for y in range(10) for x in range(40))
    enc = encode_g3(40, 10, px, k=4)
    with pytest.raises(ValueError):
        decode_g3(enc[: len(enc) // 3], 40, 10, k=4)


def test_g3_negative_k_rejected():
    with pytest.raises(ValueError):
        encode_g3(4, 1, bytes(4), k=-1)
    with pytest.raises(ValueError):
        decode_g3(b"\x00\x10", 4, 1, k=-1)


@pytest.mark.parametrize("w", [64, 1728, 2560, 3000])
def test_g3_long_runs_makeup_codes(w):
    px = bytes([0]) * w + bytes([255]) * w
    assert decode_g3(encode_g3(w, 2, px, k=0), w, 2, k=0) == px


@pytest.mark.parametrize("k", [-1, 0, 2])
def test_byte_align_roundtrip_and_wire_difference(k):
    px = bytes(255 if ((x // 3 + y // 2) % 5) < 3 else 0
               for y in range(11) for x in range(23))
    if k < 0:
        from b_pdf_parser_spark.ccittcodec import decode_g4 as dec
        a = encode_g4(23, 11, px, byte_align=True)
        u = encode_g4(23, 11, px)
        assert dec(a, 23, 11, byte_align=True) == px
    else:
        a = encode_g3(23, 11, px, k=k, byte_align=True)
        u = encode_g3(23, 11, px, k=k)
        assert decode_g3(a, 23, 11, k=k, byte_align=True) == px
    assert a != u  # padding really lands on the wire


def test_byte_align_no_eol_g3_roundtrip():
    # the intersection: /EncodedByteAlign with the /EndOfLine-false shape
    px = bytes(255 if (x + y) % 3 else 0 for y in range(7) for x in range(13))
    enc = encode_g3(13, 7, px, k=0, eol=False, byte_align=True)
    assert decode_g3(enc, 13, 7, k=0, byte_align=True) == px


def test_hostile_dims_rejected_before_allocation():
    # untrusted PDF /Width//Height must hit the shared sample-budget
    # guard before the columns*rows output buffer is allocated
    import pytest

    for fn in (lambda: decode_g4(b"\x00" * 8, 65000, 65000),
               lambda: decode_g3(b"\x00" * 8, 65000, 65000, k=0)):
        with pytest.raises(ValueError, match="sample budget"):
            fn()
