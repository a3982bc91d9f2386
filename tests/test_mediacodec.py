"""From-scratch PNG/BMP/WAV codecs: round-trips over every PNG filter
type and channel count, BMP padding/orientation, WAV chunk-walk, and
loud failure on corruption — the decode third of the multimodal axis
that needs no native libs (see b_pdf_parser_spark/mediacodec.py)."""

import struct
import zlib

import pytest

from b_pdf_parser_spark.mediacodec import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)


def _pixels(i, n):
    return bytes((i * 31 + k * 7) % 251 for k in range(n))


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(ch, seed):
    # filter_seed + height >= 5 guarantees every filter type 0..4 occurs
    w, h = 11, 9
    px = _pixels(seed * 7 + ch, w * h * ch)
    got = decode_png(encode_png(w, h, ch, px, filter_seed=seed))
    assert got == (w, h, ch, px)


def test_png_multi_idat_and_crc():
    w, h = 40, 30  # big enough that the encoder splits IDAT
    px = _pixels(5, w * h * 3)
    data = encode_png(w, h, 3, px, filter_seed=2)
    assert data.count(b"IDAT") == 2
    assert decode_png(data)[3] == px
    # flip one byte inside a chunk body -> CRC must catch it loudly
    bad = bytearray(data)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all----")
    # depth 16 with palette color type: not a legal PNG combination
    # (16-bit truecolor/greyscale ARE supported as of the round-5 close)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    chunk = (
        len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr
        + (zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF).to_bytes(4, "big")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


@pytest.mark.parametrize("w", [9, 10, 11, 12])  # all paddings 0..3 bytes
def test_bmp_roundtrip_every_padding(w):
    h = 5
    px = _pixels(w, w * h * 3)
    assert decode_bmp(encode_bmp(w, h, px)) == (w, h, 3, px)


def test_bmp_order_sensitivity():
    # the decoder must undo bottom-up + BGR: a naive byte copy of the body
    # would keep the sum but break the position-weighted sum
    w, h = 4, 3
    px = _pixels(9, w * h * 3)
    data = encode_bmp(w, h, px)
    body = data[54:]
    assert body != px  # really stored transformed (BGR, bottom-up, padded)
    _, _, _, decoded = decode_bmp(data)
    assert decoded == px


def test_wav_roundtrip_chunk_walk_and_stereo():
    samples = [((11 * k) % 2003) - 1001 for k in range(501)]  # odd count
    data = encode_wav(16000, 1, samples)
    assert b"LIST" in data  # junk chunk the walk must skip
    assert decode_wav(data) == (16000, 1, samples)
    stereo = [((7 * k) % 1999) - 999 for k in range(400)]
    assert decode_wav(encode_wav(44100, 2, stereo)) == (44100, 2, stereo)


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav(8000, 1, [0, 1, 2, 3]))
    fmt_at = data.find(b"fmt ") + 8
    data[fmt_at] = 3  # IEEE float format code
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(data))


def test_decode_features_real_formats_through_spark(spark):
    # the generic decode_features path must REALLY decode PNG/BMP/WAV
    # payloads inside mapInPandas (dims filled, no error), and keep the
    # honest stub error for entropy-coded containers
    import pyspark.sql.functions as F

    import b_pdf_parser_spark
    from b_pdf_parser_spark.operators.multimodal import (
        decode_features,
        synth_real_media_df,
    )

    b_pdf_parser_spark.ship_package(spark)
    out = decode_features(synth_real_media_df(spark, 24)).collect()
    assert len(out) == 24 and all(r["error"] is None for r in out)
    # byte_entropy == 0 is legitimate for single-block flat JPEGs (all
    # decoded pixels identical); every other corpus payload has spread
    assert all(r["channels"] is not None and r["byte_entropy"] >= 0 for r in out)
    assert sum(1 for r in out if r["byte_entropy"] > 0) >= 20
    # a truncated JPEG now hits the REAL decoder and must fail loudly
    bad_jpeg = spark.createDataFrame(
        [(0, "img", bytearray(b"\xff\xd8\xff\xe0" + bytes(32)))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    err = decode_features(bad_jpeg).collect()[0]["error"]
    assert err and "ValueError" in err
    # still-stubbed container (JPEG2000 signature box) keeps the honest stub
    jp2 = spark.createDataFrame(
        [(0, "img", bytearray(b"\x00\x00\x00\x0cjP  \r\n\x87\n" + bytes(32)))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    err = decode_features(jp2).collect()[0]["error"]
    assert err and "NotImplementedError" in err


def test_bmp_top_down_negative_height():
    # the spec's other orientation: h < 0 stores rows top-down; build one
    # by rewriting an encoded BMP's height field and reordering its rows
    import struct as _s

    w, h = 5, 4
    px = _pixels(3, w * h * 3)
    data = bytearray(encode_bmp(w, h, px))
    stride = w * 3 + ((-(w * 3)) % 4)
    rows = [bytes(data[54 + r * stride : 54 + (r + 1) * stride]) for r in range(h)]
    data[14:34] = _s.pack("<IiiHHI", 40, w, -h, 1, 24, 0)
    data[54:] = b"".join(reversed(rows))  # bottom-up -> top-down storage
    assert decode_bmp(bytes(data)) == (w, h, 3, px)


# ---------------------------------------------------------------------------
# TIFF 6.0 / class F (both byte orders, strips, G4 fax via ccittcodec)
# ---------------------------------------------------------------------------

def test_tiff_gray_rgb_roundtrip_both_endians_and_strips():
    from b_pdf_parser_spark.mediacodec import decode_tiff, encode_tiff

    for be in (False, True):
        for rps in (None, 2, 5):
            for ch in (1, 3):
                w, h = 11, 7
                px = _pixels(9 if be else 4, w * h * ch)
                enc = encode_tiff(w, h, ch, px, big_endian=be, rows_per_strip=rps)
                assert enc[:2] == (b"MM" if be else b"II")
                assert decode_tiff(enc) == (w, h, ch, px)


def test_tiff_g4_fax_roundtrip_and_multistrip_independence():
    from b_pdf_parser_spark.mediacodec import decode_tiff, encode_tiff

    w, h = 21, 12  # non-byte-aligned width
    px = bytes(255 if ((x // 3 + y // 2) % 5) < 3 else 0
               for y in range(h) for x in range(w))
    whole = encode_tiff(w, h, 1, px, compression=4)
    stripped = encode_tiff(w, h, 1, px, compression=4, big_endian=True,
                           rows_per_strip=3)
    assert decode_tiff(whole) == (w, h, 1, px)
    # strips are INDEPENDENT G4 blocks (each restarts from the imaginary
    # white row) — a decoder that carries the reference row across a
    # strip boundary decodes different pixels
    assert decode_tiff(stripped) == (w, h, 1, px)
    assert whole[8:] != stripped[8:]  # layouts genuinely differ


def test_tiff_g4_photometric_blackiszero_inverts():
    from b_pdf_parser_spark.mediacodec import decode_tiff, encode_tiff

    w, h = 16, 4
    px = bytes(255 if x < 8 else 0 for _ in range(h) for x in range(w))
    enc = bytearray(encode_tiff(w, h, 1, px, compression=4))
    # flip PhotometricInterpretation 0 -> 1 in the IFD (tag 262)
    n = int.from_bytes(enc[8:10], "little")
    for k in range(n):
        base = 10 + 12 * k
        if int.from_bytes(enc[base:base + 2], "little") == 262:
            assert enc[base + 8] == 0
            enc[base + 8] = 1
            break
    else:
        raise AssertionError("photometric tag not found")
    inv = decode_tiff(bytes(enc))
    assert inv == (w, h, 1, bytes(255 - v for v in px))


def test_tiff_bad_inputs_raise():
    import pytest as _pytest

    from b_pdf_parser_spark.mediacodec import decode_tiff, encode_tiff

    good = encode_tiff(8, 8, 1, _pixels(1, 64))
    with _pytest.raises(ValueError):
        decode_tiff(b"ZZ" + good[2:])  # bad byte-order mark
    with _pytest.raises(ValueError):
        decode_tiff(good[:20])  # truncated IFD
    with _pytest.raises(ValueError):
        encode_tiff(8, 8, 3, bytes(64), compression=4)  # G4 needs 1 sample
    with _pytest.raises(ValueError):
        encode_tiff(8, 8, 1, bytes(63))  # size mismatch
    # strip table out of range
    bad = bytearray(good)
    bad[-1] ^= 0  # keep bytes, then truncate the strip data entirely
    with _pytest.raises(ValueError):
        decode_tiff(bytes(bad[:-32]))


def test_tiff_gray_whiteiszero_inverts_and_fillorder2_rejected():
    import pytest as _pytest

    from b_pdf_parser_spark.mediacodec import decode_tiff, encode_tiff

    w, h = 6, 5
    px = _pixels(2, w * h)
    enc = bytearray(encode_tiff(w, h, 1, px))
    n = int.from_bytes(enc[8:10], "little")
    for k in range(n):
        base = 10 + 12 * k
        if int.from_bytes(enc[base:base + 2], "little") == 262:
            assert enc[base + 8] == 1  # gray default BlackIsZero
            enc[base + 8] = 0          # -> WhiteIsZero
            break
    # scanner-style WhiteIsZero gray canonicalizes by inversion
    assert decode_tiff(bytes(enc)) == (w, h, 1, bytes(255 - v for v in px))
    # FillOrder=2 (LSB-first) is unsupported and must fail loud: splice a
    # FillOrder entry over the RowsPerStrip tag slot (tag 278 -> 266)
    enc2 = bytearray(encode_tiff(w, h, 1, px))
    for k in range(n):
        base = 10 + 12 * k
        if int.from_bytes(enc2[base:base + 2], "little") == 278:
            enc2[base:base + 2] = (266).to_bytes(2, "little")
            enc2[base + 2:base + 4] = (3).to_bytes(2, "little")  # SHORT
            enc2[base + 4:base + 8] = (1).to_bytes(4, "little")
            enc2[base + 8:base + 12] = (2).to_bytes(2, "little") + b"\x00\x00"
            break
    with _pytest.raises(ValueError):
        decode_tiff(bytes(enc2))


# ---------------------------------------------------------------------------
# Round-5-close PNG extensions: palette (PLTE), sub-byte depths, Adam7
# ---------------------------------------------------------------------------

from b_pdf_parser_spark.mediacodec import (  # noqa: E402
    _IMA_STEPS,
    _ima_step,
    decode_wav as _decode_wav,
    encode_wav_adpcm,
    encode_wav_adpcm_nibbles,
    ima_adpcm_encode,
)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_adam7_roundtrip_8bit(ch, interlace):
    for w, h in ((9, 7), (1, 1), (8, 8), (16, 5), (3, 11), (2, 2)):
        px = bytes((31 * ch + k * 7) % 251 for k in range(w * h * ch))
        got = decode_png(encode_png(w, h, ch, px, filter_seed=3, interlace=interlace))
        assert got == (w, h, ch, px), (ch, w, h, interlace)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_palette_roundtrip(depth, interlace):
    psize = min(256, 1 << depth)
    pal = [((7 + j * 3) % 256, (11 + j * 5) % 256, (13 + j * 9) % 256)
           for j in range(psize)]
    for w, h in ((9, 7), (5, 3), (8, 2), (1, 4)):
        idx = bytes((k * 7 + 3) % psize for k in range(w * h))
        exp = b"".join(bytes(pal[v]) for v in idx)
        got = decode_png(
            encode_png(w, h, 1, idx, palette=pal, depth=depth, interlace=interlace)
        )
        assert got == (w, h, 3, exp), (depth, w, h, interlace)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_exact_scaling(depth, interlace):
    scale = 255 // ((1 << depth) - 1)
    for w, h in ((9, 7), (13, 4), (1, 5), (8, 1)):
        px = bytes((k * 3 + 1) % (1 << depth) for k in range(w * h))
        got = decode_png(encode_png(w, h, 1, px, depth=depth, interlace=interlace))
        assert got == (w, h, 1, bytes(v * scale for v in px)), (depth, w, h)


def test_png_palette_missing_plte_rejected():
    pal = [(0, 0, 0), (255, 255, 255)]
    data = encode_png(4, 2, 1, bytes([0, 1] * 4), palette=pal, depth=1)
    # excise the PLTE chunk: the decoder must refuse a type-3 image
    i = data.index(b"PLTE") - 4
    ln = int.from_bytes(data[i : i + 4], "big")
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(data[:i] + data[i + 12 + ln :])


def test_png_palette_index_out_of_range_rejected():
    with pytest.raises(ValueError, match="palette"):
        encode_png(2, 1, 1, bytes([0, 5]), palette=[(0, 0, 0), (1, 1, 1)], depth=1)


def test_png_encoder_legacy_path_byte_stable():
    # the pass-geometry refactor must not change non-interlaced 8-bit
    # output: pin a known stream's digest-free invariants instead of a
    # golden (filter rotation + single pass == the original serializer)
    px = bytes((k * 7) % 251 for k in range(9 * 7 * 3))
    a = encode_png(9, 7, 3, px, filter_seed=2)
    w, h, ch, out = decode_png(a)
    assert (w, h, ch, out) == (9, 7, 3, px)
    assert a.count(b"IDAT") >= 1 and a[:8] == b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAVE format 0x11)
# ---------------------------------------------------------------------------


def test_adpcm_closed_form_stratum_exact():
    # nibble&7 <= 3 pins the step index at 0 (step 7): the decode is the
    # closed form first + sum of signed (3*bit1 + bit0) — the corpus slice
    i = 64
    n = 160 + 2 * (i % 20)
    first = ((i * 13) % 2003) - 1001
    nibs = [((i * 5 + k * 3) % 4) | (8 if (i + k) % 7 < 3 else 0)
            for k in range(n)]
    rate, ch, samples, codec = _decode_wav(
        encode_wav_adpcm_nibbles(8000, first, nibs), return_codec=True
    )
    assert (rate, ch, codec) == (8000, 1, "adpcm")
    exp, acc = [first], first
    for k in range(n):
        nb = (i * 5 + k * 3) % 4
        d = 3 * ((nb >> 1) & 1) + (nb & 1)
        acc += -d if (i + k) % 7 < 3 else d
        exp.append(acc)
    assert samples == exp


def test_adpcm_index_and_predictor_clamps():
    pred, idx = 0, 0
    for _ in range(200):
        pred, idx = _ima_step(7, pred, idx)
    assert idx == 88  # index clamps at the top of the step table
    pred, idx = 32000, 88
    for _ in range(10):
        pred, idx = _ima_step(7, pred, idx)
    assert pred == 32767  # int16 clamp, positive
    pred, idx = -32000, 88
    for _ in range(10):
        pred, idx = _ima_step(15, pred, idx)
    assert pred == -32768  # int16 clamp, negative


def test_adpcm_greedy_encoder_tracks_slew_bounded_signal():
    sig = [0]
    for k in range(800):
        sig.append(sig[-1] + (3 if (k // 40) % 2 == 0 else -3))
    rate, ch, dec = _decode_wav(encode_wav_adpcm(22050, sig))
    assert len(dec) == len(sig) and dec[0] == sig[0]
    # decode must equal the encoder's internal predictor trajectory, and
    # that trajectory must stay within one step of the input everywhere
    pred, idx = sig[0], 0
    nibs = ima_adpcm_encode(sig[1:], sig[0], 0)
    traj = [pred]
    for s, nb in zip(sig[1:], nibs):
        step = _IMA_STEPS[idx]
        pred, idx = _ima_step(nb, pred, idx)
        traj.append(pred)
        assert abs(pred - s) <= step
    assert dec == traj


def test_adpcm_fact_truncates_pad_nibble():
    rate, ch, smp = _decode_wav(encode_wav_adpcm_nibbles(8000, 100, [1, 2, 3]))
    assert len(smp) == 4  # 1 seed + 3 nibbles; the pad nibble is dropped


def test_adpcm_channel_count_guard():
    # stereo is supported now; an absurd channel count still fails loud
    data = bytearray(encode_wav_adpcm_nibbles(8000, 0, [0, 0]))
    off = data.index(b"fmt ") + 8 + 2
    data[off:off + 2] = struct.pack("<H", 9)
    with pytest.raises(ValueError, match="channel count"):
        _decode_wav(bytes(data))


def test_adpcm_bad_step_index_rejected():
    data = bytearray(encode_wav_adpcm_nibbles(8000, 0, [0, 0]))
    off = data.index(b"data") + 8 + 2  # block header index byte
    data[off] = 89
    with pytest.raises(ValueError, match="index"):
        _decode_wav(bytes(data))


# ---------------------------------------------------------------------------
# TIFF Compression=5 (LZW) + Predictor 2
# ---------------------------------------------------------------------------

from b_pdf_parser_spark.mediacodec import (  # noqa: E402
    _tiff_lzw_compress,
    _tiff_lzw_decompress,
    decode_tiff,
    encode_tiff,
)


def test_tiff_lzw_known_answer_and_pdf_filter_parity():
    # the wire format is the PDF LZWDecode variant (EarlyChange 1): the
    # spec's classic '-----A---B' example must survive, decoded by the
    # SHARED pdfmodel._lzw implementation
    enc = _tiff_lzw_compress(b"-----A---B")
    assert _tiff_lzw_decompress(enc, 10) == b"-----A---B"
    from b_pdf_parser_spark.pdfmodel import _lzw
    assert _lzw(enc, early_change=1) == b"-----A---B"


def test_tiff_lzw_width_growth_and_table_reset():
    import random
    rng = random.Random(7)
    for data in (
        bytes(rng.randrange(256) for _ in range(30000)),  # forces 12-bit + clear
        b"ab" * 15000,
        bytes((k * 7) % 251 for k in range(25000)),
        b"", b"A",
    ):
        assert _tiff_lzw_decompress(_tiff_lzw_compress(data), len(data)) == data


def test_tiff_lzw_wrong_length_rejected():
    enc = _tiff_lzw_compress(b"abcabc")
    with pytest.raises(ValueError, match="expected"):
        _tiff_lzw_decompress(enc, 7)


@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("ch", [1, 3])
def test_tiff_lzw_roundtrip_predictor_strips_endians(ch, predictor):
    for be in (False, True):
        for rps in (None, 3):
            for w, h in ((9, 7), (16, 5), (1, 4)):
                px = bytes((31 + k * 7) % 251 for k in range(w * h * ch))
                t = encode_tiff(w, h, ch, px, compression=5, big_endian=be,
                                rows_per_strip=rps, predictor=predictor)
                assert decode_tiff(t) == (w, h, ch, px), (ch, predictor, be, rps, w, h)


def test_tiff_predictor_changes_wire_not_pixels():
    # a smooth ramp compresses differently under differencing, but the
    # decoded pixels are identical — predictor is wire-only
    px = bytes(k % 251 for k in range(16 * 8))
    a = encode_tiff(16, 8, 1, px, compression=5, predictor=1)
    b = encode_tiff(16, 8, 1, px, compression=5, predictor=2)
    assert a != b
    assert decode_tiff(a) == decode_tiff(b) == (16, 8, 1, px)


def test_tiff_predictor_without_lzw_rejected():
    px = bytes(12)
    with pytest.raises(ValueError, match="Predictor"):
        encode_tiff(4, 3, 1, px, predictor=2)  # uncompressed + predictor


@pytest.mark.parametrize("g3_2d", [False, True])
def test_tiff_g3_fax_roundtrip_strips_endians(g3_2d):
    for be in (False, True):
        for rps in (None, 3, 5):
            for w, h in ((9, 7), (16, 5), (23, 11)):
                px = bytes(255 if ((x // 3 + y // 2 + w) % 5) < 3 else 0
                           for y in range(h) for x in range(w))
                t = encode_tiff(w, h, 1, px, compression=3, big_endian=be,
                                rows_per_strip=rps, g3_2d=g3_2d)
                assert decode_tiff(t) == (w, h, 1, px), (g3_2d, be, rps, w, h)


def test_tiff_g3_t4options_uncompressed_mode_rejected():
    t = bytearray(encode_tiff(9, 7, 1, bytes(63), compression=3, g3_2d=True))
    # flip T4Options to claim bit 1 (T.4 uncompressed mode): must refuse
    i = t.find(struct.pack("<HHI", 292, 4, 1))
    assert i > 0
    t[i + 8] |= 2
    with pytest.raises(ValueError, match="uncompressed mode"):
        decode_tiff(bytes(t))


def test_tiff_g3_flags_rejected_on_wrong_compression():
    with pytest.raises(ValueError, match="g3_2d"):
        encode_tiff(4, 3, 1, bytes(12), compression=1, g3_2d=True)
    with pytest.raises(ValueError, match="bi-level"):
        encode_tiff(4, 3, 3, bytes(36), compression=3)


# ---------------------------------------------------------------------------
# G.711 A-law + unsigned PCM8
# ---------------------------------------------------------------------------

from b_pdf_parser_spark.mediacodec import alaw_expand  # noqa: E402


def test_alaw_spec_anchor_points_and_monotonicity():
    assert alaw_expand(0x55) == -8    # u=0x00: segment 0, mantissa 0, negative
    assert alaw_expand(0xD5) == 8     # u=0x80: same, positive
    assert alaw_expand(0xAA) == 32256  # u=0xFF: full-scale positive
    prev = None
    for m in range(16):  # positive codes of one segment grow monotonically
        x = alaw_expand((0x80 | (3 << 4) | m) ^ 0x55)
        if prev is not None:
            assert x > prev
        prev = x


def test_alaw_pcm8_wav_roundtrip_and_codec_names():
    b = [(17 * k + 11) % 256 for k in range(300)]
    for kw, codec, exp in (
        ({"alaw": True}, "alaw", [alaw_expand(v) for v in b]),
        ({"pcm8": True}, "pcm8", [(v - 128) * 256 for v in b]),
    ):
        rate, ch, smp, got = _decode_wav(
            encode_wav(8000, 1, b, **kw), return_codec=True
        )
        assert (got, smp, rate, ch) == (codec, exp, 8000, 1), codec


def test_encode_wav_rejects_conflicting_codecs():
    with pytest.raises(ValueError, match="at most one"):
        encode_wav(8000, 1, [0], ulaw=True, alaw=True)


# ---------------------------------------------------------------------------
# Review-pass regressions: chunk-order independence, fail-loud shapes
# ---------------------------------------------------------------------------


def test_wav_fact_chunk_after_data_still_truncates():
    # RIFF does not mandate fact-before-data: decode must defer until the
    # walk completes, or the pad nibble becomes a phantom sample
    from b_pdf_parser_spark.mediacodec import encode_wav_adpcm_nibbles
    wav = bytearray(encode_wav_adpcm_nibbles(8000, 100, [1, 2, 3]))
    fi = wav.index(b"fact")
    fact = bytes(wav[fi : fi + 12])
    del wav[fi : fi + 12]
    wav += fact  # move the fact chunk after data
    rate, ch, smp = _decode_wav(bytes(wav))
    assert len(smp) == 4  # still 1 seed + 3 nibbles, pad dropped


def test_wav_multiple_data_chunks_rejected():
    data = bytearray(encode_wav(8000, 1, [1, 2, 3]))
    di = data.index(b"data")
    extra = bytes(data[di : di + 8 + 6])
    data += extra
    # fix the RIFF size so the walk reaches the second data chunk
    struct.pack_into("<I", data, 4, len(data) - 8)
    with pytest.raises(ValueError, match="multiple data"):
        _decode_wav(bytes(data))


def test_png_nonzero_method_bytes_rejected():
    px = bytes((k * 7) % 251 for k in range(4 * 3 * 3))
    good = encode_png(4, 3, 3, px)
    i = good.index(b"IHDR")
    for off in (10, 11):  # compression method, filter method bytes
        bad = bytearray(good)
        bad[i + 4 + off] = 1
        body = bytes(bad[i + 4 : i + 4 + 13])
        crc = (zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF).to_bytes(4, "big")
        bad[i + 4 + 13 : i + 4 + 17] = crc  # keep the CRC honest
        with pytest.raises(ValueError, match="method"):
            decode_png(bytes(bad))


# ---------------------------------------------------------------------------
# 8-bit indexed BMP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("psize", [2, 16, 256])
def test_bmp_palette_roundtrip_all_paddings(psize):
    pal = [((7 + j * 3) % 256, (11 + j * 5) % 256, (13 + j * 9) % 256)
           for j in range(psize)]
    for w, h in ((9, 7), (10, 3), (11, 2), (12, 5), (1, 1)):
        idx = bytes((k * 7 + 1) % psize for k in range(w * h))
        exp = b"".join(bytes(pal[v]) for v in idx)
        got = decode_bmp(encode_bmp(w, h, idx, palette=pal))
        assert got == (w, h, 3, exp), (psize, w, h)


def test_bmp_palette_guards():
    pal = [(0, 0, 0), (255, 255, 255)]
    with pytest.raises(ValueError, match="index out of range"):
        encode_bmp(2, 1, bytes([0, 5]), palette=pal)
    data = bytearray(encode_bmp(2, 2, bytes([0, 1, 1, 0]), palette=pal))
    # point a pixel past the 2-entry color table: decoder must refuse
    off = struct.unpack("<I", data[10:14])[0]
    data[off] = 7
    with pytest.raises(ValueError, match="palette index"):
        decode_bmp(bytes(data))


def test_bmp_truncation_raises_valueerror_not_indexerror():
    # the module contract: malformed input -> ValueError, never
    # IndexError/struct.error escaping to callers
    pal = [(0, 0, 0), (255, 255, 255)]
    full8 = encode_bmp(6, 4, bytes(k % 2 for k in range(24)), palette=pal)
    full24 = encode_bmp(6, 4, bytes((k * 7) % 251 for k in range(72)))
    for blob in (full8[:-5], full24[:-5], full8[:40], b"BM" + b"\x00" * 20):
        with pytest.raises(ValueError):
            decode_bmp(blob)


# ---------------------------------------------------------------------------
# PNG tRNS (palette transparency -> RGBA)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("depth", [2, 4, 8])
def test_png_trns_palette_to_rgba(depth, interlace):
    psize = min(256, 1 << depth)
    pal = [((7 + j * 3) % 256, (11 + j * 5) % 256, (13 + j * 9) % 256)
           for j in range(psize)]
    tr = [(19 + j * 7) % 256 for j in range(max(1, psize // 2))]
    for w, h in ((9, 7), (5, 3)):
        idx = bytes((k * 7 + 1) % psize for k in range(w * h))
        exp = bytearray()
        for v in idx:
            exp += bytes(pal[v])
            exp.append(tr[v] if v < len(tr) else 255)  # spec: opaque past end
        got = decode_png(encode_png(w, h, 1, idx, palette=pal, depth=depth,
                                    interlace=interlace, trns=tr))
        assert got == (w, h, 4, bytes(exp)), (depth, w, h, interlace)


def test_png_trns_guards():
    with pytest.raises(ValueError, match="palette"):
        encode_png(2, 1, 3, bytes(6), trns=[1])  # trns without palette
    with pytest.raises(ValueError, match="tRNS"):
        encode_png(2, 1, 1, bytes([0, 1]), palette=[(0, 0, 0), (1, 1, 1)],
                   depth=1, trns=[1, 2, 3])  # longer than the palette


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_16bit_roundtrip_high_byte_canonical(ch, interlace):
    for w, h in ((9, 7), (5, 3), (1, 1)):
        vals = [(4099 + k * 2053) % 65536 for k in range(w * h * ch)]
        got = decode_png(encode_png(w, h, ch, vals, depth=16,
                                    interlace=interlace, filter_seed=2))
        assert got == (w, h, ch, bytes(v >> 8 for v in vals)), (ch, w, h)


def test_png_16bit_guards():
    with pytest.raises(ValueError, match="range"):
        encode_png(1, 1, 1, [70000], depth=16)
    with pytest.raises(ValueError, match="bit depth"):
        # palette at depth 16 is not a legal PNG combination
        encode_png(1, 1, 1, bytes([0]), palette=[(0, 0, 0)], depth=16)


# ---------------------------------------------------------------------------
# Stereo IMA ADPCM (interleaved 4-byte nibble groups per channel)
# ---------------------------------------------------------------------------

from b_pdf_parser_spark.mediacodec import encode_wav_adpcm_multi  # noqa: E402


def _ima_replay(first, nibs):
    out, pred, idx = [first], first, 0
    for nb in nibs:
        pred, idx = _ima_step(nb, pred, idx)
        out.append(pred)
    return out


def test_adpcm_stereo_matches_per_channel_replay():
    nl = [(k * 7) % 16 for k in range(64)]
    nr = [(k * 11 + 5) % 16 for k in range(64)]
    rate, ch, smp, codec = _decode_wav(
        encode_wav_adpcm_multi(8000, [100, -200], [nl, nr]), return_codec=True
    )
    assert (rate, ch, codec) == (8000, 2, "adpcm")
    assert smp[0::2] == _ima_replay(100, nl)
    assert smp[1::2] == _ima_replay(-200, nr)


def test_adpcm_stereo_pad_nibbles_not_decoded():
    # 5 nibbles per channel: padded to 8 on the wire, fact truncates back
    rate, ch, smp = _decode_wav(
        encode_wav_adpcm_multi(8000, [10, 20], [[1] * 5, [2] * 5])
    )
    assert len(smp) == 2 * 6  # (1 seed + 5 nibbles) per channel


def test_adpcm_stereo_guards():
    with pytest.raises(ValueError, match="same length"):
        encode_wav_adpcm_multi(8000, [0, 0], [[1, 2], [1]])
    with pytest.raises(ValueError, match="per channel"):
        encode_wav_adpcm_multi(8000, [0, 0], [[1, 2]])
    # non-4-byte-aligned group region in a stereo file must fail loud
    # (claim block_align 13: 8 header bytes + a 5-byte group region)
    data = bytearray(encode_wav_adpcm_multi(8000, [0, 0], [[1] * 8, [2] * 8]))
    off = data.index(b"fmt ") + 8 + 12
    struct.pack_into("<H", data, off, 13)
    with pytest.raises(ValueError, match="4-byte groups"):
        _decode_wav(bytes(data))


def test_adpcm_mono_walk_unchanged():
    # mono blocks need no 4-byte grouping (the corpus writes odd counts)
    rate, ch, smp = _decode_wav(
        __import__("b_pdf_parser_spark.mediacodec", fromlist=["x"])
        .encode_wav_adpcm_nibbles(8000, 5, [1, 2, 3])
    )
    assert smp == _ima_replay(5, [1, 2, 3])[:4]


def test_wav_float32_exact_family_and_clamp():
    # n/32768 is exactly representable in float32, so the 2^15-scaled
    # int16 canonicalization recovers n bit-exactly
    ns = [((17 * k) % 65535) - 32767 for k in range(300)]
    rate, ch, smp, codec = _decode_wav(
        encode_wav(48000, 2, [n / 32768.0 for n in ns], float32=True),
        return_codec=True,
    )
    assert (rate, ch, codec, smp) == (48000, 2, "float32", ns)
    # out-of-range floats clamp to int16
    _, _, smp = _decode_wav(encode_wav(8000, 1, [2.0, -3.0], float32=True))
    assert smp == [32767, -32768]


def test_encode_wav_float32_conflicts_rejected():
    with pytest.raises(ValueError, match="at most one"):
        encode_wav(8000, 1, [0.0], float32=True, ulaw=True)


# ---------------------------------------------------------------------------
# animated GIF: inter-frame composition
# ---------------------------------------------------------------------------


def test_gif_frames_disposal_semantics():
    from b_pdf_parser_spark.mediacodec import decode_gif_frames, encode_gif_frames

    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 0), (255, 255, 255)]
    frames = [
        dict(left=0, top=0, w=4, h=1, indices=bytes([1]) * 4,
             disposal=1, delay_cs=10),
        dict(left=0, top=1, w=4, h=1, indices=bytes([3]) * 4,
             disposal=2, delay_cs=20),
        dict(left=2, top=2, w=2, h=1, indices=bytes([0, 1]),
             disposal=3, delay_cs=30, transparent=0),
    ]
    sw, sh, out = decode_gif_frames(encode_gif_frames(4, 3, pal, 0, frames))
    assert (sw, sh) == (4, 3) and [f["delay_cs"] for f in out] == [10, 20, 30]

    def row_r(f, y):
        return [f["rgb"][3 * (y * 4 + x)] for x in range(4)]

    assert row_r(out[0], 0) == [200] * 4          # frame 0 paints row 0
    assert row_r(out[1], 1) == [255] * 4          # disposal 1 left row 0...
    assert row_r(out[1], 0) == [200] * 4          # ...visible under frame 1
    assert row_r(out[2], 1) == [10] * 4           # disposal 2 restored bg
    # transparency: index 0 leaves the canvas (bg), index 1 paints
    assert row_r(out[2], 2) == [10, 10, 10, 200]


def test_gif_frames_local_palette_and_single_frame_matches_static():
    from b_pdf_parser_spark.mediacodec import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        encode_gif_frames,
    )

    gpal = [(1, 2, 3), (9, 8, 7)]
    lpal = [(100, 110, 120), (130, 140, 150)]
    g = encode_gif_frames(2, 2, gpal, 0, [
        dict(left=0, top=0, w=2, h=1, indices=bytes([1, 0]),
             disposal=0, palette=lpal),
    ])
    sw, sh, out = decode_gif_frames(g)
    # local palette scopes to its frame only; untouched rows keep global bg
    assert out[0]["rgb"][0:6] == bytes([130, 140, 150, 100, 110, 120])
    assert out[0]["rgb"][6:9] == bytes([1, 2, 3])

    # a 1-frame full-canvas animation equals the static decoder's pixels
    idx = bytes([0, 1, 1, 0])
    static = decode_gif(encode_gif(2, 2, gpal, idx))
    _, _, anim = decode_gif_frames(encode_gif_frames(2, 2, gpal, 0, [
        dict(left=0, top=0, w=2, h=2, indices=idx, disposal=0),
    ]))
    assert static[3] == anim[0]["rgb"]
