"""Arithmetic-coded JPEG (T.81 Annex D QM coder + Annex F sequential
models): QM-coder mirror consistency and compression sanity, pipeline
equality with the Huffman encoders on identical pixels, flat-block
exactness (the oracle contract), restart resync, and loud failure on
the still-unsupported progressive arithmetic frame
(see b_pdf_parser_spark/arithjpeg.py)."""

import numpy as np
import pytest

from b_pdf_parser_spark.arithjpeg import (
    QmDecoder,
    QmEncoder,
    encode_jpeg_arith,
)
from b_pdf_parser_spark.jpegcodec import (
    QUANT_CHROMA,
    QUANT_LUM,
    decode_jpeg,
    encode_jpeg,
)

_Q8 = ((8,) + QUANT_LUM[1:], (8,) + QUANT_CHROMA[1:])


def _roundtrip_bits(bits, n_bins=4):
    """Encode a bit sequence across n_bins adaptive contexts (round-robin)
    and decode it back through the mirrored decoder."""
    enc = QmEncoder()
    stats = bytearray(n_bins)
    for j, b in enumerate(bits):
        enc.encode(stats, j % n_bins, b)
    data = enc.finish() + b"\xff\xd9"  # terminate like a real scan
    dec = QmDecoder(data, 0)
    stats2 = bytearray(n_bins)
    return [dec.decode(stats2, j % n_bins) for j in range(len(bits))], data


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("p_one", [0.02, 0.2, 0.5, 0.9])
def test_qm_coder_roundtrip_random(seed, p_one):
    rng = np.random.RandomState(seed * 17 + int(p_one * 100))
    bits = (rng.random_sample(4000) < p_one).astype(int).tolist()
    got, _ = _roundtrip_bits(bits)
    assert got == bits


def test_qm_coder_roundtrip_adversarial_patterns():
    # long MPS runs, alternations, and bursts — exercises renorm, carry
    # propagation and conditional-exchange paths
    bits = [0] * 500 + [1] * 500 + [0, 1] * 250 + [1, 1, 0] * 100
    got, _ = _roundtrip_bits(bits, n_bins=1)
    assert got == bits


def test_qm_coder_compression_near_entropy():
    # a wrong Table D.3 transition still round-trips (both sides share the
    # table) but shows up here: a p=0.05 source has H ~ 0.286 bits/symbol,
    # so 20k symbols must compress well below 1 kB (plus adaptation ramp)
    rng = np.random.RandomState(42)
    bits = (rng.random_sample(20000) < 0.05).astype(int).tolist()
    got, data = _roundtrip_bits(bits, n_bins=1)
    assert got == bits
    assert len(data) < 1100  # entropy bound ~715 B; allow adaptation slack


def _flat_gray(i, w, h):
    bw = w // 8
    return bytes(
        (i * 31 + ((y // 8) * bw + x // 8) * 17) % 256
        for y in range(h)
        for x in range(w)
    )


@pytest.mark.parametrize("i", [0, 5, 21])
def test_flat_gray_bit_exact(i):
    w, h = 24, 16
    px = _flat_gray(i, w, h)
    data = encode_jpeg_arith(w, h, 1, px, qtables=_Q8)
    assert data[3] != 0xC4  # no DHT in an arithmetic stream
    assert b"\xff\xc9" in data and b"\xff\xcc" in data  # SOF9 + DAC
    assert decode_jpeg(data) == (w, h, 1, px)


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("seed", [3, 11])
def test_equals_huffman_pipeline_on_random_pixels(channels, seed):
    # arithmetic coding is lossless entropy coding over the SAME quantized
    # coefficients -> decoded output must be byte-identical to the Huffman
    # encoder's decode for any input, not just flat blocks
    rng = np.random.RandomState(seed)
    w, h = 29, 18  # odd dims: pad/crop path included
    px = rng.randint(0, 256, size=h * w * channels, dtype=np.uint8).tobytes()
    huff = decode_jpeg(encode_jpeg(w, h, channels, px))
    arith = decode_jpeg(encode_jpeg_arith(w, h, channels, px))
    assert arith == huff


def test_restart_markers_resync_and_match_plain():
    rng = np.random.RandomState(13)
    w, h = 40, 24
    px = rng.randint(0, 256, size=h * w, dtype=np.uint8).tobytes()
    plain = decode_jpeg(encode_jpeg_arith(w, h, 1, px, qtables=_Q8))
    for interval in (1, 3, 7):
        data = encode_jpeg_arith(
            w, h, 1, px, qtables=_Q8, restart_interval=interval
        )
        assert b"\xff\xd0" in data
        assert decode_jpeg(data) == plain


def test_arith_beats_huffman_on_typical_content():
    # the point of arithmetic coding: on smooth content with default
    # tables it should not be larger than the Huffman encoding
    w, h = 64, 64
    px = bytes(min(255, x * 2 + y) for y in range(h) for x in range(w))
    assert len(encode_jpeg_arith(w, h, 1, px)) < len(encode_jpeg(w, h, 1, px))


def test_progressive_arithmetic_rejected_loud():
    data = bytearray(encode_jpeg_arith(8, 8, 1, _flat_gray(1, 8, 8), qtables=_Q8))
    idx = bytes(data).index(b"\xff\xc9")
    data[idx + 1] = 0xCA  # SOF10: progressive arithmetic
    with pytest.raises(ValueError, match="non-baseline frame"):
        decode_jpeg(bytes(data))


def test_truncation_fails_loud():
    # noisy pixels -> the entropy segment is long, so cutting shortly
    # after SOS leaves the decoder starved mid-scan
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=32 * 32, dtype=np.uint8).tobytes()
    data = encode_jpeg_arith(32, 32, 1, px, qtables=_Q8)
    sos = data.index(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(data[: sos + 20])
