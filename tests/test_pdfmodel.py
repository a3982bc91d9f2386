"""PDF object-model unit + property tests (mirror of the reference's
fuzz/unit layers, SURVEY §5; reference analog tests/test_utils.py:165-197
no-crash invariants)."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from b_pdf_parser_spark import pdfmodel as pm
from b_pdf_parser_spark.pdfwriter import build_pdf, pdf_from_lines


# ---- lexer ----------------------------------------------------------------

def test_parse_basic_values():
    assert pm.parse_value(b" 42 ", 0)[0] == 42
    assert pm.parse_value(b"-3.5", 0)[0] == -3.5
    assert pm.parse_value(b"true", 0)[0] is True
    assert pm.parse_value(b"false", 0)[0] is False
    assert pm.parse_value(b"null", 0)[0] is None
    assert pm.parse_value(b"/Name#20x", 0)[0] == "Name x"
    assert pm.parse_value(b"(abc)", 0)[0] == b"abc"
    assert pm.parse_value(b"<414243>", 0)[0] == b"ABC"
    assert pm.parse_value(b"<41424>", 0)[0] == b"AB@"  # odd digit → pad 0
    assert pm.parse_value(b"[1 2 (x)]", 0)[0] == [1, 2, b"x"]
    assert pm.parse_value(b"<< /A 1 /B [2] >>", 0)[0] == {"A": 1, "B": [2]}
    assert pm.parse_value(b"7 0 R", 0)[0] == pm.Ref(7, 0)
    assert pm.parse_value(b"% comment\n9", 0)[0] == 9


def test_literal_string_escapes():
    assert pm.parse_value(rb"(a\(b\)c)", 0)[0] == b"a(b)c"
    assert pm.parse_value(rb"(a\nb\tc)", 0)[0] == b"a\nb\tc"
    assert pm.parse_value(rb"(\101\102)", 0)[0] == b"AB"
    assert pm.parse_value(rb"(\8)", 0)[0] == b"8"  # unknown escape passthrough
    assert pm.parse_value(b"(nest(ed))", 0)[0] == b"nest(ed)"
    with pytest.raises(pm.PdfError):
        pm.parse_value(b"(unterminated", 0)


def test_number_vs_ref_disambiguation():
    # "1 2" alone is a number then another number, not a ref
    v, i = pm.parse_value(b"1 2 obj", 0)
    assert v == 1
    v, _ = pm.parse_value(b"[1 0 R 2]", 0)
    assert v == [pm.Ref(1, 0), 2]


# ---- filters ----------------------------------------------------------------

def test_png_up_predictor_roundtrip():
    rows = [bytes([i, i + 1, i + 2, i + 3, i + 4]) for i in range(0, 40, 5)]
    filt = bytearray()
    prev = bytes(5)
    for r in rows:
        filt.append(2)
        filt += bytes((r[k] - prev[k]) & 0xFF for k in range(5))
        prev = r
    out = pm._apply_png_predictor(bytes(filt), columns=5, colors=1, bpc=8)
    assert out == b"".join(rows)


def test_all_png_filter_types():
    # filter type 0 (None) and 1 (Sub)
    data = bytes([0, 10, 20, 30]) + bytes([1, 5, 5, 5])
    out = pm._apply_png_predictor(data, columns=3, colors=1, bpc=8)
    assert out == bytes([10, 20, 30, 5, 10, 15])  # Sub adds the left byte


def test_flate_robustness():
    assert pm._flate(zlib.compress(b"hello")) == b"hello"
    with pytest.raises(pm.PdfError):
        pm._flate(b"not zlib data")


# ---- document structure -----------------------------------------------------

@pytest.mark.parametrize("xref_stream", [False, True])
@pytest.mark.parametrize("td_ops", [False, True])
@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_all_variants(xref_stream, td_ops, compress):
    lines = [["alpha beta", "gamma (delta)", "1.234.567,89"], ["page two"]]
    pdf = pdf_from_lines(lines, xref_stream=xref_stream, td_ops=td_ops, compress=compress)
    pages = pm.extract_pdf_pages(pdf)
    assert pages == ["alpha beta\ngamma (delta)\n1.234.567,89\n", "page two\n"]
    assert pm.extract_pdf_text(pdf) == (
        "alpha beta\ngamma (delta)\n1.234.567,89\n\npage two\n\n"
    )


def test_xref_recovery_from_corrupt_table():
    pdf = pdf_from_lines([["recovered text"]])
    # smash the startxref offset → forces brute-force object scan
    broken = pdf.replace(b"startxref", b"startxrEF", 1)
    assert pm.extract_pdf_text(broken) == "recovered text\n\n"


def test_type0_roundtrip_all_variants():
    lines = [["alpha beta", "gamma (delta)", "1.234.567,89"], ["page two"]]
    for xs in (False, True):
        for td in (False, True):
            pdf = pdf_from_lines(lines, type0=True, xref_stream=xs, td_ops=td)
            assert pm.extract_pdf_pages(pdf) == [
                "alpha beta\ngamma (delta)\n1.234.567,89\n", "page two\n"
            ], (xs, td)
    # the payload carries no literal text — decode must walk the CMap
    raw = pdf_from_lines(lines, type0=True, compress=False)
    assert b"(alpha" not in raw and b"Identity-H" in raw


def test_tounicode_cmap_parse_forms():
    # bfchar, incremented bfrange, and array-form bfrange (PDF 1.7 §9.10.3)
    cmap_src = (
        b"/CIDInit /ProcSet findresource begin begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0001> <0041> <0002> <00E9> endbfchar\n"
        b"1 beginbfrange <0010> <0012> <0061> endbfrange\n"
        b"1 beginbfrange <0020> <0021> [<0058> <005A>] endbfrange\n"
        b"endcmap end"
    )
    cmap, nbytes = pm._parse_tounicode(cmap_src)
    assert nbytes == 2
    assert cmap[0x0001] == "A" and cmap[0x0002] == "é"
    assert cmap[0x0010] == "a" and cmap[0x0011] == "b" and cmap[0x0012] == "c"
    assert cmap[0x0020] == "X" and cmap[0x0021] == "Z"


def test_type0_identity_fallback_without_tounicode():
    # unmapped CIDs decode as identity codepoints (Identity-H convention)
    dec = pm._Type0Decoder({}, 2)
    assert dec(b"\x00A\x00B") == "AB"
    dec2 = pm._Type0Decoder({0x41: "Z"}, 2)
    assert dec2(b"\x00A\x00B") == "ZB"


def test_pages_and_tables_roundtrip():
    # a page mixing single-span header lines, a 6-cell table (header + rows)
    # and single-span summary lines: the table is detected as cell rows, the
    # page text still reads in order with space-joined cells
    lines = [
        "No. Rekening",
        ": 1234567890123",
        ["Tanggal Transaksi", "Uraian Transaksi", "Teller", "Debet", "Kredit", "Saldo"],
        ["01/01/24 10:00:00", "TRANSFER MASUK", "1234567", "0,00", "5.000,00", "1.000,00"],
        ["02/01/24 11:30:00", "TARIK TUNAI ATM", "7654321", "2.500,00", "0,00", "998,00"],
        "Saldo Awal",
        "1.000,00",
    ]
    pdf = pdf_from_lines([lines])
    pages, tables = pm.extract_pdf_pages_and_tables(pdf)
    assert len(tables) == 1 and len(tables[0]) == 3
    assert tables[0][1] == ["01/01/24 10:00:00", "TRANSFER MASUK", "1234567",
                            "0,00", "5.000,00", "1.000,00"]
    assert "No. Rekening\n" in pages[0]
    assert "01/01/24 10:00:00 TRANSFER MASUK 1234567 0,00 5.000,00 1.000,00\n" in pages[0]
    # text-only API unchanged (no tables in its output)
    assert pm.extract_pdf_pages(pdf) == pages


def test_tables_need_min_rows_and_cols():
    # a lone 6-cell line (no second row) and 5-cell lines are not tables
    pdf = pdf_from_lines([[
        ["a", "b", "c", "d", "e", "f"],
        "plain line",
        ["1", "2", "3", "4", "5"],
        ["6", "7", "8", "9", "10"],
    ]])
    _, tables = pm.extract_pdf_pages_and_tables(pdf)
    assert tables == []


def test_bare_lf_xref_entries():
    # some writers end classic-xref entries with a bare \n (19-byte stride);
    # the parser must not drift 1 byte per entry (nor leak a ValueError)
    pdf = pdf_from_lines([["bare lf xref"]])
    head, sep, tail = pdf.partition(b"xref\n0 ")
    bare = head + sep + tail.replace(b" n \n", b" n\n").replace(b" f \n", b" f\n")
    assert bare != pdf
    assert pm.extract_pdf_text(bare) == "bare lf xref\n\n"


def test_same_line_spans_sorted_by_x():
    pdf = build_pdf([[(200.0, 700.0, "right"), (72.0, 700.0, "left")]])
    assert pm.extract_pdf_text(pdf) == "left right\n\n"


def test_line_y_clustering():
    pdf = build_pdf([[(72.0, 700.0, "a"), (120.0, 699.0, "b"), (72.0, 680.0, "c")]])
    assert pm.extract_pdf_text(pdf) == "a b\nc\n\n"


def test_errors_raise_pdferror():
    for payload in (b"", b"%PDF-1.4 mock PDF content", b"\x00" * 64,
                    pdf_from_lines([["x"]])[:150]):
        with pytest.raises(pm.PdfError):
            pm.extract_pdf_text(payload)


# ---- property tests ---------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2048))
def test_never_raises_anything_but_pdferror(data):
    try:
        pm.extract_pdf_text(b"%PDF-" + data)
    except pm.PdfError:
        pass


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=40),
                 min_size=1, max_size=8),
        min_size=1, max_size=3,
    ),
    st.booleans(),
    st.booleans(),
)
def test_writer_parser_roundtrip_property(pagelines, xs, td):
    # strip() because layout join collapses leading/trailing whitespace
    pdf = pdf_from_lines(pagelines, xref_stream=xs, td_ops=td)
    got = pm.extract_pdf_pages(pdf)
    expected = [
        "".join(" ".join(ln.split()) + "\n" for ln in page if ln.split()) for page in pagelines
    ]
    got_norm = ["".join(" ".join(l.split()) + "\n" for l in p.splitlines() if l.split()) for p in got]
    assert got_norm == expected


def test_utf16be_text_string():
    from b_pdf_parser_spark.pdfwriter import build_pdf
    # hand-assemble a hex UTF-16BE string payload through the hex-string path
    content = b"BT /F1 10 Tf 1 0 0 1 72 700 Tm <FEFF0048006900210020D83DDE00> Tj ET"
    spans = pm._extract_spans(content)
    assert spans[0].text == "Hi! \U0001f600"  # surrogate pair decoded


def test_bogus_encrypt_dict_rejected():
    # /Encrypt pointing at a nonexistent object: still PdfError, not garbage
    pdf = pdf_from_lines([["secret"]])
    broken = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(pm.PdfError, match="Encrypt"):
        pm.extract_pdf_text(broken)


def test_xy_cut_two_column_reading_order():
    # independent baselines left/right → column split, left read first
    left = [(60.0, 760.0 - 14 * i, f"left {i} alpha beta") for i in range(5)]
    right = [(330.0, 753.0 - 14 * i, f"right {i} gamma delta") for i in range(5)]
    pdf = build_pdf([left + right])
    lines = pm.extract_pdf_text(pdf).strip().split("\n")
    assert lines == [f"left {i} alpha beta" for i in range(5)] + [
        f"right {i} gamma delta" for i in range(5)
    ]


def test_xy_cut_does_not_split_tables():
    # shared baselines on both sides of the gutter ⇒ table, NOT columns:
    # rows must stay joined left-to-right (and still be detected as a table)
    rows = [
        ["Tanggal Transaksi", "Uraian Transaksi", "Teller", "Debet", "Kredit", "Saldo"],
        ["01/01/24 10:00:00", "TRANSFER MASUK", "1234567", "0,00", "5.000,00", "1.000,00"],
        ["02/01/24 11:30:00", "TARIK TUNAI ATM", "7654321", "2.500,00", "0,00", "998,00"],
        ["03/01/24 12:00:00", "SETORAN TUNAI", "1111111", "0,00", "1.000,00", "1.998,00"],
    ]
    pdf = pdf_from_lines([rows])
    pages, tables = pm.extract_pdf_pages_and_tables(pdf)
    assert len(tables) == 1 and len(tables[0]) == 4
    assert pages[0].splitlines()[1].startswith("01/01/24 10:00:00 TRANSFER MASUK")


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=1024))
def test_tounicode_parser_total_on_garbage(data):
    # the CMap parser must be total: any bytes → (dict, int), no exceptions
    cmap, nbytes = pm._parse_tounicode(data)
    assert isinstance(cmap, dict) and nbytes >= 1


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64), st.integers(min_value=1, max_value=4))
def test_type0_decoder_total_on_garbage(raw, nbytes):
    out = pm._Type0Decoder({1: "A", 0x20AC: "€"}, nbytes)(raw)
    assert isinstance(out, str)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=2048))
def test_pages_and_tables_never_raises_anything_but_pdferror(data):
    try:
        pm.extract_pdf_pages_and_tables(b"%PDF-" + data)
    except pm.PdfError:
        pass


# -- encryption (standard security handler, §7.6.3) -------------------------


def _enc_sample(**kw):
    from b_pdf_parser_spark.pdfwriter import pdf_from_lines

    lines = [["Account Statement", "Account Number: 777-IDR",
              "01.02.2023 10:11 Payment to ACME (cafe) 100,50 200,00"]]
    return pdf_from_lines(lines, **kw)


@pytest.mark.parametrize("mode", [True, "rc4-40"])
@pytest.mark.parametrize("xs", [False, True])
def test_encrypted_roundtrip_matches_plaintext(mode, xs):
    plain = pm.extract_pdf_text(_enc_sample(xref_stream=xs))
    got = pm.extract_pdf_text(_enc_sample(xref_stream=xs, encrypt=mode))
    assert got == plain
    assert "Account Number" in got


def test_encrypted_strings_not_in_cleartext_on_disk():
    # the point of the feature: without decryption the text is unreadable
    data = _enc_sample(encrypt=True, compress=False)
    assert b"Account Statement" not in data
    assert pm.extract_pdf_text(data).startswith("Account Statement")


def test_encrypted_wrong_user_password_raises():
    data = _enc_sample(encrypt=True)
    # corrupt the /U validator in place (same length → offsets stay valid)
    i = data.find(b"/U (")
    tampered = data[: i + 4] + bytes([data[i + 4] ^ 0xFF]) + data[i + 5 :]
    with pytest.raises(pm.PdfError, match="password"):
        pm.extract_pdf_text(tampered)


def test_encrypted_aes_rejected_loud():
    data = _enc_sample(encrypt=True).replace(b"/V 2 /R 3 /Length 128", b"/V 4 /R 4 /Length 128", 1)
    with pytest.raises(pm.PdfError, match="AES|unsupported"):
        pm.extract_pdf_text(data)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=3000), st.binary(min_size=1, max_size=16))
def test_encrypted_byte_splice_keeps_pdferror_contract(pos, junk):
    data = _enc_sample(encrypt=True, xref_stream=True)
    spliced = data[: pos % len(data)] + junk + data[pos % len(data) :]
    try:
        pm.extract_pdf_text(spliced)
    except pm.PdfError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=159),
    st.integers(min_value=0, max_value=5000),
    st.binary(min_size=1, max_size=16),
)
def test_formula_hazard_splice_keeps_pdferror_contract(i, pos, junk):
    # splice garbage into the hazard-rotated formula docs (ObjStm,
    # Type0, RC4-40/128, AES-128, inline images, /Differences, image
    # XObjects and their intersections): corruption may only surface as
    # PdfError — any other exception escaping the walk would crash a
    # 10^12-doc batch instead of landing in the error column
    from b_pdf_parser_spark.sources.pages import formula_statement_pdf

    data = formula_statement_pdf(i)
    spliced = data[: pos % len(data)] + junk + data[pos % len(data) :]
    try:
        pm.extract_pdf_text(spliced)
    except pm.PdfError:
        pass


def test_formula_aes256_stratum_text_identical():
    # the flag-gated V5/R6 upgrade (extract_formula's i%80==3 docs) must
    # not change extracted text — encryption alters bytes on disk only —
    # and must really produce an /AESV3 R6 dictionary
    from b_pdf_parser_spark.sources.pages import formula_statement_pdf

    for i in (3, 83):
        clean = formula_statement_pdf(i, aes256=False)
        enc = formula_statement_pdf(i, aes256=True)
        assert b"/AESV3" in enc and b"/AESV3" not in clean
        assert pm.extract_pdf_text(enc) == pm.extract_pdf_text(clean)
    # non-stratum docs are byte-identical under the flag
    assert formula_statement_pdf(4, aes256=True) == formula_statement_pdf(4)


def test_aes_known_answer_vectors():
    # FIPS-197 Appendix C — validates the generated S-box, T-tables and key
    # schedule for all three key sizes
    from b_pdf_parser_spark.aescipher import (aes_cbc_decrypt, aes_cbc_encrypt,
                                              aes_encrypt_block)

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    vec = {
        "000102030405060708090a0b0c0d0e0f": "69c4e0d86a7b0430d8cdb78070b4c55a",
        "000102030405060708090a0b0c0d0e0f1011121314151617":
            "dda97ca4864cdfe06eaf70a0ec0d7191",
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f":
            "8ea2b7ca516745bfeafc49904b496089",
    }
    for k, c in vec.items():
        assert aes_encrypt_block(bytes.fromhex(k), pt).hex() == c
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes((i * 7) % 256 for i in range(n))
        assert aes_cbc_decrypt(key, aes_cbc_encrypt(key, iv, data)) == data


@pytest.mark.parametrize("mode", ["aes-128", "aes-256"])
def test_aes_encrypted_roundtrip_matches_plaintext(mode):
    plain = pm.extract_pdf_text(_enc_sample(xref_stream=True))
    got = pm.extract_pdf_text(_enc_sample(xref_stream=True, encrypt=mode))
    assert got == plain


def test_aes256_wrong_user_password_raises():
    data = _enc_sample(encrypt="aes-256")
    i = data.find(b"/U (")
    tampered = data[: i + 4] + bytes([data[i + 4] ^ 0xFF]) + data[i + 5 :]
    with pytest.raises(pm.PdfError, match="password"):
        pm.extract_pdf_text(tampered)


# -- LZW / RunLength filters (§7.4.4 / §7.4.5) -------------------------------


def _lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-variant LZW encoder (EarlyChange=1) for roundtrip tests."""
    codes = []
    width = 9

    def emit(code):
        codes.append((code, width))

    d = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(256)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in d:
            w += c
            continue
        emit(d[w])
        d[w + c] = nxt
        nxt += 1
        if nxt >= (1 << width) - 1 and width < 12:
            width += 1
        w = c
    if w:
        emit(d[w])
    emit(257)
    acc = nbits = 0
    out = bytearray()
    for code, wd in codes:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_spec_known_answer():
    # PDF 1.7 §7.4.4.2 example: '-----A---B' ⇒ codes 256 45 258 258 65 259 66 257
    codes = [256, 45, 258, 258, 65, 259, 66, 257]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert pm._lzw(bytes(out)) == b"-----A---B"


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=600))
def test_lzw_roundtrip(data):
    assert pm._lzw(_lzw_encode(data)) == data


def test_runlength_decode():
    # 2 literals, a 4-run of 'x', EOD, trailing junk ignored
    enc = bytes([1]) + b"ab" + bytes([253]) + b"x" + bytes([128]) + b"IGNORED"
    assert pm._runlength(enc) == b"abxxxx"
    assert pm._runlength(b"") == b""


def test_decode_stream_lzw_and_runlength_filters():
    content = b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (lzw works) Tj ET"
    lzw_pdf = (
        b"%%PDF-1.3\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Filter /LZWDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n"
    ) % (len(_lzw_encode(content)), _lzw_encode(content))
    # no xref at all → exercises the rebuild path too
    assert pm.extract_pdf_text(lzw_pdf) == "lzw works\n\n"
    rl = bytes([len(content) - 1]) + content + bytes([128])
    rl_pdf = lzw_pdf.replace(b"/Filter /LZWDecode /Length %d" % len(_lzw_encode(content)),
                             b"/Filter /RunLengthDecode /Length %d" % len(rl)).replace(
        b"stream\n" + _lzw_encode(content), b"stream\n" + rl)
    assert pm.extract_pdf_text(rl_pdf) == "lzw works\n\n"


def test_aes_bad_padding_raises():
    # a corrupted AES stream must land in the error column, not silently
    # decode to truncated/empty text (RC4/flate failures raise — AES should
    # match that contract)
    from b_pdf_parser_spark.aescipher import aes_cbc_decrypt, aes_cbc_encrypt

    key = bytes(range(16))
    iv = bytes(16)
    ct = aes_cbc_encrypt(key, iv, b"some text payload")
    assert aes_cbc_decrypt(key, ct) == b"some text payload"
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, ct[:-1] + bytes([ct[-1] ^ 0x5A]))  # broken pad
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, ct + b"x")  # not block-aligned
    # zero-length encrypted strings remain legal (writers emit them)
    assert aes_cbc_decrypt(key, b"") == b""
    assert aes_cbc_decrypt(key, iv) == b""
    # ...but a truncation INSIDE the IV is corruption, not emptiness —
    # it must fail loud like every other malformed AES payload
    for n in (1, 8, 15):
        with pytest.raises(ValueError):
            aes_cbc_decrypt(key, ct[:n])


def test_aes_numpy_batch_decrypt_bit_equals_scalar():
    # the vectorized per-stream decrypt (hot extraction path) must be
    # bit-identical to the scalar reference rounds, for every key length
    # and for block counts straddling the dispatch threshold
    import random

    from b_pdf_parser_spark.aescipher import (_dec_words, _decrypt_block_w,
                                              _decrypt_blocks_np, _expand_key)

    rng = random.Random(7)
    for key_len in (16, 24, 32):
        key = bytes(rng.randrange(256) for _ in range(key_len))
        kw = _dec_words(_expand_key(key))
        for n_blocks in (1, 4, 5, 33):
            blocks = bytes(rng.randrange(256) for _ in range(16 * n_blocks))
            scalar = b"".join(
                _decrypt_block_w(kw, blocks[i : i + 16])
                for i in range(0, len(blocks), 16)
            )
            assert _decrypt_blocks_np(kw, blocks) == scalar, (key_len, n_blocks)


def test_aes_v4_key_length_from_stdcf_only():
    # a V4 file may declare the key size only in the StdCF crypt filter
    # (/Length there is a BYTE count per spec); blanking the top-level
    # /Length with same-width spaces keeps every xref offset valid
    plain = pm.extract_pdf_text(_enc_sample())
    data = _enc_sample(encrypt="aes-128")
    marker = b"/V 4 /R 4 /Length 128"
    assert marker in data
    stripped = data.replace(marker, b"/V 4 /R 4            ", 1)
    assert len(stripped) == len(data)
    assert pm.extract_pdf_text(stripped) == plain


def test_inline_images_skipped_not_tokenized():
    # BI..ID..EI payloads are raw binary INSIDE the content stream; a
    # tokenizer that scans them would let a stray '(' swallow the stream or
    # fabricate text from pixel bytes spelling '(x) Tj'
    from b_pdf_parser_spark.pdfwriter import pdf_from_lines

    lines = [["Account Statement", "Account Number: 777-IDR",
              "01.02.2023 10:11 Payment to ACME (cafe) 100,50 200,00"]]
    plain = pm.extract_pdf_text(pdf_from_lines(lines))
    evil = (bytes(range(256))
            + b"(swallow) 1 0 0 1 5 5 Tm (phantom) Tj BT ET zzEIzz <be> Tj")
    for compress in (False, True):
        for enc in (False, "aes-128"):
            data = pdf_from_lines(
                lines, inline_images=[(0, evil), (0, b"\x00\x01EI9(")],
                compress=compress, encrypt=enc)
            assert pm.extract_pdf_text(data) == plain, (compress, enc)


def test_differences_encoding_roundtrip():
    # /Encoding /Differences carries chars outside latin-1 (€ “ ” — …) by
    # remapping byte codes to glyph names — decode must walk the table
    from b_pdf_parser_spark.pdfwriter import pdf_from_lines

    diffs = {128: "Euro", 129: "quotedblleft", 130: "quotedblright",
             131: "emdash", 132: "ellipsis", 200: "eacute", 201: "udieresis"}
    lines = [["Price update €99 “smart” punctuation — café über…",
              "Account Number: 777-IDR"]]
    for xs in (False, True):
        for enc in (False, "aes-128"):
            got = pm.extract_pdf_text(
                pdf_from_lines(lines, differences=diffs, xref_stream=xs, encrypt=enc))
            assert "€99" in got and "“smart”" in got and "café über…" in got
            assert "Account Number: 777-IDR" in got
    # uniXXXX glyph names resolve; unknown names fall back to the base code
    got = pm.extract_pdf_text(
        pdf_from_lines([["X€Y"]], differences={140: "uni20AC", 141: "bogusname"}))
    assert "X€Y" in got


def test_differences_remap_of_ascii_codes():
    # remapping codes ALREADY used by the text (digits, letters) means the
    # shown bytes differ from latin-1 — proves decode really uses the table
    from b_pdf_parser_spark.pdfwriter import pdf_from_lines

    diffs = {65: "zero", 48: "A"}  # swap 'A' and '0'
    data = pdf_from_lines([["A0A0 balance 100"]], differences=diffs, compress=False)
    assert b"(0A0A" in data  # bytes on the page are swapped...
    assert "A0A0 balance 100" in pm.extract_pdf_text(data)  # ...decode restores


def test_v4_toplevel_length_40_is_bits_not_bytes():
    # top-level /Length is defined in BITS; 40 is legal (RC4-40) and must
    # NOT be scaled by the StdCF bytes->bits heuristic
    plain = pm.extract_pdf_text(_enc_sample())
    data = _enc_sample(encrypt="rc4-40")
    assert b"/V 1 /R 2" in data or b"/Length 40" in data
    assert pm.extract_pdf_text(data) == plain
