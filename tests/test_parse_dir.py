"""Directory-ingest job: binaryFile scan + per-document CSVs must reproduce
the frozen golden CSV contracts byte-for-byte (the reference's primary user
entry point, batch.py:444-465)."""

import shutil
import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.parse_dir import parse_directory, read_binary_dir, write_per_document_csvs  # noqa: E402

DOCS = ["d1_classic_match", "d2_xrefstm_mismatch", "d3_nouser_td", "d4_multipage_raw"]


def test_parse_directory_golden_csvs(spark, tmp_path, fixtures_dir):
    indir = tmp_path / "pdfs"
    (indir / "sub").mkdir(parents=True)
    for i, name in enumerate(DOCS):
        tgt = (indir / "sub" if i % 2 else indir) / f"{name}.pdf"
        shutil.copy(fixtures_dir / f"{name}.pdf", tgt)
    (indir / "notes.txt").write_text("not a pdf, must be glob-filtered out")

    ext = parse_directory(spark, str(indir)).cache()
    assert ext.count() == len(DOCS)  # glob filtered the .txt
    assert ext.filter(F.col("error").isNotNull()).count() == 0

    out = tmp_path / "out"
    n = write_per_document_csvs(ext, str(out))
    assert n == len(DOCS)
    for name in DOCS:
        got_meta = (out / "metadata" / f"{name}_metadata.csv").read_bytes()
        exp_meta = (fixtures_dir / f"{name}.expected_meta.csv").read_bytes()
        assert got_meta == exp_meta, f"{name} metadata CSV differs"
        got_txn = (out / "transactions" / f"{name}_transactions.csv").read_bytes()
        exp_txn = (fixtures_dir / f"{name}.expected_txns.csv").read_bytes()
        assert got_txn == exp_txn, f"{name} transactions CSV differs"
    ext.unpersist()


def test_read_binary_dir_shape(spark, tmp_path, fixtures_dir):
    indir = tmp_path / "one"
    indir.mkdir()
    shutil.copy(fixtures_dir / "d1_classic_match.pdf", indir / "d1_classic_match.pdf")
    df = read_binary_dir(spark, str(indir))
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    row = df.first()
    assert row["html"][:5] == b"%PDF-" and row["url"].endswith(".pdf")


def test_duplicate_stems_rejected(spark, tmp_path, fixtures_dir):
    indir = tmp_path / "dups"
    (indir / "a").mkdir(parents=True)
    (indir / "b").mkdir()
    shutil.copy(fixtures_dir / "d1_classic_match.pdf", indir / "a" / "same.pdf")
    shutil.copy(fixtures_dir / "d3_nouser_td.pdf", indir / "b" / "same.pdf")
    ext = parse_directory(spark, str(indir))
    import pytest
    with pytest.raises(ValueError, match="collide"):
        write_per_document_csvs(ext, str(tmp_path / "o"))
