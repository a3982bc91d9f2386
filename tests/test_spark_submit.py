"""North-rule deployment clause, executed for real: ``spark-submit
--py-files b_pdf_parser_spark.zip jobs/extract.py`` (BASELINE.json:
"Deployed via spark-submit --py-files, the same job runs ...").

test_kill_resume drives the job as a plain python subprocess; this test
drives it through the actual ``spark-submit`` launcher with the package
shipped as a zip, from a cwd OUTSIDE the repo (so executor workers cannot
resolve the package from the working directory — it must arrive via the
shipped archive / the script's repo-rooted driver path, exactly as on a
real cluster). The output parquet is verified with DuckDB, not Spark, so
the check does not depend on the session under test.
"""

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent

N_DOCS = 200


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit launcher not on PATH")
def test_spark_submit_py_files_job(tmp_path):
    # build the deployment artifact exactly as ship_package() does
    pkgdir = REPO / "b_pdf_parser_spark"
    zpath = tmp_path / "b_pdf_parser_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkgdir.rglob("*.py")):
            z.write(p, f"b_pdf_parser_spark/{p.relative_to(pkgdir)}")

    out = tmp_path / "submitted_job"
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--py-files", str(zpath),
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        str(REPO / "jobs" / "extract.py"),
        "--out", str(out),
        "--n-docs", str(N_DOCS),
        "--waves", "2",
        "--checkpoint-partitions", "8",
    ]
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)  # never attach to the test JVM
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.run(
        cmd, cwd=tmp_path, env=env, timeout=420,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"

    # the job prints its summary as the last JSON line on stdout
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            summary = json.loads(line)
    assert summary is not None, f"no summary line in stdout:\n{proc.stdout[-2000:]}"
    assert summary["docs"] == N_DOCS
    assert summary["complete"] is True
    assert summary["total_partitions"] == 8
    # the corpus deliberately rotates corrupt/empty payloads into the
    # error column (~4.5% of docs); the truth replay states exactly how
    # many, so a regression in EITHER direction (docs erroring that
    # shouldn't, or corrupt docs passing silently) breaks the assert
    from b_pdf_parser_spark.sources.pages import page_kind_expected

    expected_errors = sum(
        1 for i in range(N_DOCS) if page_kind_expected(i)[1]
    )
    assert expected_errors > 0  # corpus must exercise the error path
    assert summary["errors"] == expected_errors

    # verify the parquet sink independently of Spark
    rows = duckdb.sql(
        f"SELECT count(*), count(DISTINCT url) FROM "
        f"read_parquet('{out}/extracted/*/*.parquet', hive_partitioning=1)"
    ).fetchone()
    assert rows == (N_DOCS, N_DOCS)

    manifests = sorted((out / "_manifest").glob("part-*.json"))
    assert len(manifests) == 8
    recs = [json.loads(m.read_text()) for m in manifests]
    assert all(r["docs"] > 0 and r["lineage"] for r in recs)
    # per-partition error metrics must roll up to the corpus truth
    assert sum(r["errors"] for r in recs) == expected_errors
