"""True kill/resume: SIGKILL the job subprocess mid-run, resume, and prove
completeness with no duplicates (the north rule's resumability criterion,
beyond the cooperative max_waves simulation in test_resume.py)."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

N_DOCS = 400


def test_sigkill_then_resume(spark, tmp_path):
    out = tmp_path / "killed_job"
    cmd = [sys.executable, str(REPO / "jobs" / "extract.py"), "--out", str(out),
           "--n-docs", str(N_DOCS), "--waves", "16", "--checkpoint-partitions", "32"]
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    # wait until at least one partition is committed, then kill hard
    manifest = out / "_manifest"
    deadline = time.time() + 240
    while time.time() < deadline:
        if manifest.is_dir() and len(list(manifest.glob("part-*.json"))) >= 2:
            break
        if proc.poll() is not None:
            break  # finished before we could kill it — resume is then a noop
        time.sleep(0.3)
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()

    done_before = {json.loads(p.read_text())["partition_id"]
                   for p in manifest.glob("part-*.json")}
    assert done_before, "job never committed a partition before the kill"

    # resume in-process with the SAME deterministic input
    from jobs.extract import run_extract_job
    from b_pdf_parser_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, N_DOCS, seed=42, num_partitions=4)
    summary = run_extract_job(spark, pages, str(out), checkpoint_partitions=32,
                              waves=16, num_partitions=8)
    assert summary["complete"]
    assert set(summary["processed_partitions"]).isdisjoint(done_before)

    import pyspark.sql.functions as F

    ext = spark.read.parquet(str(out / "extracted"))
    assert ext.count() == N_DOCS
    assert ext.select("url").distinct().count() == N_DOCS
    assert ext.groupBy("url").count().filter(F.col("count") > 1).count() == 0
