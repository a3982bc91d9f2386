"""Kill/resume semantics of the extraction job (SURVEY §7.2 step 7): a
resumed run must process exactly the partitions the killed run didn't,
without duplicating any output row."""

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.extract import load_manifest, load_metrics, run_extract_job  # noqa: E402
from b_pdf_parser_spark.sources.pages import synth_pages_df  # noqa: E402

N = 120
P = 16


def test_kill_and_resume(spark, tmp_path):
    out = str(tmp_path / "job_out")
    pages = synth_pages_df(spark, N, seed=9, num_partitions=4)

    # simulate a kill: only 2 of 4 waves run
    first = run_extract_job(spark, pages, out, checkpoint_partitions=P,
                            waves=4, max_waves=2, num_partitions=8)
    assert not first["complete"]
    done_after_kill = set(load_manifest(out))
    assert 0 < len(done_after_kill) < P
    assert set(first["processed_partitions"]) == done_after_kill

    # resume: must process exactly the complement, reprocess nothing
    second = run_extract_job(spark, pages, out, checkpoint_partitions=P,
                             waves=4, num_partitions=8)
    assert second["complete"]
    assert set(second["skipped_partitions"]) == done_after_kill
    assert set(second["processed_partitions"]).isdisjoint(done_after_kill)
    assert set(second["processed_partitions"]) | done_after_kill == set(range(P))

    # output is exactly one row per url, nothing duplicated or lost
    ext = spark.read.parquet(f"{out}/extracted")
    assert ext.count() == N
    assert ext.select("url").distinct().count() == N

    # metrics table sums agree with the data
    m = load_metrics(spark, out)
    assert m.count() == P
    assert m.agg(F.sum("docs")).collect()[0][0] == N
    errs = ext.filter(F.col("error").isNotNull()).count()
    assert m.agg(F.sum("errors")).collect()[0][0] == errs
    assert all(r["lineage"] for r in m.select("lineage").collect())


def test_rerun_of_complete_job_is_noop(spark, tmp_path):
    out = str(tmp_path / "job_out2")
    pages = synth_pages_df(spark, 40, seed=11, num_partitions=2)
    run_extract_job(spark, pages, out, checkpoint_partitions=8, waves=2, num_partitions=4)
    again = run_extract_job(spark, pages, out, checkpoint_partitions=8, waves=2, num_partitions=4)
    assert again["processed_partitions"] == []
    assert len(again["skipped_partitions"]) == 8
    assert spark.read.parquet(f"{out}/extracted").count() == 40


def test_empty_wave_does_not_crash(spark, tmp_path):
    # 10 docs over 64 partitions / 8 waves: most waves match zero urls —
    # the metrics read-back must tolerate an output dir with no files yet
    out = str(tmp_path / "job_tiny")
    pages = synth_pages_df(spark, 10, seed=3, num_partitions=2)
    summary = run_extract_job(spark, pages, out, checkpoint_partitions=64,
                              waves=8, num_partitions=4)
    assert summary["complete"] and summary["docs"] == 10


def test_overwrite_mode_restored(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    pages = synth_pages_df(spark, 12, seed=4, num_partitions=2)
    run_extract_job(spark, pages, str(tmp_path / "j"), checkpoint_partitions=4,
                    waves=1, num_partitions=2)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == prev
