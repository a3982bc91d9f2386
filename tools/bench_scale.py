"""Order-of-magnitude scale evidence (run once per round, ~5-8 min).

Everything in the per-round bench runs at sf0.1 (100k docs / ~230 MB) —
thin evidence for a 100 TB design claim. This tool measures, at 10× that:

* the extraction headline over a 1M-doc corpus (same generator, same
  seed), best-of-2 walls at the local[16] throughput plateau;
* the STRAGGLER RATIO (max/median task wall over tasks that processed
  rows) of the extraction stage via ``extract_partition_walls`` — the
  salt-split's effectiveness as a measured number;
* the 5 slowest board queries (the LSH/CC dedup family) over a 10×
  ``documents`` table built by per-replica alphabet rotation: each
  replica k rewrites a-z by rot-k, which preserves every intra-replica
  shingle/cluster structure exactly (bijective char map) while making
  cross-replica shingles disjoint — so the workload is 10 independent
  copies of the sf0.1 problem, i.e. an honest linear scale-up with the
  same skew profile, not an artificial dup explosion.

Results land in ``BENCH/SCALE.json``; ``bench.py`` embeds a compact
summary into its stdout line — flagged stale when the corpus version no
longer matches (the embed also carries ``docs``, so the scale the numbers
were measured at is always self-describing) — so the driver-recorded
BENCH_r{N} carries the scale numbers without paying the 1M-doc wall
inside the driver's window.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
SEED = 42
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
# the round-4 five slowest registered queries (the bucketed LSH/CC family)
SLOWEST = [
    "dedup_decisions",
    "near_dup_keep_best",
    "near_dup_clusters",
    "intra_doc_repetition",
    "duplicate_spans",
]


def _session():
    from pyspark.sql import SparkSession

    local_dir = os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-scale")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.files.maxPartitionBytes", "16777216")
        .config("spark.local.dir", local_dir)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _ensure_corpus(spark, n_docs: int) -> str:
    import b_pdf_parser_spark
    from b_pdf_parser_spark.sources.pages import CORPUS_VERSION, synth_pages_df

    cache = REPO / ".bench_cache" / f"pages_v{CORPUS_VERSION}_{n_docs}_{SEED}.parquet"
    if not (cache / "_SUCCESS").exists():
        b_pdf_parser_spark.ship_package(spark)
        synth_pages_df(spark, n_docs, seed=SEED, num_partitions=128).write.mode(
            "overwrite"
        ).parquet(str(cache))
    return str(cache)


def _ensure_x10_dir(spark) -> str:
    """documents ×10 by per-replica rot-k; other tables symlinked."""
    import pyspark.sql.functions as F

    out = REPO / ".bench_cache" / "sfx10"
    docs = out / "documents.parquet"
    if not (docs / "_SUCCESS").exists():
        out.mkdir(parents=True, exist_ok=True)
        abc = "abcdefghijklmnopqrstuvwxyz"
        d = spark.read.parquet(f"{SF01}/documents.parquet")
        reps = spark.range(0, REPLICAS).select(F.col("id").alias("replica"))
        # per-replica rotation as a when-chain (codegen'd, no UDF)
        rot = F.col("text")
        for k in range(1, REPLICAS):
            rot = F.when(
                F.col("replica") == k, F.translate(F.col("text"), abc, abc[k:] + abc[:k])
            ).otherwise(rot)
        scaled = (
            d.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") * REPLICAS + F.col("replica")).alias("doc_id"),
                rot.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        scaled.repartition(32).write.mode("overwrite").parquet(str(docs))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        link = out / f"{t}.parquet"
        if not link.exists():
            os.symlink(f"{SF01}/{t}.parquet", link)
    return str(out)


def main() -> None:
    import b_pdf_parser_spark
    import pyspark.sql.functions as F
    from b_pdf_parser_spark.operators.extract import (
        extract_pages,
        extract_partition_walls,
    )
    from b_pdf_parser_spark.sources.pages import CORPUS_VERSION

    import __spark_entry__ as entry

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    b_pdf_parser_spark.ship_package(spark)
    corpus = _ensure_corpus(spark, SCALE_DOCS)
    pages = spark.read.parquet(corpus)

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup python workers + codegen, untimed
    _noop(extract_pages(pages.limit(512), num_partitions=CPUS))

    walls = []
    for _ in range(2):
        t0 = time.time()
        _noop(extract_pages(pages, num_partitions=CPUS * 4))
        walls.append(round(time.time() - t0, 2))
    wall = min(walls)

    # straggler pass: identical plan, per-task walls
    rows = extract_partition_walls(pages, num_partitions=CPUS * 4).collect()
    worked = sorted(r["wall_sec"] for r in rows if r["n_docs"] > 0)
    straggler = round(worked[-1] / statistics.median(worked), 3) if worked else None

    # the 5 slowest board queries at documents x10
    x10 = _ensure_x10_dir(spark)
    reg = entry.queries()
    _noop(reg["intra_doc_repetition"](spark, SF01))  # warm the family's codegen
    q_times = {}
    for name in SLOWEST:
        t0 = time.time()
        _noop(reg[name](spark, x10))
        q_times[name] = round(time.time() - t0, 2)

    n_x10 = spark.read.parquet(f"{x10}/documents.parquet").count()
    spark.stop()

    out = {
        "corpus_version": CORPUS_VERSION,
        "docs": SCALE_DOCS,
        "cpus": CPUS,
        "extract_wall_sec": wall,
        "extract_wall_sec_reps": walls,
        "docs_per_sec": round(SCALE_DOCS / wall, 1),
        "straggler_ratio": straggler,
        "straggler_tasks": len(worked),
        "x10_documents_rows": n_x10,
        "queries_x10_sec": q_times,
        "queries_x10_total_sec": round(sum(q_times.values()), 2),
        "measured_unix": int(time.time()),
    }
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "SCALE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
