"""One-shot retro A/B: frozen round-4 package vs frozen round-5 package.

The committed r5 bench artifact regressed -32% vs r4 with no same-window
control (round-5 verdict, "What's wrong" #2). This measures the two CODE
versions against each other under the paired same-window methodology that
bench.py now applies every round (r5-vs-HEAD), settling whether the r5
artifact's drop was code or sandbox weather. Result goes to
``BENCH/AB_RETRO.json`` and is cited in BENCH/BASELINE.md.

Run once: ``python tools/ab_retro.py`` (~5 min at 100k docs, local[16]).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main() -> None:
    spark = bench._session(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = bench._ensure_corpus(spark)
    spark.stop()
    r4 = REPO / "BENCH" / "frozen" / "r4_pkg.tar.gz"
    r5 = REPO / "BENCH" / "frozen" / "r5_pkg.tar.gz"
    out = bench._code_ab(corpus, r4, "r4", new_tar=r5)
    out["note"] = (
        "paired same-window A/B of the r4 package (tag round-4) vs the r5 "
        "package (tag round-5), head_* fields = r5 here; settles whether "
        "the committed r5 bench artifact's -32% was code or ambient load"
    )
    path = REPO / "BENCH" / "AB_RETRO.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
