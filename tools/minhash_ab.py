"""Decisive A/B for the MinHash-lane bench floors (round 15, verdict
item 2): min-of-5 rebuild-lane timings for dedup_minhash_lsh /
minhash_est_quality / corpus_clean_final, replicating bench.py's
session shape (local[32] at sf0.1, one warm noop write, timed
rebuild+write runs).  Run once from the current HEAD and once from a
git worktree at the floor-recording HEAD; compare mins.

Usage: python tools/minhash_ab.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proyecto_gasto_publico_etl_per__spark.plans.driver_queries import (  # noqa: E402
    all_queries,
)
from proyecto_gasto_publico_etl_per__spark.session import get_spark  # noqa: E402

NAMES = ("dedup_minhash_lsh", "minhash_est_quality", "corpus_clean_final")
RUNS = 5


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minhash-ab", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    out: dict[str, dict] = {}
    for name in NAMES:
        fn = registry[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(runs), "runs": runs}
    print(json.dumps({"label": label, "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
