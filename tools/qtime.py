"""Per-query A/B timer for optimization rounds: min-of-N noop-sink
timings for any set of declared queries, replicating bench.py's session
shape (local[$SPARK_GRAFT_CPUS] at $SPARK_GRAFT_SF_DIR, one warm noop
write, timed rebuild+write runs — the extension-lane discipline, which
is also the stricter measurement for headline entries).

Usage: python tools/qtime.py [-n RUNS] query [query ...]

Prints one JSON line per query as it completes (so a partial run still
yields data) plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proyecto_gasto_publico_etl_per__spark.operators.skew import (  # noqa: E402
    release_pinned,
)
from proyecto_gasto_publico_etl_per__spark.plans.driver_queries import (  # noqa: E402
    all_queries,
)
from proyecto_gasto_publico_etl_per__spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--runs", type=int, default=5)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("qtime", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    unknown = [n for n in args.names if n not in registry]
    if unknown:
        raise KeyError(f"not in the registry: {unknown}")

    summary: dict[str, float] = {}
    for name in args.names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"qtime warm: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"qtime run{i}: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        release_pinned()
        summary[name] = min(runs)
        print(json.dumps({"query": name, "min": min(runs), "runs": runs}))
    print(json.dumps({"sf_dir": sf_dir, "min_sec": summary}))


if __name__ == "__main__":
    main()
