"""One-off bisect harness for the sessionize bench regression (round 6).

Runs ONLY the sessionize query at sf0.1 with a given conf variant and
prints warm-run timings.  Launch-time conf (driver memory) must come in
via SPARK_GRAFT_DRIVER_MEM before the JVM exists, so each variant runs
in its own process:

    SPARK_GRAFT_DRIVER_MEM=8g python tools/bisect_sessionize.py 524288
    SPARK_GRAFT_DRIVER_MEM=8g python tools/bisect_sessionize.py 4194304
    SPARK_GRAFT_DRIVER_MEM=1g python tools/bisect_sessionize.py 524288
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from proyecto_gasto_publico_etl_per__spark.plans.driver_queries import all_queries
from proyecto_gasto_publico_etl_per__spark.session import get_spark


def main() -> None:
    open_cost = sys.argv[1] if len(sys.argv) > 1 else "524288"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bisect",
        master="local[32]",
        extra_conf={"spark.sql.files.openCostInBytes": open_cost},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()["sessionize"]
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    runs = []
    for _ in range(4):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    print(
        f"RESULT mem={mem} openCost={open_cost} runs={runs} best={min(runs)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
