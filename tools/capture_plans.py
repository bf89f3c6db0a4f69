"""Capture ``explain("formatted")`` output for declared queries into
text files — the optimization round's plan evidence
(``plans/r15/<query>_{before,after}.txt``).

Usage: python tools/capture_plans.py OUTDIR SUFFIX query [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` per query.  Uses the same sf dir
the bench times (``$SPARK_GRAFT_SF_DIR``, default sf0.1) so the plans
match the measured numbers.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.plans.driver_queries import (  # noqa: E402
    all_queries,
)
from proyecto_gasto_publico_etl_per__spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("capture-plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        # public API only (round-16 advice: the former
        # PythonSQLUtils.explainString / queryExecution() private-
        # internals route breaks across Spark versions): capture the
        # documented explain("formatted") output off stdout
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (out / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {out / f'{name}_{suffix}.txt'} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
