"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and
compares row count, sorted column names, and an order-insensitive value
hash.  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.session import get_spark  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.sources.tables import TABLES  # noqa: E402


def _norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def value_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        status, detail = "ROWS_ONLY", f"{len(srows)} rows"
        if name in oracles:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
            if len(srows) != len(orows):
                status, detail = "FAIL", f"rowcount spark={len(srows)} duck={len(orows)}"
            elif sorted(scols) != sorted(ocols):
                status, detail = "FAIL", f"cols spark={sorted(scols)} duck={sorted(ocols)}"
            else:
                sh = value_hash([tuple(r) for r in srows], scols)
                oh = value_hash(orows, ocols)
                status = "OK" if sh == oh else "FAIL"
                detail = f"{len(srows)} rows hash {sh} vs {oh}"
        if status == "FAIL":
            failures.append(name)
        print(f"{status:9s} {name:28s} {detail}  ({time.time()-t0:.1f}s)")

    print(
        f"\n{checked - len(failures)}/{checked} ok"
        f" ({len(qs)} declared); failures: {failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
