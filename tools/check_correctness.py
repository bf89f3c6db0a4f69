"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and
compares row count, sorted column names, Arrow-level column types, and an
order-insensitive value hash.

The type comparison exists because the driver's hasher is type-aware:
DuckDB materializes integer SUMs as HUGEINT (Arrow ``decimal128(38,0)``)
while Spark returns ``int64`` — values that stringify identically but hash
differently in a dtype-sensitive comparator (the exact failure mode of the
round-2/3 ``filtered_agg_funnel`` driver FAIL).  Comparing the Arrow
schemas of both result sets locally surfaces that class of divergence
before the driver does.  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import platform
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyspark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.operators.skew import (  # noqa: E402
    release_pinned,
)
from proyecto_gasto_publico_etl_per__spark.session import get_spark  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.sources.tables import TABLES  # noqa: E402


def env_versions() -> dict[str, str]:
    """Version stamp for correctness/bench artifacts, so a driver-vs-local
    divergence is diagnosable from the artifacts alone."""
    return {
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "pyarrow": pa.__version__,
    }


def canon_type(t: pa.DataType) -> str:
    """Canonical name for an Arrow type, folding only representation
    variants that every hasher treats identically."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        # unit matters for a byte-level hasher; tz presence matters more
        return f"timestamp[{t.unit}{', tz' if t.tz else ''}]"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


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


def _rows_from_arrow(tbl: pa.Table):
    cols = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols)) if cols else []


def dtype_mismatches(stbl: pa.Table, otbl: pa.Table) -> list[str]:
    smap = {f.name: canon_type(f.type) for f in stbl.schema}
    omap = {f.name: canon_type(f.type) for f in otbl.schema}
    out = []
    for name in sorted(set(smap) | set(omap)):
        st, ot = smap.get(name), omap.get(name)
        if st != ot:
            out.append(f"{name}: spark={st} duck={ot}")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    print(json.dumps({"env": env_versions()}))
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
        try:
            sdf = fn(spark, sf_dir)
            stbl = sdf.toArrow()
        except Exception as e:  # noqa: BLE001 — record, keep checking
            failures.append(name)
            msg = str(e).splitlines()[0][:160]
            print(f"{'ERROR':9s} {name:28s} {msg}")
            continue
        srows = _rows_from_arrow(stbl)
        scols = stbl.schema.names
        status, detail = "ROWS_ONLY", f"{len(srows)} rows"
        if name in oracles:
            otbl = con.execute(oracles[name]).arrow()
            orows = _rows_from_arrow(otbl)
            ocols = otbl.schema.names
            dmis = dtype_mismatches(stbl, otbl)
            if len(srows) != len(orows):
                status, detail = "FAIL", f"rowcount spark={len(srows)} duck={len(orows)}"
            elif sorted(scols) != sorted(ocols):
                status, detail = "FAIL", f"cols spark={sorted(scols)} duck={sorted(ocols)}"
            elif dmis:
                status, detail = "FAIL", "dtype " + "; ".join(dmis)
            else:
                sh = value_hash(srows, scols)
                oh = value_hash(orows, ocols)
                status = "OK" if sh == oh else "FAIL"
                detail = f"{len(srows)} rows hash {sh} vs {oh}"
        if status == "FAIL":
            failures.append(name)
        print(f"{status:9s} {name:28s} {detail}  ({time.time()-t0:.1f}s)")
        # query-boundary cache hygiene (round-9 lifecycle): drop any
        # guarded-broadcast vocab pins this query left behind
        release_pinned()

    print(
        f"\n{checked - len(failures)}/{checked} ok"
        f" ({len(qs)} declared); failures: {failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
