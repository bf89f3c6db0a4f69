"""Measured-scaling ladders for the round-15 zone lanes (aggzone +
manifest): corpus replicas ×1/3/…/K of an sf dir's orders, timing

- ``aggzone_build``    — the one corpus-sized job (expect ~linear);
- ``aggzone_serve``    — serving ONE zone built at each rung (expect
  FLAT: the partials row count is |groups|, constant across rungs
  because replicas offset keys, not dates);
- ``aggzone_fanin``    — serving 1/4/16 zones of the SAME corpus
  (the cost of postponing compaction: linear in zone count, tiny
  absolute);
- ``manifest_build``   — the footer pass at 8/32/128 files of the
  top-rung corpus (file-count-proportional, data-size-free);
- ``manifest_scan``    — the declared 18-month pruned scan vs the
  full scan + filter at each rung (both corpus-linear; the pruned
  wall tracks the kept-fraction of the corpus);
- ``bloom_lookup``     — the point lookup at each rung (expect ~flat:
  one file + a metadata probe, with the file growing linearly).

Reuses scaling_probe's replica builder and exponent reporting; the
same reading discipline applies — sub-second walls sit on the
scheduling floor, so trust the top-rung legs and the fitted exponent,
not single small-rung ratios.

Usage: python tools/aggzone_manifest_probe.py [sf_dir] [K]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.operators import aggzone
from proyecto_gasto_publico_etl_per__spark.session import get_spark
from proyecto_gasto_publico_etl_per__spark.sources import manifest
from scaling_probe import _exp_report, _ladder_of, build_replicated


def _orders_shape(spark, sf_dir):
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.year("o_orderdate").alias("anio"),
        F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("price"),
        F.col("o_custkey").alias("cust"),
    )


_SPEC = dict(
    keys=["prio", "anio"],
    sums=["price"],
    mins=["price"],
    maxs=["price"],
    kmvs=["cust"],
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = get_spark("aggzone_manifest_probe")
    ladder = _ladder_of(k)

    rungs: dict[int, str] = {}
    for m in ladder:
        if m == 1:
            rungs[m] = sf_dir
        else:
            d = tempfile.mkdtemp(prefix=f"azmf_x{m}_")
            build_replicated(spark, sf_dir, m, d)
            rungs[m] = d

    tb: dict[int, float] = {}
    ts: dict[int, float] = {}
    zone_at: dict[int, str] = {}
    for m in ladder:
        df = _orders_shape(spark, rungs[m])
        t0 = time.monotonic()
        zone_at[m] = aggzone.build_agg_zone(spark, df, **_SPEC)
        tb[m] = time.monotonic() - t0
        t0 = time.monotonic()
        aggzone.serve_agg(spark, [zone_at[m]]).collect()
        ts[m] = time.monotonic() - t0
    _exp_report("aggzone_build", tb)
    _exp_report("aggzone_serve", ts, note="expect ~flat (groups const)")

    # fan-in: 1 / 4 / 16 zones of the SAME 1x corpus
    df1 = _orders_shape(spark, sf_dir)
    fanin: dict[int, float] = {}
    for nz in (1, 4, 16):
        zones = [
            aggzone.build_agg_zone(
                spark, df1.where(F.col("cust") % nz == i), **_SPEC
            )
            for i in range(nz)
        ]
        t0 = time.monotonic()
        aggzone.serve_agg(spark, zones).collect()
        fanin[nz] = time.monotonic() - t0
    _exp_report(
        "aggzone_fanin", fanin, note="x = zone count at fixed corpus"
    )

    # manifest build vs file count (top-rung corpus, footer pass only)
    top = rungs[ladder[-1]]
    orders_top = spark.read.parquet(f"{top}/orders.parquet")
    fb: dict[int, float] = {}
    for nf in (8, 32, 128):
        d = tempfile.mkdtemp(prefix=f"azmf_files{nf}_") + "/t"
        (
            orders_top.withColumn(
                "ym",
                F.year("o_orderdate") * 100 + F.month("o_orderdate"),
            )
            .repartitionByRange(nf, "ym")
            .sortWithinPartitions("ym")
            .write.parquet(d)
        )
        t0 = time.monotonic()
        manifest.build_stats_manifest(spark, d, ["ym"])
        fb[nf] = time.monotonic() - t0
    _exp_report("manifest_build", fb, note="x = file count, footers only")

    # pruned vs full scan per rung (8-file ym-clustered layout each)
    tp: dict[int, float] = {}
    tf: dict[int, float] = {}
    bl: dict[int, float] = {}
    for m in ladder:
        orders_m = spark.read.parquet(f"{rungs[m]}/orders.parquet")
        base = orders_m.select(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
                "ym"
            ),
            F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("price"),
            "o_custkey",
        )
        d = tempfile.mkdtemp(prefix=f"azmf_scan_x{m}_") + "/t"
        base.repartitionByRange(8, "ym").sortWithinPartitions(
            "ym"
        ).write.parquet(d)
        manifest.build_stats_manifest(
            spark, d, ["ym"], blooms=["o_custkey"]
        )
        t0 = time.monotonic()
        manifest.pruned_scan(spark, d, "ym", 199606, 199711).groupBy(
            "ym"
        ).count().collect()
        tp[m] = time.monotonic() - t0
        t0 = time.monotonic()
        (
            spark.read.parquet(d)
            .where((F.col("ym") >= 199606) & (F.col("ym") <= 199711))
            .groupBy("ym")
            .count()
            .collect()
        )
        tf[m] = time.monotonic() - t0
        t0 = time.monotonic()
        manifest.point_lookup(spark, d, "o_custkey", 42).count()
        bl[m] = time.monotonic() - t0
    _exp_report("manifest_scan_pruned", tp)
    _exp_report("manifest_scan_full", tf, note="the no-manifest baseline")
    _exp_report("bloom_lookup", bl, note="expect ~flat (one file)")


if __name__ == "__main__":
    main()
