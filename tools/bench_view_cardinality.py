"""Serving-view bench at MEF-shaped label cardinality (round-6 task 6).

BENCH_NOTES documents that the testdata maps ``ejecutora_nombre`` to the
near-unique ``c_name``: the monthly view's group count is ~= its input
rows, so the testdata bench exercises the agg-below-join rewrite at its
ADVERSARIAL worst (reduction-free aggregate).  The real MEF data has
~1,800 ejecutoras over millions of rows/year — this tool rebuilds the
same 13-group-column pipeline with the customer-side labels derived from
a low-cardinality bucket (``o_custkey % n_ejec``) and measures what the
pre-aggregate actually buys there:

- ``fact_rows``      rows entering the pre-aggregate
- ``partial_rows``   Σ per-input-partition distinct group keys — the
                     rows a map-side combine emits into the shuffle
- ``group_rows``     final group cardinality (view output rows)
- ``map_reduction``  fact_rows / partial_rows  (the ≥10× claim)
- wall times (min of 2 post-warm noop writes) for both variants

Choosing "realistic": MEF's label space is FIXED (~1,800 ejecutoras, 5
fuentes, 3 categorías, ~10 genéricas, hierarchical específicas) while
rows grow with time — real vw_gasto_agregado_mensual sees ~12 rows per
output group (≈9M rows/yr vs ≈720k groups/yr).  The testdata instead
scales ejecutora_nombre (c_name) WITH SF and spreads rows over 84
months, so groups ≈ rows at every SF — adversarial by construction.
The realistic variant reproduces the MEF rows-per-group shape at the
measured SF by bucketing ejecutora and the clasificador pair to a fixed
space; running it at two SFs shows map_reduction growing ~linearly with
data once the space saturates, which is what holds at 100 TB.

Usage: python tools/bench_view_cardinality.py [sf_dir] [n_ejec] [n_esp]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.plans.testdata_star import (
    _metric_micros,
)
from proyecto_gasto_publico_etl_per__spark.plans.views import (
    finalize_agg_mensual,
    micros_col,
)
from proyecto_gasto_publico_etl_per__spark.schema import METRICS
from proyecto_gasto_publico_etl_per__spark.session import get_spark
from proyecto_gasto_publico_etl_per__spark.sources.tables import load_table


def _fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monthly-view fact input (same shape as build_agg_monthly)."""
    lineitem = load_table(spark, sf_dir, "lineitem", widen=True)
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    li = lineitem.join(
        F.broadcast(supplier.select("s_suppkey")),
        lineitem.l_suppkey == supplier.s_suppkey,
        "left_semi",
    ).join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_type")),
        F.col("l_partkey") == part.p_partkey,
    )
    return _metric_micros(
        li.join(
            orders.select(
                "o_orderkey",
                "o_custkey",
                "o_orderdate",
                "o_orderpriority",
                "o_orderstatus",
            ),
            li.l_orderkey == orders.o_orderkey,
        )
    )


def _group_keys(ejec_expr, n_esp: int | None = None) -> list:
    """The pre-aggregate key. ``n_esp`` buckets the clasificador pair to
    a fixed hierarchical space (específica determines genérica, as in the
    real clasificador) — None keeps the raw brand/type columns."""
    if n_esp is None:
        gen = F.col("p_brand")
        esp = F.col("p_type")
    else:
        bucket = F.abs(F.hash("p_type")) % n_esp
        esp = F.concat(F.lit("ESP "), bucket.cast("string"))
        gen = F.concat(
            F.lit("GEN "), (bucket % max(1, n_esp // 2)).cast("string")
        )
    return [
        F.year("o_orderdate").cast("int").alias("anio"),
        F.month("o_orderdate").cast("int").alias("mes"),
        F.quarter("o_orderdate").cast("int").alias("trimestre"),
        ejec_expr.alias("ejec_id"),
        F.col("o_orderpriority").alias("fuente_financiamiento_nombre"),
        F.concat(F.lit("CAT "), F.col("o_orderstatus")).alias(
            "categoria_gasto_nombre"
        ),
        gen.alias("generica_nombre"),
        esp.alias("especifica_nombre"),
    ]


def _labels(spark: SparkSession, n_ejec: int) -> DataFrame:
    """Broadcast label frame keyed on the bucketed ejecutora id, with
    MEF-shaped cardinalities: |pliego|=|n_ejec/10|, |sector|=25,
    dep/prov/dist from the id the same way the testdata derives them."""
    e = F.col("id")
    return spark.range(n_ejec).select(
        e.alias("ejec_id"),
        F.concat(F.lit("EJEC "), e.cast("string")).alias("ejecutora_nombre"),
        F.concat(F.lit("PLIEGO "), (e % max(1, n_ejec // 10)).cast("string"))
        .alias("pliego_nombre"),
        F.concat(F.lit("SECTOR "), (e % 25).cast("string")).alias(
            "sector_nombre"
        ),
        F.when(e % 5 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("DEP "), (e % 20).cast("string")))
        .alias("dep_ejecutora_nombre"),
        F.when(e % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("PROV "), (e % 25).cast("string")))
        .alias("prov_ejecutora_nombre"),
        F.when(e % 7 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit("DIST "), (e % 10).cast("string")))
        .alias("dist_ejecutora_nombre"),
    ).withColumn("ejec_id", F.col("ejec_id").cast("long"))


def _view(
    fact: DataFrame, labels: DataFrame, ejec_expr, n_esp: int | None
) -> DataFrame:
    pre = fact.groupBy(*_group_keys(ejec_expr, n_esp)).agg(
        *[F.sum(micros_col(m)).alias(micros_col(m)) for m in METRICS]
    )
    return finalize_agg_mensual(
        pre.join(F.broadcast(labels), "ejec_id").drop("ejec_id")
    )


def _time(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_ejec = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_esp = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("view-cardinality", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    fact = _fact(spark, sf_dir)
    fact_rows = fact.count()

    # date-clustered input: the on-disk layout at warehouse scale (the
    # reference ships monthly files; our parquet sink partitions by year)
    # — a map task then holds a contiguous date range, which is what
    # makes map-side combine effective.  Round-robin widening (the tiny-
    # SF scan fix) deliberately destroys that locality, so the bucketed
    # variant alone understates the reduction the layout delivers.
    clustered = fact.repartition(
        32, F.year("o_orderdate"), F.month("o_orderdate")
    )
    out: dict[str, dict] = {}
    for name, use_fact, ejec_expr, esp in (
        ("adversarial_custkey", fact, F.col("o_custkey").cast("long"), None),
        (
            "realistic_bucketed",
            fact,
            (F.col("o_custkey") % n_ejec).cast("long"),
            n_esp,
        ),
        (
            "realistic_clustered",
            clustered,
            (F.col("o_custkey") % n_ejec).cast("long"),
            n_esp,
        ),
    ):
        if name == "adversarial_custkey":
            # label frame = the real distinct custkeys (near-unique path)
            cust_ids = fact.select(
                F.col("o_custkey").cast("long").alias("ejec_id")
            ).distinct()
            e = F.col("ejec_id")
            labels = cust_ids.select(
                "ejec_id",
                F.concat(F.lit("EJEC "), e.cast("string")).alias(
                    "ejecutora_nombre"
                ),
                F.concat(F.lit("PLIEGO "), (e % 5).cast("string")).alias(
                    "pliego_nombre"
                ),
                F.concat(F.lit("SECTOR "), (e % 25).cast("string")).alias(
                    "sector_nombre"
                ),
                F.when(e % 5 == 0, F.lit(""))
                .otherwise(F.concat(F.lit("DEP "), (e % 20).cast("string")))
                .alias("dep_ejecutora_nombre"),
                F.when(e % 11 == 0, F.lit(None).cast("string"))
                .otherwise(F.concat(F.lit("PROV "), (e % 25).cast("string")))
                .alias("prov_ejecutora_nombre"),
                F.when(e % 7 == 0, F.lit("  "))
                .otherwise(F.concat(F.lit("DIST "), (e % 10).cast("string")))
                .alias("dist_ejecutora_nombre"),
            )
        else:
            labels = _labels(spark, n_ejec)
        view = _view(use_fact, labels, ejec_expr, esp)
        # map-side combine output: per-input-partition distinct group keys
        partial_rows = (
            use_fact.select(
                F.spark_partition_id().alias("__pid"),
                *_group_keys(ejec_expr, esp),
            )
            .distinct()
            .count()
        )
        out[name] = {
            "fact_rows": fact_rows,
            "partial_rows": partial_rows,
            "group_rows": view.count(),
            "map_reduction": round(fact_rows / max(1, partial_rows), 2),
            "wall_sec": _time(view),
        }
    print(json.dumps({"sf_dir": sf_dir, "n_ejec": n_ejec, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
