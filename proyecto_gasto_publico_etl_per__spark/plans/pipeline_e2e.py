"""End-to-end MEF pipeline correctness query (oracle-backed).

Round-1 review gap: every declared query ran over the testdata-star
adapter; the transform→load→serve path (``plans/mef_pipeline.py``) was
pytest-only.  This query drives the REAL pipeline end to end on a
deterministic MEF-shaped fixture derived from the testdata tables:

  raw all-string records (with injected dirt) → CSV round-trip →
  ``mef_pipeline.transform`` (normalize) → ``mef_pipeline.load`` (dims
  upsert, FK resolve, grain consolidation, partitioned fact append) →
  ``register_views`` → ``vw_gasto_agregado_mensual``

and hash-checks the served view against a direct DuckDB restatement.
The fixture is built so the pipeline's subtlest reference semantics are
all load-bearing for the final hash:

- numeric coercion: junk metric strings → NULL → 0 in the view sums
  (transformar_mensual.py:86-87);
- validity filter: rows with unparseable ANO_EJE disappear
  (transformar_mensual.py:149);
- key-type normalization: whitespace-padded, zero-padded dim keys unify
  (cargar_postgres.py:120-123);
- the NULL→''→placeholder two-step: PROVINCIA/DISTRITO columns are
  entirely ABSENT from the fixture, so they are NULL-conformed, cleaned
  to '' and served as 'SIN PROVINCIA'/'SIN DISTRITO'
  (transformar_mensual.py:92 + CreacionDeUsuariosyVistas.sql:127-133);
- grain consolidation: many lineitems share one fact grain, summed once
  (cargar_postgres.py:374-375).

Every dimension attribute in the fixture is a pure function of its
dimension's natural key, so the dims' keep-first upsert semantics cannot
pick a different attribute than the oracle's direct GROUP BY.

The year is shifted +18 (1992-1998 → 2010-2016) to land inside the
generated dim_tiempo calendar (2010-2030, CreacionDeDataWareHouse.sql:17-24).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import mef_pipeline
from .driver_queries import register

#: 1995 → 2013: one year of orders, one fact partition.
_YEAR_SRC = 1995
_YEAR_OFF = 18


def _s(col: F.Column) -> F.Column:
    return col.cast("string")


def _raw_mef_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic raw fixture: one all-string record per lineitem
    of the source year, with dirt injected as described in the module
    docstring."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    base = (
        li.join(
            orders.where(F.year("o_orderdate") == _YEAR_SRC).select(
                "o_orderkey", "o_custkey", "o_orderdate",
                "o_orderpriority", "o_orderstatus",
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    ej = F.col("c_custkey") % 100  # ejecutora natural key driver
    code = F.lpad(_s(ej), 4, "0")
    pim = _s(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
    qty = F.col("l_quantity").cast("int")
    return base.select(
        # time (+ dirt: unparseable year on every 97th customer's rows)
        F.when(F.col("c_custkey") % 97 == 0, F.lit("bad"))
        .otherwise(_s(F.year("o_orderdate") + _YEAR_OFF))
        .alias("ANO_EJE"),
        _s(F.month("o_orderdate")).alias("MES_EJE"),
        # nivel de gobierno (full region name as code: first letters clash)
        F.col("r_name").alias("NIVEL_GOBIERNO"),
        F.concat(F.lit("NIVEL "), F.col("r_name")).alias(
            "NIVEL_GOBIERNO_NOMBRE"
        ),
        # ejecutora: whitespace-padded key (unified by key normalization);
        # every attribute is a function of `ej`
        F.concat(F.lit("  "), code, F.lit(" ")).alias("SEC_EJEC"),
        code.alias("EJECUTORA"),
        F.concat(F.lit("EJ "), code).alias("EJECUTORA_NOMBRE"),
        _s(ej % 7).alias("SECTOR"),
        F.concat(F.lit("  SECTOR "), _s(ej % 7), F.lit("  ")).alias(
            "SECTOR_NOMBRE"  # padded: cleaned by PRJ5 before serving
        ),
        _s(ej % 4).alias("PLIEGO"),
        F.concat(F.lit("PLIEGO "), _s(ej % 4)).alias("PLIEGO_NOMBRE"),
        _s(ej % 10).alias("DEPARTAMENTO_EJECUTORA"),
        F.when(ej % 5 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("DEP "), _s(ej % 10)))
        .alias("DEPARTAMENTO_EJECUTORA_NOMBRE"),
        # PROVINCIA_*/DISTRITO_* deliberately ABSENT → placeholder path
        # financiera (fuente attr functional on its first-char code)
        F.substring("o_orderpriority", 1, 1).alias("FUENTE_FINANCIAMIENTO"),
        F.col("o_orderpriority").alias("FUENTE_FINANCIAMIENTO_NOMBRE"),
        F.col("o_orderstatus").alias("CATEGORIA_GASTO"),
        F.concat(F.lit("CAT "), F.col("o_orderstatus")).alias(
            "CATEGORIA_GASTO_NOMBRE"
        ),
        # clasificador (int-typed key TIPO_TRANSACCION, cargar:214)
        F.lit("2").alias("TIPO_TRANSACCION"),
        _s(F.col("l_linenumber") % 3).alias("GENERICA"),
        F.concat(F.lit("G"), _s(F.col("l_linenumber") % 3)).alias(
            "GENERICA_NOMBRE"
        ),
        _s(F.col("l_partkey") % 7).alias("ESPECIFICA"),
        F.concat(F.lit("E"), _s(F.col("l_partkey") % 7)).alias(
            "ESPECIFICA_NOMBRE"
        ),
        # metrics as integer-valued strings (no float formatting drift);
        # junk PIA on every 89th order's rows → coerced NULL → 0
        F.when(F.col("l_orderkey") % 89 == 0, F.lit("junk"))
        .otherwise(_s(qty))
        .alias("MONTO_PIA"),
        pim.alias("MONTO_PIM"),
        _s(qty * 2).alias("MONTO_CERTIFICADO"),
        _s(qty * 3).alias("MONTO_COMPROMETIDO_ANUAL"),
        _s(qty * 4).alias("MONTO_COMPROMETIDO"),
        F.when(F.col("l_linestatus") == "F", pim)
        .otherwise(F.lit("0"))
        .alias("MONTO_DEVENGADO"),
        F.when(
            (F.col("l_linestatus") == "F") & (F.col("l_returnflag") != "R"),
            pim,
        )
        .otherwise(F.lit("0"))
        .alias("MONTO_GIRADO"),
    )


#: Direct DuckDB restatement: the same fixture derivation, validity
#: filter, cleaning, placeholder, and view aggregation — everything the
#: pipeline machinery in between must preserve.
_E2E_ORACLE = f"""
WITH raw AS (
    SELECT year(o_orderdate) + {_YEAR_OFF} AS anio,
           month(o_orderdate) AS mes,
           quarter(o_orderdate) AS trimestre,
           c_custkey % 100 AS ej,
           o_orderpriority, o_orderstatus,
           l_linenumber, l_partkey, l_orderkey,
           CAST(l_quantity AS INT) AS qty,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pim_i,
           l_linestatus, l_returnflag
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE year(o_orderdate) = {_YEAR_SRC}
      AND c_custkey % 97 <> 0           -- 'bad' ANO_EJE rows fail validity
)
SELECT CAST(anio AS INT) AS anio,
       CAST(mes AS INT) AS mes,
       CAST(trimestre AS INT) AS trimestre,
       'EJ ' || lpad(CAST(ej AS VARCHAR), 4, '0') AS ejecutora_nombre,
       'SECTOR ' || CAST(ej % 7 AS VARCHAR) AS sector_nombre,
       'PLIEGO ' || CAST(ej % 4 AS VARCHAR) AS pliego_nombre,
       CASE WHEN ej % 5 = 0 THEN 'SIN DEPARTAMENTO'
            ELSE 'DEP ' || CAST(ej % 10 AS VARCHAR) END
           AS dep_ejecutora_nombre,
       'SIN PROVINCIA' AS prov_ejecutora_nombre,
       'SIN DISTRITO' AS dist_ejecutora_nombre,
       'Departamento de ' ||
         CASE WHEN ej % 5 = 0 THEN 'SIN DEPARTAMENTO'
              ELSE 'DEP ' || CAST(ej % 10 AS VARCHAR) END || ', Perú'
           AS region_mapa,
       o_orderpriority AS fuente_financiamiento_nombre,
       'CAT ' || o_orderstatus AS categoria_gasto_nombre,
       'G' || CAST(l_linenumber % 3 AS VARCHAR) AS generica_nombre,
       'E' || CAST(l_partkey % 7 AS VARCHAR) AS especifica_nombre,
       CAST(SUM(CASE WHEN l_orderkey % 89 = 0 THEN 0 ELSE qty END)
            AS DOUBLE) AS pia,
       CAST(SUM(pim_i) AS DOUBLE) AS pim,
       CAST(SUM(qty * 2) AS DOUBLE) AS certificado,
       CAST(SUM(qty * 3) AS DOUBLE) AS comprometido_anual,
       CAST(SUM(qty * 4) AS DOUBLE) AS comprometido,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN pim_i ELSE 0 END)
            AS DOUBLE) AS devengado,
       CAST(SUM(CASE WHEN l_linestatus = 'F' AND l_returnflag <> 'R'
                     THEN pim_i ELSE 0 END) AS DOUBLE) AS girado
FROM raw
GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14
"""


@register("pipeline_e2e_monthly", _E2E_ORACLE)
def pipeline_e2e_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform → load → serve through the REAL mef_pipeline (CSV
    round-trip included), returning the served monthly aggregate view."""
    raw = _raw_mef_frame(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mef_e2e_")
    raw_dir = f"{tmp}/raw"
    norm_dir = f"{tmp}/normalized"
    warehouse = f"{tmp}/warehouse"
    raw.coalesce(1).write.option("header", True).mode("overwrite").csv(raw_dir)
    mef_pipeline.transform(spark, raw_dir, norm_dir)
    mef_pipeline.load(spark, norm_dir, warehouse)
    mef_pipeline.register_views(spark, warehouse)
    return spark.table("vw_gasto_agregado_mensual")
