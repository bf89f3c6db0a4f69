"""Adapter: the driver's TPC-H-ish testdata expressed as the MEF star.

The engine's query layer (plans/queries.py, plans/views.py) speaks the MEF
column vocabulary.  This module maps the synthetic tables onto it so every
reference query runs unchanged against the testdata — the same trick the
reference plays in reverse when its five SQL queries double as validation
queries (README.md:224-231).

Mapping (testdata → MEF star):

  orders.o_orderdate        → anio / mes / trimestre / fecha (month grain)
  region                    → dim_nivel_gobierno  (nivel_gobierno_nombre=r_name)
  nation                    → "sector"            (sector_nombre=n_name)
  customer                  → dim_ejecutora       (ejecutora_nombre=c_name,
                                                   pliego_nombre=c_mktsegment)
  part                      → dim_clasificador    (especifica_nombre=p_type,
                                                   generica_nombre=p_brand)
  supplier                  → proveedor_nombre=s_name
  orders.o_orderpriority    → fuente_financiamiento_nombre
  orders.o_orderstatus      → categoria_gasto_nombre ('CAT ' prefix; 3
                              distinct values, the categoria cardinality)
  customer location analogs → dep_ejecutora_nombre = n_name, blanked every
                              5th nation; prov_ejecutora_nombre from
                              c_custkey mod 25, NULL every 11th customer;
                              dist_ejecutora_nombre from c_custkey mod 10,
                              whitespace-only every 7th customer.  The
                              injected ''/NULL/'  ' values exercise the
                              view's COALESCE(NULLIF(TRIM(x), ''),
                              'SIN …') placeholder path (V:127-133) on
                              both engines.
  lineitem numerics         → the 7 monto_* metrics (exact decimal):
      monto_pia                = l_quantity
      monto_pim                = l_extendedprice
      monto_certificado        = l_extendedprice * (1 - l_discount)
      monto_comprometido_anual = l_extendedprice * (1 + l_tax)
      monto_comprometido       = l_extendedprice * (1 + l_tax)  minus returns:
                                 0 when l_returnflag = 'R'
      monto_devengado          = net price only when shipped (l_linestatus='F')
      monto_girado             = devengado excluding returns (l_returnflag<>'R')

All joins are broadcast (dims ≤ 2k rows; at 100 TB the real dims stay
broadcast-sized per SURVEY.md §1.4); lineitem→orders is the only
potentially-large join and co-partitions on the orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import DEC
from ..sources.tables import load_table

def _grid(x) -> F.Column:
    """Double expression → exact DECIMAL(18,4) on the 1e-4 grid.

    The arithmetic runs in double (decimal multiply is the single most
    expensive expression in the star build — BigDecimal once the result
    precision exceeds the compact-long range) and lands on the grid via
    floor(x*1e4+0.5); the oracle mirrors the identical formula, so both
    engines perform the same IEEE ops and the same final cast.  Sums
    downstream stay DECIMAL(18,4)-exact."""
    return (F.floor(x * 10000 + F.lit(0.5)) / 10000).cast(DEC)


def _metrics(df: DataFrame) -> DataFrame:
    zero = F.lit(0).cast(DEC)
    qty = _grid(F.col("l_quantity"))
    price = _grid(F.col("l_extendedprice"))
    net = _grid(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    gross = _grid(F.col("l_extendedprice") * (F.lit(1) + F.col("l_tax")))
    shipped = F.col("l_linestatus") == "F"
    kept = F.col("l_returnflag") != "R"
    return (
        df.withColumn("monto_pia", qty)
        .withColumn("monto_pim", price)
        .withColumn("monto_certificado", net)
        .withColumn("monto_comprometido_anual", gross)
        .withColumn("monto_comprometido", F.when(kept, gross).otherwise(zero))
        .withColumn("monto_devengado", F.when(shipped, net).otherwise(zero))
        .withColumn(
            "monto_girado", F.when(shipped & kept, net).otherwise(zero)
        )
    )


def build_star(
    spark: SparkSession, sf_dir: str, widen_fact: bool = False
) -> DataFrame:
    """The denormalized star frame (V-base analog) over the testdata.

    ``widen_fact=True`` fans the fact scan out to the session's cores
    (``load_table(widen=)``) — pass it from consumers that materialize
    the FULL star (serving views, base denormalization); leave it off
    for year-slice analytics whose join-pruned remainder is small.
    """
    lineitem = load_table(spark, sf_dir, "lineitem", widen=widen_fact)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")

    # lineitem ⋈ orders is the one big-big join: no broadcast hint — at small
    # SF AQE turns it into a broadcast join on its own; at 100 TB it must be
    # a shuffle join on the orderkey (both sides co-partition on that key).
    fact = lineitem.join(
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "o_orderpriority",
            "o_orderstatus",
        ),
        lineitem.l_orderkey == orders.o_orderkey,
        "inner",
    )
    fact = (
        fact.join(F.broadcast(customer), fact.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supplier), fact.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(part), fact.l_partkey == part.p_partkey)
    )
    fact = _metrics(fact)
    return fact.select(
        F.year("o_orderdate").cast("int").alias("anio"),
        F.month("o_orderdate").cast("int").alias("mes"),
        F.quarter("o_orderdate").cast("int").alias("trimestre"),
        F.col("r_name").alias("nivel_gobierno_nombre"),
        F.col("n_name").alias("sector_nombre"),
        F.when(F.col("n_nationkey") % 5 == 0, F.lit(""))
        .otherwise(F.col("n_name"))
        .alias("dep_ejecutora_nombre"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit("PROV "), (F.col("c_custkey") % 25).cast("string"))
        )
        .alias("prov_ejecutora_nombre"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("  "))
        .otherwise(
            F.concat(F.lit("DIST "), (F.col("c_custkey") % 10).cast("string"))
        )
        .alias("dist_ejecutora_nombre"),
        F.col("c_name").alias("ejecutora_nombre"),
        F.col("c_mktsegment").alias("pliego_nombre"),
        F.col("p_type").alias("especifica_nombre"),
        F.col("p_brand").alias("generica_nombre"),
        F.col("s_name").alias("proveedor_nombre"),
        F.col("o_orderpriority").alias("fuente_financiamiento_nombre"),
        F.concat(F.lit("CAT "), F.col("o_orderstatus")).alias(
            "categoria_gasto_nombre"
        ),
        "monto_pia",
        "monto_pim",
        "monto_certificado",
        "monto_comprometido_anual",
        "monto_comprometido",
        "monto_devengado",
        "monto_girado",
    )


def _metric_micros(df: DataFrame) -> DataFrame:
    """The 7 metrics as exact long micros, skipping the decimal roundtrip.

    ``floor(x*1e4+0.5)::long`` is bit-identical to
    ``gmicros(_grid(x))``: ``_grid`` lands the double on the 1e-4 grid
    (integer k micros) and ``gmicros`` recovers exactly k because
    ``double(k/1e4)*1e4`` stays within 0.5 of k for any |k| < 2^52.
    Computing k directly keeps the hot pre-aggregation path free of
    BigDecimal arithmetic (the costliest expression in ``_metrics``).
    """
    from .views import micros_col

    def k(x) -> F.Column:
        return F.floor(x * 10000 + F.lit(0.5)).cast("long")

    zero = F.lit(0).cast("long")
    qty = k(F.col("l_quantity"))
    price = k(F.col("l_extendedprice"))
    net = k(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    gross = k(F.col("l_extendedprice") * (F.lit(1) + F.col("l_tax")))
    shipped = F.col("l_linestatus") == "F"
    kept = F.col("l_returnflag") != "R"
    return (
        df.withColumn(micros_col("monto_pia"), qty)
        .withColumn(micros_col("monto_pim"), price)
        .withColumn(micros_col("monto_certificado"), net)
        .withColumn(micros_col("monto_comprometido_anual"), gross)
        .withColumn(
            micros_col("monto_comprometido"),
            F.when(kept, gross).otherwise(zero),
        )
        .withColumn(
            micros_col("monto_devengado"),
            F.when(shipped, net).otherwise(zero),
        )
        .withColumn(
            micros_col("monto_girado"),
            F.when(shipped & kept, net).otherwise(zero),
        )
    )


def _customer_labels(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """The customer-side label frame (one row per custkey): every group
    column of the aggregate views that is a function of
    customer × nation × region in the testdata mapping."""
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            F.col("c_name").alias("ejecutora_nombre"),
            F.col("c_mktsegment").alias("pliego_nombre"),
            F.col("n_name").alias("sector_nombre"),
            F.when(F.col("n_nationkey") % 5 == 0, F.lit(""))
            .otherwise(F.col("n_name"))
            .alias("dep_ejecutora_nombre"),
            F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("string"))
            .otherwise(
                F.concat(
                    F.lit("PROV "), (F.col("c_custkey") % 25).cast("string")
                )
            )
            .alias("prov_ejecutora_nombre"),
            F.when(F.col("c_custkey") % 7 == 0, F.lit("  "))
            .otherwise(
                F.concat(
                    F.lit("DIST "), (F.col("c_custkey") % 10).cast("string")
                )
            )
            .alias("dist_ejecutora_nombre"),
        )
    )


def build_agg_annual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-agga over the testdata via agg-below-join (exact rewrite of
    ``vw_gasto_agregado_anual(build_star(...))``, see plans/views.py).

    supplier/part contribute no group columns — broadcast LEFT SEMI joins
    reproduce the inner joins' row set without widening the fact.

    Round-11 rewrite (the r10 verdict's agg_annual_view drift task): the
    annual view has only THREE group columns (anio + the two customer
    labels, |groups| ≈ |years|×|nations|×|segments| — hundreds at any
    scale), so the bounded customer labels broadcast-join onto the fact
    BEFORE the pre-aggregate and the partial agg collapses straight to
    the final key.  The previous (anio, custkey) pre-agg key was
    near-unique on the round-robin-widened input (~105k groups at
    sf0.1): its partial agg barely combined and the exchange shuffled
    ~|fact| rows that grow with data; the final-key partial agg emits
    ≤ |groups| rows per partition — constant shuffle volume at 100×.
    Exactness: customer→(sector, pliego) is functional on custkey and
    long-micros sums are associative, so merging custkeys at the
    partial stage is the same rational total (A/B value-identity run
    recorded in BENCH_NOTES round 11; the monthly view keeps the
    id-keyed pre-agg — its 14-column group is genuinely wide).
    """
    from .views import finalize_agg_anual, micros_col

    lineitem = load_table(spark, sf_dir, "lineitem", widen=True)
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    metric_cols = ("monto_pim", "monto_devengado", "monto_girado")

    li = lineitem.join(
        F.broadcast(supplier.select("s_suppkey")),
        lineitem.l_suppkey == supplier.s_suppkey,
        "left_semi",
    )
    li = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == part.p_partkey,
        "left_semi",
    )
    fact = _metric_micros(
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == orders.o_orderkey,
        )
    )
    cust = _customer_labels(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    ).select("c_custkey", "sector_nombre", "pliego_nombre")
    labeled = fact.join(
        F.broadcast(cust), fact.o_custkey == cust.c_custkey
    )
    pre = labeled.groupBy(
        F.year("o_orderdate").cast("int").alias("anio"),
        "sector_nombre",
        "pliego_nombre",
    ).agg(
        *[
            F.sum(micros_col(m)).alias(micros_col(m))
            for m in metric_cols
        ]
    )
    return finalize_agg_anual(pre)


def build_agg_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-aggm over the testdata via agg-below-join (exact rewrite of
    ``vw_gasto_agregado_mensual(build_star(...))``).

    part DOES contribute (generica/especifica = brand/type), so it joins
    broadcast BEFORE the pre-aggregate and the key carries (brand, type)
    instead of partkey; supplier stays a semi filter.  The customer-side
    labels attach after the pre-aggregate.
    """
    from .views import finalize_agg_mensual, micros_col

    from ..schema import METRICS

    lineitem = load_table(spark, sf_dir, "lineitem", widen=True)
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")

    li = lineitem.join(
        F.broadcast(supplier.select("s_suppkey")),
        lineitem.l_suppkey == supplier.s_suppkey,
        "left_semi",
    )
    li = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_type")),
        li.l_partkey == part.p_partkey,
    )
    fact = _metric_micros(
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
    pre = fact.groupBy(
        F.year("o_orderdate").cast("int").alias("anio"),
        F.month("o_orderdate").cast("int").alias("mes"),
        F.quarter("o_orderdate").cast("int").alias("trimestre"),
        F.col("o_custkey"),
        F.col("o_orderpriority").alias("fuente_financiamiento_nombre"),
        F.concat(F.lit("CAT "), F.col("o_orderstatus")).alias(
            "categoria_gasto_nombre"
        ),
        F.col("p_brand").alias("generica_nombre"),
        F.col("p_type").alias("especifica_nombre"),
    ).agg(
        *[F.sum(micros_col(m)).alias(micros_col(m)) for m in METRICS]
    )
    cust = _customer_labels(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )
    joined = pre.join(
        F.broadcast(cust), pre.o_custkey == cust.c_custkey
    ).drop("o_custkey", "c_custkey")
    return finalize_agg_mensual(joined)


#: DuckDB fragment mirroring build_star exactly — the FROM clause every
#: oracle query builds on.  Kept adjacent to the Spark builder so the two
#: definitions can be reviewed side by side.
STAR_SQL = """
SELECT year(o_orderdate)::INT AS anio,
       month(o_orderdate)::INT AS mes,
       quarter(o_orderdate)::INT AS trimestre,
       r_name AS nivel_gobierno_nombre,
       n_name AS sector_nombre,
       CASE WHEN n_nationkey % 5 = 0 THEN '' ELSE n_name END
           AS dep_ejecutora_nombre,
       CASE WHEN c_custkey % 11 = 0 THEN NULL
            ELSE 'PROV ' || CAST(c_custkey % 25 AS VARCHAR) END
           AS prov_ejecutora_nombre,
       CASE WHEN c_custkey % 7 = 0 THEN '  '
            ELSE 'DIST ' || CAST(c_custkey % 10 AS VARCHAR) END
           AS dist_ejecutora_nombre,
       c_name AS ejecutora_nombre,
       c_mktsegment AS pliego_nombre,
       p_type AS especifica_nombre,
       p_brand AS generica_nombre,
       s_name AS proveedor_nombre,
       o_orderpriority AS fuente_financiamiento_nombre,
       'CAT ' || o_orderstatus AS categoria_gasto_nombre,
       CAST(floor(l_quantity * 10000 + 0.5) / 10000 AS DECIMAL(18,4))
           AS monto_pia,
       CAST(floor(l_extendedprice * 10000 + 0.5) / 10000 AS DECIMAL(18,4))
           AS monto_pim,
       CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) / 10000
            AS DECIMAL(18,4)) AS monto_certificado,
       CAST(floor(l_extendedprice * (1 + l_tax) * 10000 + 0.5) / 10000
            AS DECIMAL(18,4)) AS monto_comprometido_anual,
       CASE WHEN l_returnflag <> 'R'
            THEN CAST(floor(l_extendedprice * (1 + l_tax) * 10000 + 0.5)
                      / 10000 AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END AS monto_comprometido,
       CASE WHEN l_linestatus = 'F'
            THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                      / 10000 AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END AS monto_devengado,
       CASE WHEN l_linestatus = 'F' AND l_returnflag <> 'R'
            THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                      / 10000 AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END AS monto_girado
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN part     ON l_partkey = p_partkey
"""
