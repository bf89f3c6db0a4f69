"""The serving views as DataFrame builders.

Reference: ``ETL Gasto publico Perú/sql/CreacionDeUsuariosyVistas.sql`` —
``vw_gasto_mensual`` (V:21-114, the 8-way denormalizing star join),
``vw_gasto_agregado_mensual`` (V:119-179) and ``vw_gasto_agregado_anual``
(V:185-196).

``star_denormalize`` is the V-base join: fact × 8 broadcast dims.  The
aggregate views then group the denormalized frame by *computed* label
columns — the reference groups directly by ``COALESCE(...)``/``CONCAT(...)``
expressions (V:161-179); per SURVEY.md §7.4 we materialize those as named
columns before ``groupBy`` so select-list and grouping expressions are
identical by construction.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import label_or_placeholder
from ..functions.money import gsum
from ..schema import DIMENSIONS, METRICS, Dim


def star_denormalize(
    fact: DataFrame,
    time_dim: DataFrame,
    dims: Mapping[str, DataFrame],
    dim_defs: Sequence[Dim] = DIMENSIONS,
    how: str = "inner",
) -> DataFrame:
    """V-base (JN4): fact joined to dim_tiempo + all dimensions on surrogate
    ids.  Every dim is broadcast — the fact never shuffles for this join."""
    out = fact.join(F.broadcast(time_dim), "tiempo_id", how)
    for dim in dim_defs:
        out = out.join(F.broadcast(dims[dim.name]), dim.id_col, how)
    return out


#: (output label column, source column, placeholder) — V:127-133, V:166-170.
AGG_LABELS: tuple[tuple[str, str, str], ...] = (
    ("sector", "sector_nombre", "SIN SECTOR"),
    ("pliego", "pliego_nombre", "SIN PLIEGO"),
    ("departamento", "departamento_nombre", "SIN DEPARTAMENTO"),
)


def vw_gasto_agregado_mensual(base: DataFrame) -> DataFrame:
    """V-aggm (AGG8): monthly rollup grouped by time + cleaned labels, with
    NULL-safe SUMs (``SUM(COALESCE(m,0))``, V:149-155)."""
    labeled = base
    for out_col, src, placeholder in AGG_LABELS:
        labeled = labeled.withColumn(
            out_col, label_or_placeholder(src, placeholder)
        )
    group_cols = ["anio", "mes", "sector", "pliego", "departamento"]
    sums = [
        gsum(F.coalesce(F.col(m), F.lit(0)), m)  # NULL-safe exact grid sum
        for m in METRICS
    ]
    agg = labeled.groupBy(*group_cols).agg(*sums)
    # region_mapa is a pure function of the departamento group key —
    # attach it AFTER the aggregate so it never widens the shuffle key
    # (same result set as grouping by it; V:161-179 groups by the
    # expression because SQL must)
    return agg.select(
        "anio",
        "mes",
        "sector",
        "pliego",
        "departamento",
        F.concat(
            F.lit("Departamento de "), F.col("departamento"), F.lit(", Perú")
        ).alias("region_mapa"),
        *METRICS,
    )


def vw_gasto_agregado_anual(base: DataFrame) -> DataFrame:
    """V-agga (AGG9): ``SUM(pim), SUM(devengado), SUM(girado) GROUP BY anio,
    sector_nombre, pliego_nombre`` (V:185-196)."""
    return base.groupBy("anio", "sector_nombre", "pliego_nombre").agg(
        gsum(F.coalesce(F.col("monto_pim"), F.lit(0)), "pim_total"),
        gsum(F.coalesce(F.col("monto_devengado"), F.lit(0)), "devengado_total"),
        gsum(F.coalesce(F.col("monto_girado"), F.lit(0)), "girado_total"),
    )
