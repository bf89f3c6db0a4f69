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

from ..functions.cleaning import label_or_placeholder, region_map_label
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


#: (column, placeholder) — the five labels the view wraps in
#: ``COALESCE(NULLIF(TRIM(x),''), 'SIN …')`` (V:127-133).  The remaining
#: group columns (ejecutora/fuente/categoria/generica/especifica names,
#: V:126,143-147) are grouped raw, exactly as the reference does.
AGG_LABELS: tuple[tuple[str, str], ...] = (
    ("sector_nombre", "SIN SECTOR"),
    ("pliego_nombre", "SIN PLIEGO"),
    ("dep_ejecutora_nombre", "SIN DEPARTAMENTO"),
    ("prov_ejecutora_nombre", "SIN PROVINCIA"),
    ("dist_ejecutora_nombre", "SIN DISTRITO"),
)

#: The view's group columns in the reference's select order (V:121-147),
#: after label substitution.  ``region_mapa`` (V:136-140) is a pure
#: function of the coalesced departamento and is attached after the agg.
AGG_GROUP_COLS: tuple[str, ...] = (
    "anio",
    "mes",
    "trimestre",
    "ejecutora_nombre",
    "sector_nombre",
    "pliego_nombre",
    "dep_ejecutora_nombre",
    "prov_ejecutora_nombre",
    "dist_ejecutora_nombre",
    "fuente_financiamiento_nombre",
    "categoria_gasto_nombre",
    "generica_nombre",
    "especifica_nombre",
)

#: output metric alias per fact metric — the view drops the ``monto_``
#: prefix (V:150-156).
AGG_METRIC_ALIASES: tuple[tuple[str, str], ...] = tuple(
    (m, m.removeprefix("monto_")) for m in METRICS
)


def vw_gasto_agregado_mensual(base: DataFrame) -> DataFrame:
    """V-aggm (AGG8): monthly rollup grouped by time + ejecutora + cleaned
    location/sector labels + financiera/clasificador names, with NULL-safe
    SUMs (``SUM(COALESCE(m,0))``, V:149-155).

    Column-for-column the reference view (V:119-179): 13 group columns +
    ``region_mapa`` + the 7 un-prefixed metric totals.
    """
    labeled = base
    for col, placeholder in AGG_LABELS:
        labeled = labeled.withColumn(col, label_or_placeholder(col, placeholder))
    sums = [
        gsum(F.coalesce(F.col(m), F.lit(0)), out)  # NULL-safe exact grid sum
        for m, out in AGG_METRIC_ALIASES
    ]
    agg = labeled.groupBy(*AGG_GROUP_COLS).agg(*sums)
    # region_mapa is a pure function of the (already-coalesced) departamento
    # group key — attach it AFTER the aggregate so it never widens the
    # shuffle key (same result set as grouping by it; V:161-179 groups by
    # the expression because SQL must).  The inner coalesce is a no-op on
    # the placeholder-substituted column but keeps the expression the
    # reference's exact V:136-140 composition.
    return agg.select(
        *AGG_GROUP_COLS[:9],
        region_map_label("dep_ejecutora_nombre").alias("region_mapa"),
        *AGG_GROUP_COLS[9:],
        *[out for _, out in AGG_METRIC_ALIASES],
    )


def vw_gasto_agregado_anual(base: DataFrame) -> DataFrame:
    """V-agga (AGG9): ``SUM(pim), SUM(devengado), SUM(girado) GROUP BY anio,
    sector_nombre, pliego_nombre`` (V:185-196)."""
    return base.groupBy("anio", "sector_nombre", "pliego_nombre").agg(
        gsum(F.coalesce(F.col("monto_pim"), F.lit(0)), "pim_total"),
        gsum(F.coalesce(F.col("monto_devengado"), F.lit(0)), "devengado_total"),
        gsum(F.coalesce(F.col("monto_girado"), F.lit(0)), "girado_total"),
    )
