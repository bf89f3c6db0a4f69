"""Per-group trend fitting as closed-form aggregates.

The reference's BI layer serves rollups and evolutions
(`sql/CreacionDeUsuariosyVistas.sql`'s monthly/annual views, README's
quarterly-evolution query) but no trend estimation; any analyst next
asks "is ejecución trending up, and how fast?".  Closed-form simple
OLS per group answers it in ONE aggregate pass — no iteration, no ML
library:

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n
    r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))

Scale: the five sufficient statistics are map-side-combinable sums, so
a 100 TB fact produces one row of state per (group) — the same shape
as every serving aggregate.  Degenerate groups (n < 2 or zero x/y
variance) return NULL slope/r² rather than dividing by zero.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS of ``y_col`` on ``x_col``: (groups..., n, slope,
    intercept, r2).  Only pairwise-complete rows contribute — a row
    with exactly one of x/y NULL must not leak into Σx/Σx² while
    missing from Σxy (inconsistent sufficient statistics = silently
    wrong slope; r6 review finding)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    complete = x.isNotNull() & y.isNotNull()
    agg = df.where(complete).groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when((F.col("n") >= 2) & (varx_n != 0), cov_n / varx_n)
    intercept = F.when(
        slope.isNotNull(), (F.col("sy") - slope * F.col("sx")) / n
    )
    r2 = F.when(
        slope.isNotNull() & (vary_n != 0),
        (cov_n * cov_n) / (varx_n * vary_n),
    )
    return agg.select(
        *group_cols,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def seasonal_index(
    df: DataFrame,
    group_cols: Sequence[str],
    period_col: str,
    y_col: str,
) -> DataFrame:
    """Multiplicative seasonal index per (group, period): the period's
    mean over the group's overall mean (e.g. month-of-year spending
    factors).  Two hash aggregates + one broadcastable join on the
    group key; NULL where the overall mean is zero."""
    y = F.col(y_col).cast("double")
    per = df.groupBy(*group_cols, period_col).agg(
        F.avg(y).alias("period_mean")
    )
    overall = df.groupBy(*group_cols).agg(F.avg(y).alias("overall_mean"))
    joined = per.join(F.broadcast(overall), list(group_cols))
    return joined.select(
        *group_cols,
        period_col,
        F.when(
            F.col("overall_mean") != 0,
            F.col("period_mean") / F.col("overall_mean"),
        ).alias("seasonal_index"),
    )
