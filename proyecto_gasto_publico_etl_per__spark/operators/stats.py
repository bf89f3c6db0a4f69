"""Deterministic distributed statistics.

Spark's built-in ``corr``/``covar_samp`` stream double co-moments, whose
value depends on partition merge order — run-to-run nondeterministic
under AQE, and never bit-identical to another engine.  This module
computes the same statistics from EXACT integer moments instead: quantize
operands to a fixed grid (long micros), accumulate the five raw sums in
DECIMAL(38,0) (exact 128-bit, associative), then evaluate the closed form
in double from those exact inputs — every double op is a correctly-rounded
function of exact arguments, so the result is reproducible on any engine
at any partitioning.  Same pattern as ``functions.money.gsum``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: quantization grid: 1 micro-unit = 1e-6
CORR_GRID = 1_000_000

#: exact accumulator type for the raw moments (products of micros reach
#: ~1e27 at warehouse scale — far beyond long, well within 38 digits)
ACC = "decimal(38,0)"


def _q(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("double") * CORR_GRID + F.lit(0.5)).cast("long")


def exact_grouped_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str],
    alias: str = "corr_q6",
) -> DataFrame:
    """Per-group Pearson correlation from exact decimal moments,
    presented quantized to a 1e-6 grid (engine-portable).

    Plan: one partial+final hash aggregate on ``by`` (map-side combine;
    the five moments ride one shuffle).  Null if a group is constant in
    either variable or has < 2 rows.
    """
    x, y = _q(x_col).cast(ACC), _q(y_col).cast(ACC)
    agg = (
        df.groupBy(*by)
        .agg(
            F.count("*").cast(ACC).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    corr = F.when(
        (dx > 0) & (dy > 0), num / (F.sqrt(dx) * F.sqrt(dy))
    )
    return agg.select(
        *by,
        F.col("n").cast("bigint").alias("n"),
        F.floor(corr * CORR_GRID + F.lit(0.5)).cast("bigint").alias(alias),
    )
