"""Exact money math.

The warehouse stores metrics as NUMERIC (CreacionDeDataWareHouse.sql:127-133);
the reference's in-flight pandas path is float64 (transformar_mensual.py:86-87)
— a precision downgrade this engine does not copy.  Summing doubles is
non-associative, so a distributed sum of doubles is run-to-run
nondeterministic; summing decimals is exact and deterministic regardless of
partitioning.  Pattern: cast operands to DECIMAL, do arithmetic + SUM in
decimal, cast the final result to double for presentation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Operand decimal type.  (18,4) keeps products within both Spark's and
#: DuckDB's 38-digit cap without precision-loss rounding.
DEC = "decimal(18,4)"


def dmoney(col: Column | str) -> Column:
    """Cast a (possibly double/string) metric to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact decimal SUM presented as double (deterministic under any
    partitioning / AQE re-plan, unlike SUM(double)).  Use for values that
    may be negative (gsum's cheaper path needs non-negative rounding)."""
    out = F.sum(dmoney(col)).cast("double")
    return out.alias(alias) if alias else out


#: 1e-4 grid: one long "micro" = 0.0001 money units.
GRID = 10_000


def gmicros(col: Column | str) -> Column:
    """Non-negative grid metric → exact long micros.  For values already
    on the DECIMAL(18,4) grid (or raw doubles within rounding of it),
    floor(x*1e4+0.5) equals the decimal HALF_UP cast."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("double") * GRID + F.lit(0.5)).cast("long")


def gsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact SUM for NON-NEGATIVE grid metrics via long micros — ~2×
    faster than the decimal accumulator and bit-identical to it
    (same exact rational → same nearest-double presentation).

    Overflow bound: per-group totals must stay under 2^63/1e4 ≈ 9.2e14
    money units; Spark's ANSI sum(long) fails loudly, never wraps.

    Sign caveat: for values already ON the 1e-4 grid (all DECIMAL(18,4)
    columns) the quantization is exact for either sign; only raw
    non-grid doubles round differently from the decimal HALF_UP cast
    when negative (floor rounds toward -inf at half-points) — use
    ``dsum`` for those.
    """
    out = (F.sum(gmicros(col)) / GRID).cast("double")
    return out.alias(alias) if alias else out
