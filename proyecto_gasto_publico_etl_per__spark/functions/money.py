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
    partitioning / AQE re-plan, unlike SUM(double))."""
    out = F.sum(dmoney(col)).cast("double")
    return out.alias(alias) if alias else out
