"""Approximate aggregates — the sketch family for interactive scale.

The reference has no approximate operators at all (SURVEY.md §2.6: "no
COUNT DISTINCT/approx-distinct, no median/percentile"); the engine's
exact variants are declared queries (`distinct_count_by_year`,
`percentile_by_sector`).  These are their sketch counterparts for the
100 TB regime, where an exact COUNT DISTINCT shuffles every distinct
value and an exact percentile sorts every group:

- ``approx_distinct``  → HyperLogLog++ (`approx_count_distinct`): fixed
  ~kilobytes of sketch per group, one map-side-combinable pass, rsd
  tunable;
- ``approx_percentiles`` → t-digest-style (`percentile_approx`): fixed
  `accuracy` sketch per group, mergeable, no global sort.

Sketches are NOT cross-engine deterministic (their merge trees depend on
partitioning), so these are intentionally NOT declared as oracle queries
— the contract here is an error BOUND against the exact answer, enforced
by `tests/test_extensions.py::test_approx_*` instead of a hash match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.02,
    alias: str = "approx_distinct",
) -> DataFrame:
    """Per-group HLL++ distinct estimate (relative std dev ``rsd``)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias(alias)
    )


def approx_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate percentiles; higher ``accuracy`` = tighter
    rank error (≤ num_rows / accuracy) and bigger sketch."""
    cols: list[Column] = [
        F.percentile_approx(value_col, p, accuracy).alias(
            f"p{int(p * 100):02d}"
        )
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*cols)
