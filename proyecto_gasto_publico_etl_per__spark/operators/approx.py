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


def _cms_buckets(
    value_col: str, depth: int, width: int, salt: str
) -> Column:
    """Array of the value's ``depth`` row buckets (md5-derived, portable)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:{j}:"),
                            F.col(value_col).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % width
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of a value stream: a ``depth × width`` counter
    table ``(j, bucket, cnt)`` — frequency estimation whose SHUFFLE
    CARDINALITY is bounded by d·w instead of |vocab| (the 100 TB path
    when the exact per-token aggregate's key space is itself the
    problem; sketches from separate loads merge by summing counters).

    One pass: posexplode of the per-row bucket array → hash aggregate
    (map-side combinable).  Unlike the HLL/t-digest family above, the
    md5-derived hashing and integer sums make this sketch bit-identical
    across engines and partitionings — it stays in the bound-tested
    family only because the bound, not the hash, is its contract.
    """
    return (
        df.select(
            F.posexplode(_cms_buckets(value_col, depth, width, salt)).alias(
                "j", "bucket"
            )
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for ``items`` from a ``cms_build``
    sketch: ``est = min_j cnt[j][h_j(x)]`` — never an underestimate,
    over by at most ``ε·N`` with probability ``1 − (1/2)^depth``
    (ε ≈ 2/width for the classic bound).

    The sketch is d·w rows (broadcast-sized at any practical width), so
    estimation is a broadcast join per item bucket — corpus never
    re-touched.  ``depth/width/salt`` must match the build (they are
    the sketch's geometry, like the IVF manifest).
    """
    probes = items.select(
        F.col(value_col),
        F.posexplode(_cms_buckets(value_col, depth, width, salt)).alias(
            "j", "bucket"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .fillna({"cnt": 0})
        .groupBy(value_col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )
