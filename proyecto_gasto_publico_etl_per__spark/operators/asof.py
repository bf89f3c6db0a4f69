"""As-of (backward) join — point-in-time lookups for time-series data.

Not in the reference (its only joins are equi-joins, SURVEY.md §2.5) and
not native in Spark; this is the canonical custom-operator composition:
union both sides tagged, forward-fill the right payload over a per-key
event-time window, keep the left rows.  One shuffle on the join keys, no
per-key Python, no state store — the standard scalable shape for "join
every event to the most recent dimension state at or before its
timestamp" (feature lookups in training pipelines, SCD-2 reads).

The DuckDB oracle for the declared query uses its native ``ASOF JOIN``,
so the composition is checked against a first-class implementation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MARK, _ATS = "__asof_mark", "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Left as-of backward join: every ``left`` row gains the payload of
    the latest ``right`` row with the same keys and ``right_ts <=
    left_ts`` (inclusive); NULL payload when no such row exists.

    ``right`` must be unique per (keys, right_ts) — pre-aggregate if not,
    or the fill picks an arbitrary row of the tied set.
    """
    payload = [c for c in right.columns if c not in (*keys, right_ts)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {clash}")

    l2 = left.withColumn(_ATS, F.col(left_ts)).withColumn(_MARK, F.lit(1))
    r2 = right.select(
        *keys, F.col(right_ts).alias(_ATS), *payload
    ).withColumn(_MARK, F.lit(0))
    # right rows sort before left rows at equal timestamps (mark 0 < 1),
    # making the inclusive >= semantics exact
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(_ATS, _MARK)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # fill ONE struct per right row, not each column independently — a
    # right row with a legitimately-NULL payload field must not be "seen
    # through" to an older row's value for that field
    row_payload = F.when(
        F.col(_MARK) == 0, F.struct(*[F.col(c) for c in payload])
    )
    u = u.withColumn("__asof_p", F.last(row_payload, ignorenulls=True).over(w))
    out = u.filter(F.col(_MARK) == 1)
    for c in payload:
        out = out.withColumn(c, F.col("__asof_p")[c])
    return out.drop(_MARK, _ATS, "__asof_p")
