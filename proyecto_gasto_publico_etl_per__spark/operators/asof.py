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
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload of the
    nearest ``right`` row with the same keys — the latest with
    ``right_ts <= left_ts`` (``direction="backward"``, inclusive) or the
    earliest with ``right_ts >= left_ts`` (``"forward"``); NULL payload
    when no such row exists.  With ``tolerance_micros``, a match farther
    than the tolerance from the left timestamp is treated as no match
    (the pandas ``merge_asof`` knob — feature-staleness bounds in
    training pipelines).

    ``right`` must be unique per (keys, right_ts) — pre-aggregate if not,
    or the fill picks an arbitrary row of the tied set.  Timestamps may
    be TIMESTAMP or TIMESTAMP_NTZ (tolerance arithmetic normalizes to
    NTZ).  Forward is the same single-shuffle window plan with the scan
    order reversed — no extra pass.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    payload = [c for c in right.columns if c not in (*keys, right_ts)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {clash}")
    reserved = {_MARK, _ATS, "__asof_p", "__mts"}
    taken = reserved & (set(payload) | set(left.columns))
    if taken:
        # "__mts" inside the fill struct and the working columns below
        # would silently produce duplicate-field structs / overwrites
        raise ValueError(
            f"columns use reserved as-of names: {sorted(taken)}"
        )

    l2 = left.withColumn(_ATS, F.col(left_ts)).withColumn(_MARK, F.lit(1))
    r2 = right.select(
        *keys, F.col(right_ts).alias(_ATS), *payload
    ).withColumn(_MARK, F.lit(0))
    # right rows sort before left rows at equal timestamps (mark 0 < 1),
    # making the inclusive semantics exact in either direction
    u = l2.unionByName(r2, allowMissingColumns=True)
    order = (
        [F.col(_ATS).asc(), F.col(_MARK).asc()]
        if direction == "backward"
        else [F.col(_ATS).desc(), F.col(_MARK).asc()]
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # fill ONE struct per right row (matched ts included for the
    # tolerance check), not each column independently — a right row with
    # a legitimately-NULL payload field must not be "seen through" to an
    # older row's value for that field
    row_payload = F.when(
        F.col(_MARK) == 0,
        F.struct(F.col(_ATS).alias("__mts"), *[F.col(c) for c in payload]),
    )
    u = u.withColumn("__asof_p", F.last(row_payload, ignorenulls=True).over(w))
    if tolerance_micros is not None:
        ntz = lambda c: c.cast("timestamp_ntz")  # noqa: E731
        gap = F.timestamp_diff(
            "MICROSECOND", ntz(F.col("__asof_p")["__mts"]), ntz(F.col(_ATS))
        )
        if direction == "forward":
            gap = -gap
        u = u.withColumn(
            "__asof_p",
            F.when(gap <= F.lit(int(tolerance_micros)), F.col("__asof_p")),
        )
    out = u.filter(F.col(_MARK) == 1)
    for c in payload:
        out = out.withColumn(c, F.col("__asof_p")[c])
    return out.drop(_MARK, _ATS, "__asof_p")
