"""As-of join operator (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.operators.asof import asof_join


def _ts(m):
    return datetime(2024, 1, 1, 8, m)


def test_asof_backward_inclusive_and_null_when_no_prior(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(0)), (1, 101, _ts(10)), (1, 102, _ts(20)),
         (2, 200, _ts(5))],
        "user_id BIGINT, event_id BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(15), "b"), (3, _ts(0), "z")],
        "user_id BIGINT, ts TIMESTAMP, state STRING",
    )
    out = {r.event_id: r.state for r in asof_join(left, right, ["user_id"]).collect()}
    assert out == {
        100: None,   # no state at or before 08:00
        101: "a",    # exactly at 08:10 — inclusive
        102: "b",    # latest of the two priors
        200: None,   # user 2 has no states at all
    }


def test_asof_rejects_payload_collision(spark):
    left = spark.createDataFrame([(1, _ts(0), "x")], "k BIGINT, ts TIMESTAMP, state STRING")
    right = spark.createDataFrame([(1, _ts(0), "y")], "k BIGINT, ts TIMESTAMP, state STRING")
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"])


def test_asof_rejects_reserved_names(spark):
    """A right payload (or left) column named like the operator's
    working columns (__mts, __asof_p, ...) would corrupt the fill
    struct — must be rejected, not silently mangled."""
    left = spark.createDataFrame([(1, _ts(0))], "k BIGINT, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(1, _ts(0), "y")], "k BIGINT, ts TIMESTAMP, __mts STRING"
    )
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, ["k"])


def test_asof_null_payload_field_not_seen_through(spark):
    """A right row whose payload field is NULL must deliver that NULL —
    not an older row's value for the same field (row-atomic fill)."""
    left = spark.createDataFrame(
        [(1, 100, _ts(20))], "user_id BIGINT, event_id BIGINT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), "old-a", "old-b"), (1, _ts(10), None, "new-b")],
        "user_id BIGINT, ts TIMESTAMP, a STRING, b STRING",
    )
    out = asof_join(left, right, ["user_id"]).collect()[0]
    assert out.b == "new-b"
    assert out.a is None  # NOT "old-a" — latest row's NULL wins


def test_asof_forward_and_tolerance_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(0)), (1, 101, _ts(10)), (1, 102, _ts(30)),
         (2, 200, _ts(0))],
        "user_id BIGINT, event_id BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(21), "b")],
        "user_id BIGINT, ts TIMESTAMP, state STRING",
    )
    fwd = {
        r.event_id: r.state
        for r in asof_join(
            left, right, ["user_id"], direction="forward"
        ).collect()
    }
    assert fwd == {
        100: "a",    # next state after 08:00
        101: "a",    # exactly at 08:10 — inclusive
        102: None,   # nothing after 08:30
        200: None,
    }
    # 10-minute staleness bound: 100 -> a is exactly 10 min (kept);
    # with 9 minutes it must drop
    tol10 = {
        r.event_id: r.state
        for r in asof_join(
            left, right, ["user_id"], direction="forward",
            tolerance_micros=10 * 60 * 1_000_000,
        ).collect()
    }
    assert tol10[100] == "a" and tol10[101] == "a"
    tol9 = {
        r.event_id: r.state
        for r in asof_join(
            left, right, ["user_id"], direction="forward",
            tolerance_micros=9 * 60 * 1_000_000,
        ).collect()
    }
    assert tol9[100] is None and tol9[101] == "a"

    # backward tolerance: 102 matched b (9 min back) — a 5-min bound drops it
    back5 = {
        r.event_id: r.state
        for r in asof_join(
            left, right, ["user_id"],
            tolerance_micros=5 * 60 * 1_000_000,
        ).collect()
    }
    assert back5[102] is None and back5[101] == "a"
