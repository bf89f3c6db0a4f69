"""Per-group OLS trend + seasonal index."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators import trend


def test_group_trend_exact_line(spark):
    # g=a: y = 3x + 2 exactly; g=b: y = -x + 10; g=c: single point
    rows = [("a", x, 3.0 * x + 2.0) for x in range(1, 6)]
    rows += [("b", x, -1.0 * x + 10.0) for x in range(1, 4)]
    rows += [("c", 1, 5.0)]
    df = spark.createDataFrame(rows, "g STRING, x INT, y DOUBLE")
    out = {r.g: r for r in trend.group_trend(df, ["g"], "x", "y").collect()}
    assert out["a"].slope == pytest.approx(3.0)
    assert out["a"].intercept == pytest.approx(2.0)
    assert out["a"].r2 == pytest.approx(1.0)
    assert out["b"].slope == pytest.approx(-1.0)
    assert out["b"].intercept == pytest.approx(10.0)
    # degenerate group: n=1 → NULLs, not a crash or division by zero
    assert out["c"].slope is None and out["c"].r2 is None
    assert out["c"].n == 1


def test_group_trend_matches_reference_on_noisy_data(spark):
    import random

    rng = random.Random(7)
    rows = [
        (x, 0.5 * x + 4.0 + rng.uniform(-1, 1)) for x in range(20)
    ]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in rows], "g STRING, x INT, y DOUBLE"
    )
    got = trend.group_trend(df, ["g"], "x", "y").collect()[0]

    # closed-form reference in pure python
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxx = sum(x * x for x, _ in rows)
    syy = sum(y * y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert got.slope == pytest.approx(slope, rel=1e-9)
    assert got.intercept == pytest.approx(intercept, rel=1e-9)
    assert got.r2 == pytest.approx(r2, rel=1e-9)
    assert 0 < got.r2 < 1


def test_seasonal_index(spark):
    # two full years, december doubles the base level
    rows = []
    for year in (2023, 2024):
        for month in range(1, 13):
            rows.append(("s", month, 200.0 if month == 12 else 100.0))
    df = spark.createDataFrame(rows, "g STRING, mes INT, y DOUBLE")
    out = {
        r.mes: r.seasonal_index
        for r in trend.seasonal_index(df, ["g"], "mes", "y").collect()
    }
    overall = (11 * 100.0 + 200.0) / 12
    assert out[12] == pytest.approx(200.0 / overall)
    assert out[1] == pytest.approx(100.0 / overall)
    assert len(out) == 12


def test_group_trend_pairwise_complete_only(spark):
    """A row with exactly one of x/y NULL must not skew the statistics
    (r6 review): slope over the two complete points is exact."""
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 3.0), ("g", 5, None), ("g", None, 9.0)],
        "g STRING, x INT, y DOUBLE",
    )
    out = trend.group_trend(df, ["g"], "x", "y").collect()[0]
    assert out.n == 2
    assert out.slope == pytest.approx(2.0)
    assert out.intercept == pytest.approx(-1.0)
