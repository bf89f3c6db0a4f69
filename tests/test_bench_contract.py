"""Contract tests for bench.py — the round-over-round comparability
artifact.  No Spark session needed: these check the name sets and
emission shape, the two things whose silent breakage corrupted past
round artifacts (r6: unparseable stdout line; the silent-skip hazard
bench.py now guards against)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.plans.driver_queries import (  # noqa: E402
    all_queries,
)


def test_bench_names_are_registered():
    """Every HEADLINE and EXTENSIONS name must be a declared query —
    a typo would otherwise shrink the round's totals while reading as
    a speedup (bench.main also raises at runtime; this catches it in
    CI without paying a Spark session)."""
    reg = set(all_queries())
    missing = [n for n in (*bench.HEADLINE, *bench.EXTENSIONS) if n not in reg]
    assert not missing, missing


def test_bench_headline_set_is_frozen():
    """The headline set is the round-over-round comparability contract
    (r6 verdict task 8: totals only mean something if the set never
    drifts).  Changing it requires changing this test CONSCIOUSLY."""
    assert bench.HEADLINE == (
        "star_join_base",
        "agg_monthly_view",
        "agg_annual_view",
        "ytd_by_group",
        "topk_by_group",
        "share_of_total",
        "backlog_having",
        "quarterly_evolution",
        "rollup_year_sector",
        "topn_year",
        "consolidate_grain",
        "running_ytd_window",
        "events_window_agg",
        "sessionize",
    )


def test_bench_sets_are_disjoint():
    """An entry in both sets would be double-timed and double-counted."""
    assert not set(bench.HEADLINE) & set(bench.EXTENSIONS)


def test_bench_lanes_cover_extensions():
    """Every REBUILD_LANE name must be a current extension entry (a
    stale lane entry would silently un-gate a renamed serving query),
    and the serving lane — everything else — must be non-empty."""
    assert bench.REBUILD_LANE <= set(bench.EXTENSIONS), (
        bench.REBUILD_LANE - set(bench.EXTENSIONS)
    )
    assert set(bench.EXTENSIONS) - bench.REBUILD_LANE


def test_bench_floor_names_are_current():
    """BENCH_FLOOR.json is the committed clean-run baseline the serving
    gate compares against — every floored name must still be an
    extension entry, and every SERVING entry should carry a floor once
    the file exists (a new entry may lag one round; assert only that
    floors aren't stale, which is the silent-false-green hazard)."""
    import json

    if not bench.FLOOR_PATH.exists():
        return  # seeded by the first quiet-box run of the round
    floors = json.loads(bench.FLOOR_PATH.read_text())["extension_min_sec"]
    stale = set(floors) - set(bench.EXTENSIONS)
    assert not stale, stale
    assert all(v > 0 for v in floors.values())


def test_check_regressions_gates_serving_lane_only(tmp_path):
    """The gate fires on a serving entry above FACTOR×floor, skips
    rebuild-lane entries entirely, and skips entries without a floor
    (append-only growth must never break the bench)."""
    import json

    floor = tmp_path / "floor.json"
    serving = next(iter(set(bench.EXTENSIONS) - bench.REBUILD_LANE))
    rebuild = next(iter(bench.REBUILD_LANE))
    floor.write_text(
        json.dumps({"extension_min_sec": {serving: 1.0, rebuild: 1.0}})
    )
    hot = bench.REGRESSION_FACTOR + 0.1
    out = bench.check_regressions(
        {serving: hot, rebuild: 99.0, "brand_new_entry": 99.0}, floor
    )
    assert [r["query"] for r in out] == [serving]
    assert out[0]["ratio"] == round(hot, 2)
    # inside the gate: no finding
    assert not bench.check_regressions({serving: 1.4}, floor)
