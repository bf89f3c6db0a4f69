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
