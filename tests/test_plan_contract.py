"""Structural plan contracts for the headline queries.

Wall-clock on this box swings ±50% run to run (BENCH_NOTES), so perf
regressions are guarded STRUCTURALLY: each headline query's physical
plan must not grow new exchanges or sorts beyond its committed shape
(SHUFFLES.md, regenerated each round).  A refactor that doubles a scan
or drops a broadcast fails here immediately, with no timing noise.

Bounds are the round-6 counts.  If a deliberate plan change raises one,
update the bound in the same commit with a note — the test is a
tripwire, not a freeze.
"""

from __future__ import annotations

import re

import pytest

from proyecto_gasto_publico_etl_per__spark.plans.driver_queries import (
    all_queries,
)

SF = "/root/testdata/sf0.001"

#: name -> (max shuffles, max sorts).  Broadcasts/scans are not capped:
#: they vary with AQE/stats decisions; shuffle exchanges and sorts are
#: the network/CPU cost drivers the engine promises to hold.  A
#: broadcast join demoted to a shuffle join ADDS a shuffle exchange, so
#: that regression (the expensive direction) trips the cap.
HEADLINE_BOUNDS: dict[str, tuple[int, int]] = {
    "star_join_base": (0, 0),   # pure broadcast star: ZERO shuffles
    "agg_monthly_view": (2, 0),  # preagg + finalize regroup
    "agg_annual_view": (2, 0),
    "ytd_by_group": (2, 1),
    "topk_by_group": (1, 0),
    "share_of_total": (2, 1),
    "backlog_having": (1, 0),
    "quarterly_evolution": (2, 1),
    "rollup_year_sector": (2, 1),
    "topn_year": (1, 0),
    "consolidate_grain": (1, 0),
    "running_ytd_window": (3, 2),
    "events_window_agg": (1, 0),
    "sessionize": (1, 1),
    "sessionize_native": (1, 1),
}

_SHUFFLE = re.compile(
    r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|"
    r"RoundRobinPartitioning|SinglePartition)"
)
_BROADCAST = re.compile(r"BroadcastExchange")
_SORT = re.compile(r"(?:\+-|:-|^)\s*\*?\(?\d*\)?\s*Sort \[", re.M)


@pytest.mark.parametrize("name", sorted(HEADLINE_BOUNDS))
def test_headline_plan_shape(spark, name):
    max_shuffles, max_sorts = HEADLINE_BOUNDS[name]
    df = all_queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = len(_SHUFFLE.findall(plan))
    sorts = len(_SORT.findall(plan))
    assert shuffles <= max_shuffles, (
        f"{name}: {shuffles} shuffles > committed {max_shuffles}"
    )
    assert sorts <= max_sorts, (
        f"{name}: {sorts} sorts > committed {max_sorts}"
    )


def test_share_of_total_window_input_is_post_aggregate(spark):
    """r10 verdict task 7: q3's grand total is an INTENTIONAL
    empty-partition window — safe because its input is the already-
    aggregated per-ejecutora frame (|ejecutoras| rows at any scale).
    Pin that shape: the Window node must sit ABOVE the HashAggregate
    (consume its output), so a refactor that slides the window below
    the aggregate onto fact-table rows fails here immediately."""
    df = all_queries()["share_of_total"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    win = [i for i, ln in enumerate(lines) if "Window" in ln]
    agg = [i for i, ln in enumerate(lines) if "HashAggregate" in ln]
    assert win and agg, plan
    # toString prints the consumer above its input: every Window line
    # must appear before (above) the first aggregate line
    assert max(win) < min(agg), (
        "the grand-total window no longer consumes the aggregated "
        f"frame:\n{plan}"
    )
