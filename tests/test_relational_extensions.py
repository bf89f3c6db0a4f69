"""Semantic-equivalence tests for the relational coverage extensions.

Each rewrite the engine uses for scale (bucketed range join, GROUPING
SETS single-scan, struct-argmax) is checked against the naive Spark
formulation of the same semantics — independent of the DuckDB oracle,
which checks cross-engine agreement but not plan-rewrite equivalence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.plans.driver_queries import (
    REGISTRY,
    all_queries,
)
from proyecto_gasto_publico_etl_per__spark.plans.testdata_star import build_star
from proyecto_gasto_publico_etl_per__spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_range_join_bucketed_equals_naive(spark):
    """The hour-bucket equi rewrite must produce exactly the naive
    ts-BETWEEN nested-loop join's aggregate."""
    fast = REGISTRY["range_join_windows"][0](spark, SF_SMOKE)

    days = spark.range(1, 32).select(F.col("id").cast("int").alias("w_id"))
    start = F.make_timestamp(
        F.lit(2024), F.lit(1), F.col("w_id"), F.lit(2), F.lit(0), F.lit(0)
    )
    win = days.select(
        "w_id",
        start.alias("win_start"),
        (start + F.expr("INTERVAL 90 MINUTES")).alias("win_end"),
    )
    ev = load_table(spark, SF_SMOKE, "events")
    naive_hits = ev.crossJoin(win).filter(
        (F.col("ts") >= F.col("win_start")) & (F.col("ts") < F.col("win_end"))
    )
    naive = (
        win.join(
            naive_hits.groupBy("w_id").agg(F.count("*").alias("n_events")),
            ["w_id"],
            "left",
        )
        .select("w_id", F.coalesce("n_events", F.lit(0)).alias("n_events"))
    )
    fast_counts = {r.w_id: r.n_events for r in fast.collect()}
    naive_counts = {r.w_id: r.n_events for r in naive.collect()}
    assert fast_counts == naive_counts
    assert sum(fast_counts.values()) > 0  # windows actually catch events


def test_grouping_sets_equals_unioned_groupbys(spark):
    """One Expand-based GROUPING SETS scan == three separate group-bys."""
    out = REGISTRY["grouping_sets_mix"][0](spark, SF_SMOKE)
    star = build_star(spark, SF_SMOKE)

    by_nivel_sector = {
        (r[0], r[1]): r[2]
        for r in star.groupBy("nivel_gobierno_nombre", "sector_nombre")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_nivel = {
        r[0]: r[1]
        for r in star.groupBy("nivel_gobierno_nombre")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_mes = {
        r[0]: r[1]
        for r in star.groupBy("mes").agg(F.count("*").alias("n")).collect()
    }

    rows = out.collect()
    assert len(rows) == len(by_nivel_sector) + len(by_nivel) + len(by_mes)
    for r in rows:
        flags = (r.g_nivel, r.g_sector, r.g_mes)
        if flags == (0, 0, 1):
            assert (
                by_nivel_sector[(r.nivel_gobierno_nombre, r.sector_nombre)]
                == r.n_rows
            )
        elif flags == (0, 1, 1):
            assert by_nivel[r.nivel_gobierno_nombre] == r.n_rows
            assert r.sector_nombre is None
        elif flags == (1, 1, 0):
            assert by_mes[r.mes] == r.n_rows
            assert r.nivel_gobierno_nombre is None
        else:  # no other grouping-set combination may appear
            raise AssertionError(f"unexpected grouping flags {flags}")


def test_argmax_equals_window_formulation(spark):
    """max(struct(...)) argmax == the row_number window formulation."""
    from pyspark.sql import Window

    fast = REGISTRY["argmax_latest_event"][0](spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    slow = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )
    fast_map = {r.user_id: r.last_event_id for r in fast.collect()}
    slow_map = {r.user_id: r.event_id for r in slow.collect()}
    assert fast_map == slow_map


def test_embedding_outliers_partition_invariant(spark):
    """The quantized-long distance pipeline must not depend on
    partitioning (the reason it avoids distributed double sums)."""
    build = all_queries()["embedding_outliers"]
    base = {
        (r.label, r.rk): (r.vec_id, r.dist_q)
        for r in build(spark, SF_SMOKE).collect()
    }
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        single = {
            (r.label, r.rk): (r.vec_id, r.dist_q)
            for r in build(spark, SF_SMOKE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == single
    assert all(d >= 0 for (_, d) in base.values())


def test_full_outer_reconcile_covers_both_sides(spark):
    """Every sector from either year appears exactly once, and the delta
    is consistent with the two totals."""
    out = REGISTRY["full_outer_reconcile"][0](spark, SF_SMOKE).collect()
    star = build_star(spark, SF_SMOKE)
    sectors = {
        r.sector_nombre
        for r in star.filter(F.col("anio").isin(1997, 1998))
        .select("sector_nombre")
        .distinct()
        .collect()
    }
    assert {r.sector_nombre for r in out} == sectors
    for r in out:
        assert abs((r.total_curr - r.total_prev) - r.delta) < 1e-6


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_join_plans_as_hash_join_not_nested_loop(spark):
    """The scale guarantee: the interval join must compile to a hash
    join on the hour bucket, never a nested loop over (event, window)."""
    plan = _plan(REGISTRY["range_join_windows"][0](spark, SF_SMOKE))
    assert "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_grouping_sets_and_unpivot_plan_single_scan_expand(spark):
    """GROUPING SETS and UNPIVOT both compile to one pass + Expand, not
    N aggregates unioned.  (Scan counts can't be asserted directly: a
    cached star prints its InMemoryRelation's child plan — FileScans
    included — inside the plan string.)"""
    for name in ("grouping_sets_mix", "unpivot_metrics"):
        plan = _plan(all_queries()[name](spark, SF_SMOKE))
        assert "Expand" in plan, name
        assert "Union" not in plan, name


def test_semi_join_plans_as_broadcast_left_semi(spark):
    plan = _plan(REGISTRY["semi_join_exists"][0](spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_argmax_plans_as_partial_aggregate_not_window(spark):
    """max(struct) argmax must plan as a two-phase aggregate (partial_max
    combines map-side, one row per user crosses the shuffle) with no
    Window node anywhere."""
    plan = _plan(REGISTRY["argmax_latest_event"][0](spark, SF_SMOKE))
    assert "Window" not in plan
    assert "partial_max" in plan
