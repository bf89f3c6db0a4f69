"""ewma_priority_monthly / triangle_brand_graph: reference-checked
semantics beyond the oracle gate (partial-window renormalization, and
triangle identities on a hand-built graph)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ewma_matches_python_reference(spark):
    """The declared query's integer EWMA == a driver-side big-int
    reference on the same monthly frame (exactness, incl. the partial
    leading windows where the weight sum renormalizes)."""
    from proyecto_gasto_publico_etl_per__spark.plans.extension_queries import (
        EWMA_W,
        ewma_priority_monthly,
    )

    got = {
        (r.prio, r.ym): (r.msum, r.ewma_q3)
        for r in ewma_priority_monthly(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    series: dict[str, list[tuple[int, int]]] = {}
    for (prio, ym), (msum, _) in sorted(got.items()):
        series.setdefault(prio, []).append((ym, msum))
    checked_partial = checked_full = False
    for prio, pts in series.items():
        for i, (ym, _) in enumerate(pts):
            lags = [pts[i - j][1] for j in range(min(i + 1, EWMA_W))]
            num = sum(
                x * (1 << (EWMA_W - 1 - j)) for j, x in enumerate(lags)
            )
            den = sum(1 << (EWMA_W - 1 - j) for j in range(len(lags)))
            assert got[(prio, ym)][1] == (1000 * num) // den
            if len(lags) < EWMA_W:
                checked_partial = True
            else:
                checked_full = True
    assert checked_partial and checked_full


def test_ewma_smooths_toward_recent(spark):
    """Sanity on the weighting: a series that jumps has its EWMA
    strictly between the old level and the new value, nearer the new
    one (newest weight is half the total for a full window)."""
    from proyecto_gasto_publico_etl_per__spark.plans import (
        extension_queries as X,
    )

    # the same arithmetic the query uses, via its building blocks: a
    # flat 1000-per-month series that jumps to 9000 in the newest month
    num = 9000 * 128 + sum(1000 * (1 << (7 - j)) for j in range(1, 8))
    den = 255
    ewma = (1000 * num) // den
    assert 1000 * 1000 < ewma < 1000 * 9000
    assert ewma > 1000 * 5000, "newest value carries half the weight"
    assert X.EWMA_W == 8


def _triangles_reference(edges: set[tuple[str, str]]) -> dict[str, int]:
    verts = {v for e in edges for v in e}
    out: dict[str, int] = {}
    vl = sorted(verts)
    for i, a in enumerate(vl):
        for b in vl[i + 1 :]:
            if (a, b) not in edges:
                continue
            for c in vl:
                if c <= b:
                    continue
                if (b, c) in edges and (a, c) in edges:
                    for v in (a, b, c):
                        out[v] = out.get(v, 0) + 1
    return out


def test_triangle_join_matches_bruteforce(spark):
    """The ordered-edge three-way join == the brute-force enumeration
    on a hand-built graph with K4 (4 triangles), a triangle, and a
    dangling path (0 triangles)."""
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    tri = [("x", "y"), ("x", "z"), ("y", "z")]
    path = [("p", "q"), ("q", "r")]
    edges = k4 + tri + path
    e = spark.createDataFrame(edges, "a STRING, b STRING")
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select("a", F.col("b").alias("c"))
    tris = e.join(e2, "b").join(e3, ["a", "c"])
    verts = (
        tris.select(F.col("a").alias("v"))
        .unionAll(tris.select(F.col("b").alias("v")))
        .unionAll(tris.select(F.col("c").alias("v")))
    )
    got = {
        r.v: r.n for r in verts.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    assert got == _triangles_reference(set(edges))
    # K4 corners each sit in 3 triangles; the lone triangle's in 1
    assert got["a"] == 3 and got["x"] == 1 and "p" not in got


def test_triangle_query_consistency(spark):
    """Every brand's triangle count is consistent with the edge list
    the query derives: a brand with n_tri > 0 must have degree >= 2."""
    from proyecto_gasto_publico_etl_per__spark.plans.extension_queries import (
        TRI_MIN_SUPPORT,
        triangle_brand_graph,
    )
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.brand: r.n_tri for r in triangle_brand_graph(spark, sf).collect()}
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    items = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("v"))
        .distinct()
    )
    a = items.select("k", F.col("v").alias("a"))
    b = items.select("k", F.col("v").alias("b"))
    edges = (
        a.join(b, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= TRI_MIN_SUPPORT)
    )
    deg: dict[str, int] = {}
    for r in edges.collect():
        deg[r.a] = deg.get(r.a, 0) + 1
        deg[r.b] = deg.get(r.b, 0) + 1
    for brand, n in got.items():
        assert n > 0
        assert deg.get(brand, 0) >= 2
    ref = _triangles_reference(
        {(r.a, r.b) for r in edges.collect()}
    )
    assert got == ref
