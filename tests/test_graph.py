"""operators/graph.py — integer-exact PageRank.

The contract under test: the Spark loop is bit-identical to a pure-Python
integer reference (the same floor arithmetic), rank mass is conserved up
to floor remainders, and hubs outrank leaves.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.operators import graph


def _ref_pagerank(edges, iters, scale=10**9, damping=85):
    """Pure-Python mirror of graph.pagerank_int's integer arithmetic."""
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(deg)
    init = scale // n
    base = (100 - damping) * scale // (100 * n)
    r = {v: init for v in deg}
    for _ in range(iters):
        ins = defaultdict(int)
        for s, d in edges:
            ins[d] += r[s] // deg[s]
        # every node of a symmetrized graph has in-edges: ins covers all
        r = {v: base + (damping * ins[v]) // 100 for v in deg}
    return r


def _symmetrize(undirected):
    out = set()
    for a, b in undirected:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


def _test_edges():
    # a star (hub 0) plus a sparse ring so degrees vary
    und = [(0, i) for i in range(1, 10)]
    und += [(i, (i * 3 + 1) % 10) for i in range(1, 10) if i != (i * 3 + 1) % 10]
    return _symmetrize(und)


def test_pagerank_matches_python_reference(spark):
    edges = _test_edges()
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        row["node"]: row["r"]
        for row in graph.pagerank_int(df, iters=6).collect()
    }
    assert got == _ref_pagerank(edges, iters=6)


def test_pagerank_mass_conserved_and_hub_wins(spark):
    edges = _test_edges()
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    ranks = graph.pagerank_int(df, iters=6).collect()
    total = sum(r["r"] for r in ranks)
    n = len(ranks)
    # each of the 6 rounds loses < n floor remainders from the split and
    # < n+1 from the damping division; the initial split loses < n
    assert 10**9 - 7 * 2 * (n + 1) <= total <= 10**9
    by_rank = sorted(ranks, key=lambda r: -r["r"])
    assert by_rank[0]["node"] == 0  # the star hub dominates


def test_pagerank_checkpoint_cadence_is_value_invariant(spark):
    edges = _test_edges()
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    every_round = graph.pagerank_int(df, iters=5, checkpoint_every=1)
    never = graph.pagerank_int(df, iters=5, checkpoint_every=99)
    assert sorted(map(tuple, every_round.collect())) == sorted(
        map(tuple, never.collect())
    )


def test_pagerank_restores_session_confs(spark):
    before = (
        spark.conf.get("spark.sql.shuffle.partitions"),
        spark.conf.get("spark.sql.adaptive.enabled", "true"),
    )
    df = spark.createDataFrame(_test_edges(), "src LONG, dst LONG")
    graph.pagerank_int(df, iters=2).collect()
    after = (
        spark.conf.get("spark.sql.shuffle.partitions"),
        spark.conf.get("spark.sql.adaptive.enabled", "true"),
    )
    assert before == after


def test_pagerank_parallel_edges_act_as_weights(spark):
    # doubling one edge (0->1 twice) shifts rank toward node 1 relative
    # to the unweighted graph, and the result still matches the
    # pure-Python reference run on the multi-edge list
    edges = _symmetrize([(0, 1), (0, 2), (1, 2)]) + [(0, 1)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        row["node"]: row["r"]
        for row in graph.pagerank_int(df, iters=4).collect()
    }
    assert got == _ref_pagerank(edges, iters=4)
    assert got[1] > got[2]


def _ref_ppr(edges, iters, seeds, scale=10**9, damping=85):
    """Pure-Python mirror of the personalized variant."""
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    seeds = sorted(set(seeds))
    init = scale // len(seeds)
    restart = (100 - damping) * scale // (100 * len(seeds))
    r = {v: (init if v in seeds else 0) for v in deg}
    for _ in range(iters):
        ins = defaultdict(int)
        for s, d in edges:
            ins[d] += r[s] // deg[s]
        r = {
            v: (restart if v in seeds else 0) + (damping * ins[v]) // 100
            for v in deg
        }
    return r


def test_personalized_pagerank_matches_reference_and_localizes(spark):
    edges = _test_edges()
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        row["node"]: row["r"]
        for row in graph.pagerank_int(df, iters=6, seeds=[3]).collect()
    }
    assert got == _ref_ppr(edges, iters=6, seeds=[3])
    # mass localizes around the seed: the seed outranks the global run's
    # rank share for the same node, and far nodes decay
    global_r = {
        row["node"]: row["r"]
        for row in graph.pagerank_int(df, iters=6).collect()
    }
    assert got[3] > global_r[3]
    # the hub (0) is adjacent to the seed, so it stays prominent, while
    # total mass is still ~scale
    total = sum(got.values())
    assert 10**9 - 7 * 2 * (len(got) + 1) <= total <= 10**9


def test_pagerank_input_partitioning_invariant(spark):
    edges = _test_edges()
    one = graph.pagerank_int(
        spark.createDataFrame(edges, "src LONG, dst LONG").coalesce(1),
        iters=4,
    )
    many = graph.pagerank_int(
        spark.createDataFrame(edges, "src LONG, dst LONG").repartition(7),
        iters=4,
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_pagerank_empty_edges_raises(spark):
    import pytest

    df = spark.createDataFrame([], "src LONG, dst LONG")
    with pytest.raises(ValueError, match="empty edge list"):
        graph.pagerank_int(df, iters=2)


def test_weighted_pagerank_matches_reference_and_unweighted_identity(spark):
    # weighted reference: contrib = (r*w) // strength(src)
    def ref(edges_w, iters, scale=10**9, damping=85):
        strength = defaultdict(int)
        for s, _, w in edges_w:
            strength[s] += w
        n = len(strength)
        init = scale // n
        base = (100 - damping) * scale // (100 * n)
        r = {v: init for v in strength}
        for _ in range(iters):
            ins = defaultdict(int)
            for s, d, w in edges_w:
                ins[d] += (r[s] * w) // strength[s]
            r = {v: base + (damping * ins[v]) // 100 for v in strength}
        return r

    und = [(0, 1, 5), (0, 2, 1), (1, 2, 3), (2, 3, 2), (3, 0, 1)]
    edges_w = sorted(
        {(a, b, w) for a, b, w in und} | {(b, a, w) for a, b, w in und}
    )
    df = spark.createDataFrame(edges_w, "src LONG, dst LONG, w LONG")
    got = {
        row["node"]: row["r"]
        for row in graph.pagerank_int(df, iters=5, weight_col="w").collect()
    }
    assert got == ref(edges_w, iters=5)
    # heavy 0<->1 edge pulls node 1 above node 3
    assert got[1] > got[3]

    # w == 1 everywhere must equal the unweighted path exactly
    ones = df.withColumn("w", F.lit(1))
    a = graph.pagerank_int(ones, iters=4, weight_col="w")
    b = graph.pagerank_int(ones.select("src", "dst"), iters=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _ref_salsa(edges, iters, scale=10**9):
    outdeg, indeg = defaultdict(int), defaultdict(int)
    for s, d in edges:
        outdeg[s] += 1
        indeg[d] += 1
    h = {u: scale // len(outdeg) for u in outdeg}
    a = {}
    for _ in range(iters):
        a = defaultdict(int)
        for s, d in edges:
            a[d] += h[s] // outdeg[s]
        h = defaultdict(int)
        for s, d in edges:
            h[s] += a[d] // indeg[d]
    return dict(h), dict(a)


def test_salsa_matches_python_reference_on_bipartite_graph(spark):
    # customers 0-3 endorse suppliers 10-12; supplier 10 is endorsed by
    # everyone (the authority), customer 0 endorses everything (the hub)
    edges = [(0, 10), (0, 11), (0, 12), (1, 10), (2, 10), (3, 10), (3, 11)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    hubs, auths = graph.salsa_int(df, iters=4)
    got_h = {r["node"]: r["h"] for r in hubs.collect()}
    got_a = {r["node"]: r["a"] for r in auths.collect()}
    ref_h, ref_a = _ref_salsa(edges, iters=4)
    assert got_h == ref_h
    assert got_a == ref_a
    assert max(got_a, key=got_a.get) == 10  # consensus authority
    assert max(got_h, key=got_h.get) == 0  # the broadest endorser wins


def test_salsa_restores_confs_and_rejects_empty(spark):
    import pytest

    before = spark.conf.get("spark.sql.shuffle.partitions")
    df = spark.createDataFrame([(0, 1), (1, 0)], "src LONG, dst LONG")
    h, a = graph.salsa_int(df, iters=2)
    h.collect(), a.collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    with pytest.raises(ValueError, match="empty edge list"):
        graph.salsa_int(
            spark.createDataFrame([], "src LONG, dst LONG"), iters=1
        )


def test_pagerank_salted_join_is_bit_identical(spark):
    """Round-9 verdict task 5: salting the rank-onto-edges join (the
    power-law-hub mitigation) must not move a single nano-unit — the
    salted join is row-identical and integer sums are order-independent.
    The test graph is deliberately hub-skewed (star core) so the salted
    path actually scatters a hot key."""
    edges = _test_edges()
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    plain = {
        r["node"]: r["r"] for r in graph.pagerank_int(df, iters=5).collect()
    }
    salted = {
        r["node"]: r["r"]
        for r in graph.pagerank_int(df, iters=5, salt_hot_join=8).collect()
    }
    assert salted == plain
    # personalized + weighted variants ride the same join helper
    w = spark.createDataFrame(
        [(s, d, 1 + (s + d) % 3) for s, d in edges],
        "src LONG, dst LONG, w LONG",
    )
    pw = {
        r["node"]: r["r"]
        for r in graph.pagerank_int(
            w, iters=4, seeds=[0], weight_col="w"
        ).collect()
    }
    sw = {
        r["node"]: r["r"]
        for r in graph.pagerank_int(
            w, iters=4, seeds=[0], weight_col="w", salt_hot_join=4
        ).collect()
    }
    assert sw == pw


def test_salsa_salted_join_is_bit_identical(spark):
    """Both SALSA pushes (forward onto src, backward onto dst) must be
    salt-invariant — hub and authority celebrities each skew one side."""
    edges = [(c, 100 + s) for c in range(6) for s in range(c + 1)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    h0, a0 = graph.salsa_int(df, iters=4)
    h1, a1 = graph.salsa_int(df, iters=4, salt_hot_join=8)
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h0.collect()))
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a0.collect()))
