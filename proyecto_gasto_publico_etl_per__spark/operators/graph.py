"""Link-graph centrality: integer-exact PageRank, personalized PageRank,
and SALSA hubs & authorities.

The reference pipeline (`ETL Gasto publico Perú`) has no graph surface —
this module belongs to the training-data-curation extension lane
(SURVEY.md §2 LLM-pipeline operators): link-graph centrality is the
standard document/domain ranking signal for web-scale corpus curation
(CommonCrawl-style domain scoring), and the join-plus-aggregate iteration
here is the canonical Pregel-lite shape every distributed graph metric
(label propagation, harmonic centrality, trust rank) reduces to.

Exactness contract (the repo-wide oracle discipline,
plans/driver_queries.py module docstring): ranks live on an integer grid
of ``scale`` nano-units and every per-iteration operation is integer —
floor division by out-degree, an integer damping fraction — so each
node's rank is a sum of integers.  Integer addition is associative and
commutative, which makes the result independent of partitioning and
aggregation order and therefore bit-identical between Spark and the
DuckDB oracle, with no quantization-boundary risk (a float PageRank
would accumulate last-ulp drift across iterations and flip any
fixed-point grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank grid: 1.0 of total rank mass == 10^9 nano-units
SCALE = 10**9


def _rank_onto_edges(
    edges_d: DataFrame, ranks: DataFrame, key: str, n_salt: int
) -> DataFrame:
    """The per-iteration rank-onto-edges equi-join, optionally salted.

    Map-side combine protects the aggregate side of the iteration from
    power-law hubs, but the JOIN side still hashes ALL of a hub's edges
    to the single task owning its key — at billion-edge power-law skew
    that one task becomes the stage.  With ``n_salt > 0`` the edge side
    scatters each key over ``n_salt`` partitions (deterministic per-row
    salt) and the node-sized rank side replicates ``n_salt``× —
    ``skew.salted_join`` semantics, row-identical to the plain join
    (and bit-identical downstream: integer sums are order-independent;
    property-tested in tests/test_graph.py).  The cost is shuffling the
    rank frame ``n_salt``× — worth it exactly when the hub task is the
    bottleneck, hence opt-in."""
    if n_salt > 0:
        from .skew import salted_join

        return salted_join(edges_d, ranks, [key], "inner", n_salt=n_salt)
    return edges_d.join(ranks, key)


def pagerank_int(
    edges: DataFrame,
    iters: int = 6,
    damping_pct: int = 85,
    scale: int = SCALE,
    checkpoint_every: int = 3,
    seeds: list[int] | None = None,
    weight_col: str | None = None,
    salt_hot_join: int = 0,
) -> DataFrame:
    """PageRank over an edge list ``(src, dst)``, all arithmetic BIGINT.

    Requirements (asserted by construction, not scanned): every node
    appears as the ``src`` of at least one edge AND the ``dst`` of at
    least one edge.  Symmetrizing an undirected graph (union of both
    directions) satisfies this — then there are no dangling nodes, so no
    global leaked-mass redistribution scalar (and no extra all-reduce
    per iteration) is needed.  Parallel (duplicate) edges act as integer
    edge weights.

    Per iteration: ``contrib(v→w) = r(v) div outdeg(v)`` (integer floor),
    ``r'(w) = base + (damping_pct · Σ contrib) div 100`` where
    ``base = (100 − damping_pct)·scale div (100·N)``.  Two shuffles per
    iteration — the rank re-hash onto the pre-partitioned edge list and
    the in-neighbor aggregate — and the aggregate is a map-side-combinable
    integer sum, the shape that scales to billion-edge graphs.  Lineage
    is cut with an eager localCheckpoint every ``checkpoint_every``
    rounds (the cluster_duplicates idiom, dedup.py:537 — an iterative
    algorithm otherwise stacks plans).

    ``seeds`` switches to PERSONALIZED PageRank: the restart mass
    (both the initial vector and the per-iteration ``base`` term)
    concentrates uniformly on the seed nodes instead of spreading over
    all N — the seed-based neighborhood-expansion ranking corpus
    curation uses to grow a trusted domain set.  Same integer grid, so
    equally bit-exact.

    ``weight_col`` names an integer edge-weight column: contributions
    become ``(r·w) div strength(src)`` with ``strength = Σ w`` — one
    edge ROW per neighbor pair at any weight, instead of materializing
    parallel edges (which a high-multiplicity affinity graph cannot
    afford).  Note the weighted split is slightly MORE precise than the
    parallel-edge encoding (one floor per neighbor instead of one per
    multiplicity unit); positive weights below ~2^33 keep ``r·w`` inside
    BIGINT (ANSI mode fails loudly past it).

    ``salt_hot_join > 0`` salts the per-iteration rank-onto-edges join
    over that many partitions (see ``_rank_onto_edges``) — opt in when
    the out-degree distribution is power-law enough that one hub's edge
    list dominates a join task.  Results are bit-identical either way.

    Returns ``(node, r)`` with ``r`` the final rank in nano-units;
    ``Σ r ≈ scale`` (short by the per-node floor remainders, which is the
    price of exactness and identical in both engines).
    """
    spark = edges.sparkSession
    # materialize the edge list ONCE: it is typically the output of an
    # upstream join pipeline, and degree/count/init each read it
    if weight_col is None:
        edges = edges.select(
            "src", "dst", F.lit(1).cast("long").alias("w")
        )
    else:
        edges = edges.select(
            "src", "dst", F.col(weight_col).cast("long").alias("w")
        )
    # lazy + the count below = one materialize-and-size job (round 16)
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.sum("w").alias("deg"))
    n_edges = edges.count()
    # iteration state is (node, r) pairs — size shuffles to the graph,
    # not the session default (tiny graphs pay pure scheduler overhead
    # at 32 partitions; the 500k-rows-per-partition rule keeps a
    # billion-edge graph wide)
    n_part = max(
        1,
        min(spark.sparkContext.defaultParallelism, n_edges // 500_000 + 1),
    )
    n_nodes = deg.count()  # bounded driver scalar: one long (loop constants)
    if n_nodes == 0:
        raise ValueError("pagerank_int: empty edge list (no nodes)")
    if seeds:
        seed_set = sorted(set(seeds))
        restart = (100 - damping_pct) * scale // (100 * len(seed_set))
        init_expr = (
            F.when(F.col("node").isin(seed_set), F.lit(scale // len(seed_set)))
            .otherwise(F.lit(0))
            .cast("long")
        )
        base_expr = (
            F.when(F.col("node").isin(seed_set), F.lit(restart))
            .otherwise(F.lit(0))
            .cast("long")
        )
    else:
        init_expr = F.lit(scale // n_nodes).cast("long")
        base_expr = F.lit(
            (100 - damping_pct) * scale // (100 * n_nodes)
        ).cast("long")

    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    if n_part == 1:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges_d = (
            edges.join(deg, "src")
            .repartition(n_part, "src")
            .localCheckpoint(eager=True)
        )
        ranks = deg.select(F.col("src").alias("node")).withColumn(
            "r", init_expr
        )
        for i in range(iters):
            ranks = (
                _rank_onto_edges(
                    edges_d,
                    ranks.select(F.col("node").alias("src"), "r"),
                    "src",
                    salt_hot_join,
                )
                # integer floor split of the node's rank across out-edge
                # weight (w == 1 per row in the unweighted path)
                .select(F.col("dst"), F.expr("(r * w) div deg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("insum"))
                .select(F.col("dst").alias("node"), "insum")
                .withColumn(
                    "r",
                    (
                        base_expr
                        + F.expr(f"({damping_pct} * insum) div 100")
                    ).cast("long"),
                )
                .drop("insum")
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
                ranks = ranks.localCheckpoint(eager=True)
        # eager-cut the FINAL state while the n_part sizing confs are
        # still live — without this, the iterations after the last
        # periodic checkpoint would execute lazily under the restored
        # session confs (results unaffected, integer sums are
        # partition-independent; the sizing claim is what's at stake)
        return ranks.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def salsa_int(
    edges: DataFrame,
    iters: int = 6,
    scale: int = SCALE,
    checkpoint_every: int = 3,
    salt_hot_join: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """SALSA hubs & authorities (Lempel–Moran) over a DIRECTED edge list
    ``(src, dst)``, all arithmetic BIGINT — the random-walk-normalized
    HITS used for bipartite recommendation/endorsement ranking (the
    customer→supplier trade graph is the textbook case: hub customers
    endorse authority suppliers).

    Per iteration, two pushes: ``a(v) = Σ_{u→v} h(u) div outdeg(u)``
    (forward), then ``h(u) = Σ_{u→v} a(v) div indeg(v)`` (backward).
    The per-step degree division normalizes IN the walk, so no global
    normalization scalar (and no per-iteration all-reduce) exists —
    unlike classic HITS, whose L1/L2 renormalization needs a global
    total every round.  Requirements: every ``src`` has outdeg ≥ 1 and
    every ``dst`` indeg ≥ 1 (true of any edge list by construction);
    hub scores live on the src side, authority scores on the dst side
    (equal to each other on a symmetrized graph).

    Same scale shape as ``pagerank_int``: the edge list is checkpointed
    once with both degrees attached, each push is one equi-join plus a
    map-side-combinable integer sum, and lineage is cut every
    ``checkpoint_every`` rounds.  Same exactness contract: floor
    division keeps all state integer, so results are independent of
    partitioning and replayable bit-for-bit.  ``salt_hot_join`` salts
    BOTH per-iteration pushes (hub celebrities skew the forward push,
    authority celebrities the backward one) — see ``_rank_onto_edges``.

    Returns ``(hubs, authorities)`` as ``(node, h)`` / ``(node, a)``.
    """
    spark = edges.sparkSession
    # lazy + the count below = one materialize-and-size job (round 16)
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    indeg = edges.groupBy("dst").agg(F.count("*").alias("indeg"))
    n_edges = edges.count()
    n_part = max(
        1,
        min(spark.sparkContext.defaultParallelism, n_edges // 500_000 + 1),
    )
    n_hubs = outdeg.count()
    if n_hubs == 0:
        raise ValueError("salsa_int: empty edge list (no nodes)")

    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    if n_part == 1:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges_d = (
            edges.join(outdeg, "src")
            .join(indeg, "dst")
            .repartition(n_part, "src")
            .localCheckpoint(eager=True)
        )
        hubs = outdeg.select(F.col("src").alias("node")).withColumn(
            "h", F.lit(scale // n_hubs).cast("long")
        )
        auths = None
        for i in range(iters):
            auths = (
                _rank_onto_edges(
                    edges_d,
                    hubs.select(F.col("node").alias("src"), "h"),
                    "src",
                    salt_hot_join,
                )
                .select(F.col("dst"), F.expr("h div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").cast("long").alias("a"))
                .select(F.col("dst").alias("node"), "a")
            )
            hubs = (
                _rank_onto_edges(
                    edges_d,
                    auths.select(F.col("node").alias("dst"), "a"),
                    "dst",
                    salt_hot_join,
                )
                .select(F.col("src"), F.expr("a div indeg").alias("c"))
                .groupBy("src")
                .agg(F.sum("c").cast("long").alias("h"))
                .select(F.col("src").alias("node"), "h")
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
                hubs = hubs.localCheckpoint(eager=True)
                auths = auths.localCheckpoint(eager=True)
        # final eager cut under the live n_part confs (see pagerank_int)
        return (
            hubs.localCheckpoint(eager=True),
            auths.localCheckpoint(eager=True),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
