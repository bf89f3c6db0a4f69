"""nprobe autotune from the measured recall ladder (round-10 verdict
task 6): the index manifest carries a build-time recall@k measurement
per nprobe, and serving resolves a recall TARGET to the smallest
measured nprobe that meets it."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    model_store,
    similarity,
)

SF = "/root/testdata/sf0.001"


def test_resolve_nprobe_picks_smallest_meeting_target():
    ladder = [
        {"nprobe": 8, "k": 5, "recall_at_k": 0.8},
        {"nprobe": 2, "k": 5, "recall_at_k": 0.3},
        {"nprobe": 4, "k": 5, "recall_at_k": 0.6},
        {"nprobe": 16, "k": 5, "recall_at_k": 0.9},
    ]
    assert similarity.resolve_nprobe(ladder, 0.25) == 2
    assert similarity.resolve_nprobe(ladder, 0.6) == 4
    assert similarity.resolve_nprobe(ladder, 0.61) == 8
    # unreachable target: fall back to the index's best, don't raise
    assert similarity.resolve_nprobe(ladder, 0.99) == 16
    with pytest.raises(ValueError):
        similarity.resolve_nprobe([], 0.5)


def test_target_recall_requires_ladder(spark):
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="recall_ladder"):
        similarity.ivf_pq_search(
            emb, emb.limit(2), k=5, target_recall=0.7
        )


def test_serving_manifest_carries_ladder_and_autotune_matches(spark):
    """Build the serving index through the declared query's build path,
    then: (a) the persisted manifest carries the measured ladder,
    (b) ivf_pq_search(target_recall=...) on the SAME artifacts is
    row-identical to passing the resolved nprobe explicitly — the
    documented knee, picked from measurement."""
    from proyecto_gasto_publico_etl_per__spark.plans import (
        extension_queries as EQ,
    )
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    EQ.ann_ivf_pq_serving(spark, SF)  # first call builds + measures
    base = EQ._ANN_SERVING_MODELS[SF]
    manifest, _ = model_store.load_model(
        spark, f"{base}/manifest", "ivf_pq_manifest"
    )
    ladder = manifest["recall_ladder"]
    assert [p["nprobe"] for p in ladder] == [2, 4, 8, 16]
    assert all(0.0 <= p["recall_at_k"] <= 1.0 for p in ladder)
    assert all(p["k"] == 5 for p in ladder)

    # pick a mid-ladder target: the resolved knee must be a measured rung
    target = ladder[1]["recall_at_k"]
    knee = similarity.resolve_nprobe(ladder, target)
    assert knee in (2, 4)  # smallest rung whose measured recall >= rung-4's

    emb = load_table(spark, SF, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    payload, _ = model_store.load_model(
        spark, f"{base}/centroids", "ivf_centroids"
    )
    pairs = [(int(c), [float(x) for x in v]) for c, v in payload]
    cb = model_store.load_pq_codebook(spark, f"{base}/codebook")
    index = (
        spark.read.parquet(f"{base}/index_assigned"),
        spark.read.parquet(f"{base}/index_codes"),
    )
    common = dict(
        k=5,
        m=manifest["m"],
        n_codes=manifest["n_codes"],
        rerank=manifest["rerank"],
        codebook=cb,
        centroids=pairs,
        index=index,
    )
    auto = similarity.ivf_pq_search(
        emb, probes, target_recall=target, recall_ladder=ladder, **common
    )
    explicit = similarity.ivf_pq_search(emb, probes, nprobe=knee, **common)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
