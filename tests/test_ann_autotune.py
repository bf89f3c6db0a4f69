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


def test_resolve_nprobe_warns_on_unreachable_target():
    """ADVICE r10: an unreachable target still serves best-effort, but
    LOUDLY — the warning carries the achieved recall so serving configs
    can tell 'target met' from 'best effort below target'."""
    import warnings

    ladder = [
        {"nprobe": 2, "k": 5, "recall_at_k": 0.3},
        {"nprobe": 8, "k": 5, "recall_at_k": 0.8},
    ]
    with pytest.warns(UserWarning, match=r"unreachable.*0\.8.*nprobe=8"):
        assert similarity.resolve_nprobe(ladder, 0.99) == 8
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # reachable target stays silent
        assert similarity.resolve_nprobe(ladder, 0.5) == 8


def test_resolve_nprobe_staleness_contract():
    """Round-10 verdict task 5 (unit half): with the measurement-time
    index size recorded, growth past LADDER_MAX_GROWTH_FRAC raises
    (or warns under allow_stale) instead of resolving a recall estimate
    the index has outgrown; growth within the fraction stays silent."""
    import warnings

    ladder = [{"nprobe": 4, "k": 5, "recall_at_k": 0.7}]
    with pytest.raises(ValueError, match="STALE"):
        similarity.resolve_nprobe(
            ladder, 0.5, ladder_index_n=400, index_n=501
        )
    with pytest.warns(UserWarning, match="STALE"):
        assert (
            similarity.resolve_nprobe(
                ladder, 0.5, ladder_index_n=400, index_n=501,
                allow_stale=True,
            )
            == 4
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # within the growth budget / unknown sizes: no staleness signal
        assert similarity.resolve_nprobe(
            ladder, 0.5, ladder_index_n=400, index_n=500
        ) == 4
        assert similarity.resolve_nprobe(ladder, 0.5, index_n=999) == 4
        assert similarity.resolve_nprobe(ladder, 0.5) == 4


def test_ladder_staleness_lifecycle_on_append(spark, tmp_path, capsys):
    """Round-10 verdict task 5 (lifecycle half), all through public
    surfaces: CLI build on a 300-vector base → sweep tool measures the
    ladder (recording ladder_index_n=300) → CLI append grows the index
    to 500 (+67% > the 25% budget, and the append prints the stale-
    ladder NOTE) → ann-search --target-recall REFUSES the stale ladder
    with the re-measure remedy; re-measuring unblocks serving."""
    import sys as _sys

    from pyspark.sql import functions as F

    import tools.ann_knob_sweep as sweep
    from proyecto_gasto_publico_etl_per__spark import cli
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    base_dir = tmp_path / "sf_base"
    base_dir.mkdir()
    emb.filter(F.col("vec_id") < 300).write.parquet(
        str(base_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "annidx_stale")
    cli.main(
        ["ann-build-index", str(base_dir), idx, "--n-centroids", "8",
         "--m", "4", "--n-codes", "8"]
    )

    old_argv = _sys.argv
    try:
        _sys.argv = [
            "ann_knob_sweep.py", str(base_dir), "--grid", "8:1,8:2",
            "--write-manifest", idx,
        ]
        sweep.main()
    finally:
        _sys.argv = old_argv
    manifest, _ = model_store.load_model(spark, f"{idx}/manifest")
    assert manifest["ladder_index_n"] == 300  # the staleness anchor
    capsys.readouterr()

    # serving on the un-grown index resolves cleanly
    cli.main(
        ["ann-search", str(base_dir), idx, "3", "--target-recall", "0.0"]
    )
    assert "measured ladder" in capsys.readouterr().out

    # grow past the budget: append flags it, target-recall refuses it
    cli.main(["ann-append-index", SF, idx, "--from-id", "300"])
    out = capsys.readouterr().out
    assert "recall ladder was measured at 300" in out
    with pytest.raises(ValueError, match="STALE"):
        cli.main(
            ["ann-search", SF, idx, "3", "--target-recall", "0.0"]
        )
    capsys.readouterr()

    # re-measuring on the grown index restores the guarantee
    old_argv = _sys.argv
    try:
        _sys.argv = [
            "ann_knob_sweep.py", SF, "--grid", "8:1,8:2",
            "--write-manifest", idx,
        ]
        sweep.main()
    finally:
        _sys.argv = old_argv
    manifest, _ = model_store.load_model(spark, f"{idx}/manifest")
    assert manifest["ladder_index_n"] == 500
    capsys.readouterr()
    cli.main(["ann-search", SF, idx, "3", "--target-recall", "0.0"])
    assert "measured ladder" in capsys.readouterr().out


def test_append_remeasure_ladder_keeps_target_recall_serving(
    spark, tmp_path, capsys
):
    """ann-append-index --remeasure-ladder: the grown index gets a
    fresh ladder + staleness anchor in the same command, so
    --target-recall serving never hits the stale-ladder refusal."""
    import sys as _sys

    from pyspark.sql import functions as F

    import tools.ann_knob_sweep as sweep
    from proyecto_gasto_publico_etl_per__spark import cli
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    base_dir = tmp_path / "sf_base"
    base_dir.mkdir()
    emb.filter(F.col("vec_id") < 300).write.parquet(
        str(base_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "annidx_remeasure")
    cli.main(
        ["ann-build-index", str(base_dir), idx, "--n-centroids", "8",
         "--m", "4", "--n-codes", "8"]
    )
    old_argv = _sys.argv
    try:
        _sys.argv = [
            "ann_knob_sweep.py", str(base_dir), "--grid", "8:1,8:2",
            "--write-manifest", idx,
        ]
        sweep.main()
    finally:
        _sys.argv = old_argv
    capsys.readouterr()

    cli.main(
        ["ann-append-index", SF, idx, "--from-id", "300",
         "--remeasure-ladder"]
    )
    out = capsys.readouterr().out
    assert "re-measured the recall ladder on 500 vectors" in out
    manifest, _ = model_store.load_model(spark, f"{idx}/manifest")
    assert manifest["ladder_index_n"] == 500  # fresh anchor
    assert [p["nprobe"] for p in manifest["recall_ladder"]] == [1, 2]

    # serving resolves cleanly — no staleness refusal, no re-sweep
    cli.main(["ann-search", SF, idx, "3", "--target-recall", "0.0"])
    assert "measured ladder" in capsys.readouterr().out


def test_remeasure_raises_on_unparseable_manifest(spark, tmp_path):
    """ADVICE r11: a manifest that EXISTS but cannot be parsed must
    raise, not silently re-default geometry — a remeasure at mismatched
    PQ knobs would write back a corrupt staleness anchor.  A genuinely
    missing manifest still falls back (with a loud warning)."""
    import warnings as _warnings

    from pyspark.sql import functions as F

    from proyecto_gasto_publico_etl_per__spark import cli
    from proyecto_gasto_publico_etl_per__spark.operators.similarity import (
        remeasure_manifest_ladder,
    )
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    base_dir = tmp_path / "sf_base"
    base_dir.mkdir()
    emb.filter(F.col("vec_id") < 200).write.parquet(
        str(base_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "annidx_corrupt")
    cli.main(
        ["ann-build-index", str(base_dir), idx, "--n-centroids", "4",
         "--m", "4", "--n-codes", "8"]
    )
    # corrupt the payload in place (still a valid parquet row)
    mf = spark.read.parquet(f"{idx}/manifest").collect()[0]
    spark.createDataFrame(
        [(mf.kind, "{not json")], "kind string, payload string"
    ).write.mode("overwrite").parquet(f"{idx}/manifest_bad")
    import shutil

    shutil.rmtree(f"{idx}/manifest")
    shutil.move(f"{idx}/manifest_bad", f"{idx}/manifest")
    corpus = emb.filter(F.col("vec_id") < 200)
    probes = corpus.limit(3)
    with pytest.raises(Exception):  # json parse error propagates
        remeasure_manifest_ladder(spark, corpus, probes, idx)
    # a manifest zone that EXISTS but holds no rows is corrupt, not
    # missing — refuses instead of re-defaulting (review r12)
    spark.createDataFrame(
        [], "kind string, payload string"
    ).write.mode("overwrite").parquet(f"{idx}/manifest")
    with pytest.raises(ValueError, match="holds no rows"):
        remeasure_manifest_ladder(spark, corpus, probes, idx)
    # genuinely missing manifest: warns + defaults, does not raise
    shutil.rmtree(f"{idx}/manifest")
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        out = remeasure_manifest_ladder(spark, corpus, probes, idx)
    assert any("no manifest" in str(w.message) for w in caught)
    assert out["recall_ladder"]


def test_append_remeasure_bootstraps_missing_ladder(spark, tmp_path, capsys):
    """Review fix r11: --remeasure-ladder on an index whose manifest
    never had a ladder (bare ann-build-index) BOOTSTRAPS one at the
    default rungs instead of silently no-oping, and --target-recall
    serves immediately after."""
    from pyspark.sql import functions as F

    from proyecto_gasto_publico_etl_per__spark import cli
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    base_dir = tmp_path / "sf_base"
    base_dir.mkdir()
    emb.filter(F.col("vec_id") < 300).write.parquet(
        str(base_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "annidx_boot")
    cli.main(
        ["ann-build-index", str(base_dir), idx, "--n-centroids", "8",
         "--m", "4", "--n-codes", "8"]
    )
    capsys.readouterr()
    cli.main(
        ["ann-append-index", SF, idx, "--from-id", "300",
         "--remeasure-ladder"]
    )
    out = capsys.readouterr().out
    assert "bootstrapped the recall ladder on 500 vectors" in out
    manifest, _ = model_store.load_model(spark, f"{idx}/manifest")
    assert [p["nprobe"] for p in manifest["recall_ladder"]] == [2, 4, 8, 16]
    assert manifest["ladder_index_n"] == 500
    cli.main(["ann-search", SF, idx, "3", "--target-recall", "0.0"])
    assert "measured ladder" in capsys.readouterr().out


def test_resolve_nprobe_shrink_warns_but_resolves():
    """Round 15 (deletions exist now): an index SHRUNK past the growth
    budget — mass takedown / compaction — warns (the stale estimate is
    conservative) instead of raising, and still resolves."""
    import warnings as _w

    ladder = [
        {"nprobe": 2, "recall_at_k": 0.4, "k": 5},
        {"nprobe": 8, "recall_at_k": 0.8, "k": 5},
    ]
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got = similarity.resolve_nprobe(
            ladder, 0.7, ladder_index_n=1000, index_n=500
        )
    assert got == 8
    assert any("shrink" in str(w.message) for w in rec)
    # inside the budget in both directions: silent
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        similarity.resolve_nprobe(
            ladder, 0.7, ladder_index_n=1000, index_n=900
        )
    assert not rec


def test_cli_hybrid_search_target_recall(spark, tmp_path, capsys):
    """hybrid-search --target-recall resolves the dense component's
    nprobe from the ann manifest's measured ladder (the shared
    ann-search resolution) and still fuses."""
    import sys as _sys

    from pyspark.sql import functions as F

    import tools.ann_knob_sweep as sweep
    from proyecto_gasto_publico_etl_per__spark import cli
    from proyecto_gasto_publico_etl_per__spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pq = tmp_path / "docs.parquet"
    docs.write.parquet(str(pq))
    tidx = str(tmp_path / "tindex")
    cli.main(["text-index-build", str(pq), tidx])
    aidx = str(tmp_path / "annidx")
    cli.main(
        ["ann-build-index", SF, aidx, "--n-centroids", "8",
         "--m", "4", "--n-codes", "8"]
    )
    old_argv = _sys.argv
    try:
        _sys.argv = [
            "ann_knob_sweep.py", SF, "--grid", "8:1,8:2",
            "--write-manifest", aidx,
        ]
        sweep.main()
    finally:
        _sys.argv = old_argv
    capsys.readouterr()

    # without a ladder target: plain knobs
    cli.main(
        ["hybrid-search", SF, tidx, aidx, "3", "spark", "hash",
         "--k", "5"]
    )
    plain = capsys.readouterr().out
    assert "measured ladder" not in plain

    cli.main(
        ["hybrid-search", SF, tidx, aidx, "3", "spark", "hash",
         "--k", "5", "--target-recall", "0.0"]
    )
    out = capsys.readouterr().out
    assert "measured ladder" in out
    assert sum(1 for line in out.splitlines() if "rrf" in line) == 5
