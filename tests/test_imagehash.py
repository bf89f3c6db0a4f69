"""Perceptual image hashing (`operators/imagehash.py`, round 11):
near-duplicate images (re-encode, resize) must land within a small
Hamming radius; unrelated structured images far away; the Spark-side
`image_hashes` column matches the python hash and the JVM
`bit_count(xor)` distance matches `hamming64`."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    imagehash,
    multimodal,
)


def _scene(seed: int, w: int = 64, h: int = 64) -> np.ndarray:
    """A structured test image: gradient background + seeded blocks
    (perceptual hashes are meaningless on pure noise — structure is
    the contract)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    # seeded GLOBAL structure (random-phase low-frequency waves), so
    # different seeds differ in layout, not just in local detail — a
    # mean/gradient hash legitimately scores images sharing one fixed
    # background as near-dups
    fx, fy = rng.uniform(1.0, 3.0, 2)
    px, py = rng.uniform(0, 2 * np.pi, 2)
    base = (
        np.sin(2 * np.pi * fx * x / w + px)
        + np.sin(2 * np.pi * fy * y / h + py)
    )
    img = np.stack(
        [
            (base + 2.0) * 63.0,
            (np.roll(base, w // 4, axis=1) + 2.0) * 63.0,
            (np.roll(base, h // 4, axis=0) + 2.0) * 63.0,
        ],
        axis=-1,
    )
    for _ in range(6):
        x0, y0 = rng.integers(0, w - 16), rng.integers(0, h - 16)
        bw, bh = rng.integers(8, 16, 2)
        img[y0 : y0 + bh, x0 : x0 + bw] = rng.integers(0, 256, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def _png(img: np.ndarray) -> bytes:
    h, w, ch = img.shape
    return multimodal._png_encode(w, h, ch, img.tobytes())


@pytest.mark.parametrize("kind", ["ahash", "dhash", "phash"])
def test_hash_is_deterministic_and_signed64(kind):
    p = _png(_scene(1))
    a = imagehash.image_phash64(p, kind)
    assert a == imagehash.image_phash64(p, kind)
    assert -(1 << 63) <= a < (1 << 63)


@pytest.mark.parametrize("kind", ["ahash", "dhash", "phash"])
def test_near_duplicates_land_close(kind):
    src = _scene(2)
    base = imagehash.image_phash64(_png(src), kind)
    # resize to 75% then decode-rehash: same structure, new raster
    resized = multimodal.resize_image_real(_png(src), 48, 48)
    d_resize = imagehash.hamming64(
        base, imagehash.image_phash64(resized, kind)
    )
    assert d_resize <= 10, d_resize
    # mild brightness shift: structure unchanged
    brighter = np.clip(src.astype(np.int16) + 12, 0, 255).astype(np.uint8)
    d_bright = imagehash.hamming64(
        base, imagehash.image_phash64(_png(brighter), kind)
    )
    assert d_bright <= 10, d_bright


@pytest.mark.parametrize("kind", ["ahash", "dhash", "phash"])
def test_unrelated_scenes_land_far(kind):
    dists = []
    for s1, s2 in ((3, 4), (5, 6), (7, 8)):
        a = imagehash.image_phash64(_png(_scene(s1)), kind)
        b = imagehash.image_phash64(_png(_scene(s2)), kind)
        dists.append(imagehash.hamming64(a, b))
    # unrelated structured images: expect ~32; anything >= 16 separates
    # cleanly from the <= 10 near-dup radius
    assert min(dists) >= 16, dists


def test_unsupported_kind_raises():
    with pytest.raises(ValueError, match="kind"):
        imagehash.image_phash64(_png(_scene(1)), "md5")


def test_image_hashes_spark_column_and_jvm_distance(spark):
    from pyspark.sql import functions as F

    src, near = _scene(9), _scene(10)
    rows = [
        (1, "image", bytearray(_png(src)), {}),
        (2, "image", bytearray(multimodal.resize_image_real(_png(src), 48, 48)), {}),
        (3, "image", bytearray(_png(near)), {}),
        (4, "audio", bytearray(b"not an image"), {}),
        (5, "image", bytearray(b"II*\x00corrupt tiff"), {}),  # quarantined
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {
        r["asset_id"]: r["phash64"]
        for r in multimodal.image_hashes(assets, "phash").collect()
    }
    assert got[1] == imagehash.image_phash64(bytes(rows[0][2]), "phash")
    assert got[4] is None and got[5] is None  # non-image + quarantine
    # JVM bit_count(xor) == python hamming64
    jvm = (
        spark.range(1)
        .select(
            F.bit_count(
                F.lit(got[1]).bitwiseXOR(F.lit(got[2]))
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    assert jvm == imagehash.hamming64(got[1], got[2])
    assert jvm <= 10  # the near-dup radius through the Spark path
    assert imagehash.hamming64(got[1], got[3]) >= 16


def test_phash_pairs_pigeonhole_and_cluster_pipeline(spark):
    """The Spark near-dup pipeline: pigeonhole pair-gen finds exactly
    the within-radius pairs (bucket equi-join, no cartesian in the
    plan), and image_neardup_clusters groups variants of the same
    scene while singletons keep their own id."""
    from pyspark.sql import functions as F

    from proyecto_gasto_publico_etl_per__spark.operators.imagehash import (
        image_neardup_clusters,
        phash_pairs,
    )

    # hashes with known distances: 10/11 differ by 2 bits, 12 by 1 bit
    # from 10, 20/21 identical, 30 far from everything
    rows = [
        (10, 0b1010_1100),
        (11, 0b1010_1111),  # d(10,11)=2
        (12, 0b1010_1101),  # d(10,12)=1, d(11,12)=1
        (20, -(1 << 62) + 5),
        (21, -(1 << 62) + 5),  # identical negative hashes
        (30, (1 << 55) - 1),
    ]
    hashes = spark.createDataFrame(rows, "asset_id long, phash64 long")
    pairs = phash_pairs(hashes, max_hamming=3)
    got = {
        (r["img_a"], r["img_b"]): r["hamming"] for r in pairs.collect()
    }
    assert got == {
        (10, 11): 2,
        (10, 12): 1,
        (11, 12): 1,
        (20, 21): 0,
    }
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # end-to-end on real payloads: same scene re-rastered clusters
    src = _scene(20)
    assets = spark.createDataFrame(
        [
            (1, "image", bytearray(_png(src)), {}),
            (2, "image", bytearray(
                multimodal.resize_image_real(_png(src), 64, 64)
            ), {}),
            (3, "image", bytearray(_png(_scene(21))), {}),
            (4, "image", bytearray(b"II*\x00junk"), {}),  # quarantined
        ],
        multimodal.ASSET_SCHEMA,
    )
    out = {
        r["asset_id"]: r["cluster_id"]
        for r in image_neardup_clusters(assets, max_hamming=3).collect()
    }
    assert out[1] == out[2] == 1  # the re-raster joins its source
    assert out[3] == 3  # unrelated scene stays a singleton
    assert 4 not in out  # quarantined rows carry no hash


def test_hamming_pairs_degenerate_corpus_stays_linear(spark):
    """VERDICT r12 task 2: a 10k-identical-hash cohort (constant-color /
    letterboxed crawl segment) must NOT go quadratic.  Collapse
    semantics: 9 999 star edges from the min-id rep, not ~50M clique
    pairs — and the near-dup neighbor attaches at rep level only."""
    from proyecto_gasto_publico_etl_per__spark.operators.imagehash import (
        phash_pairs,
    )

    const_hash = -(1 << 61) + 12345
    rows = [(i, const_hash) for i in range(10_000)]
    rows.append((20_000, const_hash ^ 0b11))  # distance-2 neighbor
    hashes = spark.createDataFrame(rows, "asset_id long, phash64 long")
    pairs = phash_pairs(hashes, max_hamming=3)
    assert pairs.count() == 10_000  # 9 999 star + 1 rep-level cross
    got = pairs.where("hamming > 0").collect()
    assert [(r.img_a, r.img_b, r.hamming) for r in got] == [
        (0, 20_000, 2)
    ]
    star = pairs.where("hamming = 0")
    assert star.where("img_a <> 0").count() == 0  # all attach to the rep
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hamming_pairs_radius_zero_is_exact_dup_stars(spark):
    """max_hamming=0 (one 64-bit chunk — the mask must not overflow
    BIGINT) degenerates to exact-duplicate grouping: star edges only,
    no cross pairs."""
    from proyecto_gasto_publico_etl_per__spark.operators.imagehash import (
        phash_pairs,
    )

    rows = [(1, 42), (2, 42), (3, 42), (4, -7), (5, -7), (6, 99)]
    pairs = phash_pairs(
        spark.createDataFrame(rows, "asset_id long, phash64 long"),
        max_hamming=0,
    )
    got = {(r.img_a, r.img_b, r.hamming) for r in pairs.collect()}
    assert got == {(1, 2, 0), (1, 3, 0), (4, 5, 0)}


def test_hamming_pairs_rejects_streaming_input(spark):
    """Batch-only contract: the collapse window and bucket self-join
    have no streaming plan — a stream must go through foreachBatch."""
    from proyecto_gasto_publico_etl_per__spark.operators.dedup import (
        hamming_pairs,
    )

    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="batch-only"):
        hamming_pairs(stream, "value", "value", 3, 64)


def test_hamming_pairs_hot_bucket_cap_logs_and_bounds(spark, caplog):
    """Distinct hashes engineered to share one chunk-0 value collapse
    that bucket; with max_bucket set the bucket is dropped (pairs whose
    only shared chunk was hot are missed — the documented recall
    trade), the drop is logged (INFO on the operator logger — the
    round-13 advice moved the accounting off stdout), and pairs sharing
    another chunk survive."""
    import logging

    caplog.set_level(
        logging.INFO,
        logger="proyecto_gasto_publico_etl_per__spark.operators.dedup",
    )
    from proyecto_gasto_publico_etl_per__spark.operators.dedup import (
        hamming_pairs,
    )

    # 64-bit / radius 3 → 16-bit chunks.  All rows share chunk 0
    # (=0xBEEF); ids 0/1 also share chunks 1-3 (distance 2 pair);
    # the rest differ everywhere above chunk 0.
    base = 0xBEEF
    rows = [(0, (0xAAAA0000 << 16) | base), (1, (0xAAAA0003 << 16) | base)]
    rows += [(i, ((0x1000 + i * 7) << 16) | base) for i in range(2, 40)]
    hashes = spark.createDataFrame(rows, "asset_id long, phash64 long")
    from proyecto_gasto_publico_etl_per__spark.operators.imagehash import (
        phash_pairs,
    )

    uncapped = phash_pairs(hashes, max_hamming=3, max_bucket=None)
    got_all = {(r.img_a, r.img_b) for r in uncapped.collect()}
    assert (0, 1) in got_all
    capped = phash_pairs(
        hashes, max_hamming=3, max_bucket=10, log_capped=True
    )
    got_capped = {(r.img_a, r.img_b) for r in capped.collect()}
    out = caplog.text
    # hot buckets: (0, 0xBEEF) size 40, plus the shared-zero high
    # chunks (2, 0) size 38 and (3, 0) size 40
    assert "capped 3 hot bucket(s) over 10 distinct hashes" in out
    assert "largest 40" in out
    # the (0,1) pair shares chunks 1-3 too, so it survives the cap
    assert (0, 1) in got_capped
    # nothing else was within radius anyway; capping added no pairs
    assert got_capped <= got_all


def _spread(g: int) -> int:
    """Group base with non-overlapping shifted copies (the scaling
    probe's construction): cross-group distance = 3·bit_count(g1^g2)."""
    return (g << 40) ^ (g << 20) ^ (g << 4)


def _cc_min_label(ids, pairs) -> dict:
    """Union-find connected components labeled by min id."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_collapse_pairs_preserve_components_property(spark):
    """The r12 collapse contract, property-checked: over random corpora
    with identical / near / far hash cohorts, (1) the Spark pair set
    equals a pure-python mirror of the collapse semantics exactly, and
    (2) connected components over the collapsed pairs equal components
    over the BRUTE-FORCE full pair set — the invariant that makes star
    edges a safe replacement for cliques."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from proyecto_gasto_publico_etl_per__spark.operators.imagehash import (
        phash_pairs,
    )

    masks = st.sampled_from([0, 0, 0, 1, 3, 7, 255, 1 << 20, (1 << 20) | 1])
    hv = st.tuples(st.integers(0, 5), masks).map(
        lambda t: _spread(t[0]) ^ t[1]
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(hvs=st.lists(hv, min_size=1, max_size=25))
    def run(hvs):
        ids = list(range(len(hvs)))
        got = {
            (r.img_a, r.img_b, r.hamming)
            for r in phash_pairs(
                spark.createDataFrame(
                    list(zip(ids, hvs)), "asset_id long, phash64 long"
                ),
                max_hamming=3,
            ).collect()
        }
        # python mirror of the collapse contract
        groups: dict = {}
        for i, h in zip(ids, hvs):
            groups.setdefault(h, []).append(i)
        star = {
            (min(g), m, 0) for g in groups.values() for m in g if m != min(g)
        }
        reps = {h: min(g) for h, g in groups.items()}
        cross = set()
        for ha, ra in reps.items():
            for hb, rb in reps.items():
                d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
                if ra < rb and 1 <= d <= 3:
                    cross.add((ra, rb, d))
        assert got == star | cross
        # component identity vs brute-force full-pair semantics
        brute = [
            (a, b)
            for ai, a in enumerate(ids)
            for b in ids[ai + 1 :]
            if bin((hvs[a] ^ hvs[b]) & ((1 << 64) - 1)).count("1") <= 3
        ]
        assert _cc_min_label(ids, [(a, b) for a, b, _ in got]) == \
            _cc_min_label(ids, brute)

    run()


def test_hamming_cap_recall_bound_property(spark):
    """The r12 hot-bucket cap, property-checked the way r12 pinned
    ``video_pairs`` (round-13 verdict task 4): over random corpora with
    identical / near / shared-chunk cohorts and small ``max_bucket``
    values that actually fire, (1) the Spark pair set equals a
    pure-python mirror of the documented algorithm — buckets counted
    over DISTINCT hash values, dropped past the cap, pairs kept iff
    SOME shared chunk survived — both with and without the cap, and
    (2) the documented recall bound holds: a within-radius rep pair is
    missed ONLY if every chunk it shares was hot (dedup.hamming_pairs
    docstring), and capping never invents pairs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from proyecto_gasto_publico_etl_per__spark.operators.dedup import (
        hamming_pairs,
    )

    M64 = (1 << 64) - 1

    def chunk(h: int, i: int) -> int:
        return ((h & M64) >> (16 * i)) & 0xFFFF

    # _spread groups 0-5 share chunk 3 (= 0): a natural hot bucket.
    # The sign mask exercises negative int64 hashes (perceptual-hash
    # territory, where shiftrightunsigned vs arithmetic shift matters).
    masks = st.sampled_from(
        [0, 0, 0, 1, 3, 7, 255, 1 << 20, (1 << 20) | 1, 0xFFFF << 48]
    )
    hv = st.tuples(st.integers(0, 5), masks).map(
        lambda t: _spread(t[0]) ^ t[1]
    )

    def ref(hvs, max_bucket):
        """Pure-python mirror: collapse + bucket cap + verify."""
        groups: dict = {}
        for i, h in enumerate(hvs):
            groups.setdefault(h, []).append(i)
        star = {
            (min(g), m, 0) for g in groups.values() for m in g if m != min(g)
        }
        reps = {h: min(g) for h, g in groups.items()}
        occ: dict = {}
        for h in reps:
            for i in range(4):
                k = (i, chunk(h, i))
                occ[k] = occ.get(k, 0) + 1
        hot = {
            k
            for k, c in occ.items()
            if max_bucket is not None and c > max_bucket
        }
        cross = set()
        for ha, ra in reps.items():
            for hb, rb in reps.items():
                if ra >= rb:
                    continue
                d = bin((ha ^ hb) & M64).count("1")
                shared = [i for i in range(4) if chunk(ha, i) == chunk(hb, i)]
                if 1 <= d <= 3 and any(
                    (i, chunk(ha, i)) not in hot for i in shared
                ):
                    cross.add((ra, rb, d))
        return star | cross

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        hvs=st.lists(hv, min_size=1, max_size=25),
        cap=st.sampled_from([1, 2, 3]),
    )
    def run(hvs, cap):
        signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hvs]
        frame = spark.createDataFrame(
            list(enumerate(signed)), "asset_id long, phash64 long"
        )

        def pairs(max_bucket):
            return {
                (r.doc_a, r.doc_b, r.hamming)
                for r in hamming_pairs(
                    frame, "asset_id", "phash64", 3, 64,
                    max_bucket=max_bucket,
                ).collect()
            }

        exact, capped = pairs(None), pairs(cap)
        assert exact == ref(hvs, None)
        assert capped == ref(hvs, cap)
        # the documented recall bound, stated directly: capping only
        # ever REMOVES pairs, and a removed pair had every shared
        # chunk in a hot bucket
        assert capped <= exact
        occ: dict = {}
        for h in {hh & M64 for hh in hvs}:
            for i in range(4):
                k = (i, chunk(h, i))
                occ[k] = occ.get(k, 0) + 1
        rep_hv = {}
        for i, h in enumerate(hvs):
            rep_hv.setdefault(h, i)
        by_rep = {i: h for h, i in rep_hv.items()}
        for ra, rb, d in exact - capped:
            assert d >= 1  # star edges are never capped
            shared = [
                i
                for i in range(4)
                if chunk(by_rep[ra], i) == chunk(by_rep[rb], i)
            ]
            assert shared and all(
                occ[(i, chunk(by_rep[ra], i))] > cap for i in shared
            )

    run()


def test_cli_media_hash_and_dedup(spark, tmp_path, capsys):
    """media-hash → media-dedup through the CLI: persisted hash column
    with per-row quarantine counts, then clusters over the parquet."""
    from proyecto_gasto_publico_etl_per__spark import cli

    src = _scene(30)
    assets_dir = str(tmp_path / "assets")
    spark.createDataFrame(
        [
            (1, "image", bytearray(_png(src)), {}),
            (2, "image", bytearray(
                multimodal.resize_image_real(_png(src), 48, 48)
            ), {}),
            (3, "image", bytearray(_png(_scene(31))), {}),
            (4, "image", bytearray(b"BMjunk"), {}),  # quarantined
        ],
        multimodal.ASSET_SCHEMA,
    ).write.parquet(assets_dir)

    hdir = str(tmp_path / "hashes")
    cli.main(["media-hash", assets_dir, hdir])
    out = capsys.readouterr().out
    assert "hashed 3/4 assets (phash)" in out and "1 quarantined" in out
    got = {
        r["asset_id"]: r["phash64"]
        for r in spark.read.parquet(hdir).collect()
    }
    assert got[1] == imagehash.image_phash64(_png(src), "phash")
    assert got[4] is None

    cdir = str(tmp_path / "clusters")
    cli.main(["media-dedup", assets_dir, cdir])
    out = capsys.readouterr().out
    assert "clustered 3 hashed assets into 2 groups" in out
    clusters = {
        r["asset_id"]: r["cluster_id"]
        for r in spark.read.parquet(cdir).collect()
    }
    assert clusters[1] == clusters[2] == 1
    assert clusters[3] == 3


def test_image_hash_at_ingest_streamed_equals_batch(spark, tmp_path):
    """Perceptual hashing composes with streaming ingest (the
    ann/dsir/drift at-ingest pattern): image assets arriving in
    micro-batches hash inside foreachBatch, and the streamed hash set
    is identical to batch-hashing the same assets — the map-only plan
    has no cross-batch state to drift."""
    rows = []
    for i in range(4):
        rows.append((i, "image", bytearray(_png(_scene(40 + i))), {}))
    rows.append((9, "image", bytearray(b"BMjunk"), {}))  # quarantined

    src = tmp_path / "src"
    src.mkdir()
    schema_ddl = (
        "asset_id LONG, media_type STRING, payload BINARY, "
        "meta MAP<STRING, STRING>"
    )
    spark.createDataFrame(rows[:2], multimodal.ASSET_SCHEMA).coalesce(
        1
    ).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows[2:], multimodal.ASSET_SCHEMA).coalesce(
        1
    ).write.parquet(str(src / "b2"))
    out_dir = str(tmp_path / "hashes")

    def hash_batch(batch_df, _epoch):
        multimodal.image_hashes(batch_df, "phash").select(
            "asset_id", "phash64"
        ).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(hash_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        (r.asset_id, r.phash64)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r.asset_id, r.phash64)
        for r in multimodal.image_hashes(
            spark.createDataFrame(rows, multimodal.ASSET_SCHEMA), "phash"
        )
        .select("asset_id", "phash64")
        .collect()
    }
    assert streamed == batch
    assert (9, None) in streamed  # quarantine identical across modes
