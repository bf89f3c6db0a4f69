"""Video near-dup lane (round 12): frame-hash keys over real MJPEG/AVI
demux, pigeonhole frame pairing, video-pair thresholding, clusters —
the video twin of the image/audio lanes.  The AVI writer and JPEG
reference encoder are test-side (tests/test_video.py convention)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from jpeg_ref import jpeg_encode  # noqa: E402
from test_video import mjpeg_avi  # noqa: E402

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    multimodal,
    videohash,
)
from proyecto_gasto_publico_etl_per__spark.operators.imagehash import (  # noqa: E402
    image_phash64,
)

W = H = 64


def _scene(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    fx, fy = rng.uniform(1.0, 3.0, 2)
    px, py = rng.uniform(0, 2 * np.pi, 2)
    base = (
        np.sin(2 * np.pi * fx * x / W + px)
        + np.sin(2 * np.pi * fy * y / H + py)
    )
    img = (base + 2.0) * 63.0
    for _ in range(4):
        x0, y0 = rng.integers(0, W - 16), rng.integers(0, H - 16)
        img[y0 : y0 + 12, x0 : x0 + 12] = rng.integers(0, 256)
    return np.clip(img, 0, 255).astype(np.uint8)


def _jpeg(seed: int) -> bytes:
    return jpeg_encode(_scene(seed).tobytes(), W, H, 1, quality=95)


def _avi(seeds: list[int]) -> bytes:
    return mjpeg_avi([_jpeg(s) for s in seeds], W, H)


def _assets(spark, rows):
    return spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)


def test_video_hashes_column(spark):
    """One map pass adds frame_hashes: n_frames pHashes of the evenly
    sampled REAL frames; corrupt and non-video rows quarantine to
    NULL (the span-slicing fake is never hashed — its bytes are not
    pixels)."""
    payload = _avi([0, 1, 2, 3, 4, 5])
    rows = [
        (1, "video", bytearray(payload), {}),
        (2, "video", bytearray(b"RIFFxxxxAVI junk"), {}),
        (3, "image", bytearray(b"\x89PNGnope"), {}),
    ]
    got = {
        r["asset_id"]: r["frame_hashes"]
        for r in videohash.video_hashes(
            _assets(spark, rows), n_frames=5
        ).collect()
    }
    assert got[2] is None and got[3] is None
    assert len(got[1]) == 5
    # sampled indices from 6 real frames at n_frames=5: i*6//5 = 0,1,2,3,4
    want = [image_phash64(_jpeg(s), "phash") for s in range(5)]
    assert list(got[1]) == want


def test_video_neardup_clusters_same_footage_different_cut(spark):
    """Two cuts sharing footage cluster (A samples scenes 0-4, B
    samples 2-6 → 3 identical sampled frames ≥ min_matches=2); an
    unrelated video stays a singleton; corrupt rows carry no key."""
    rows = [
        (1, "video", bytearray(_avi([0, 1, 2, 3, 4, 5])), {}),
        (2, "video", bytearray(_avi([2, 3, 4, 5, 6, 7])), {}),
        (3, "video", bytearray(_avi([20, 21, 22, 23, 24, 25])), {}),
        (4, "video", bytearray(b"RIFFxxxxAVI junk"), {}),
    ]
    out = {
        r["asset_id"]: r["cluster_id"]
        for r in videohash.video_neardup_clusters(
            _assets(spark, rows), n_frames=5, min_matches=2
        ).collect()
    }
    assert out[1] == out[2] == 1
    assert out[3] == 3
    assert 4 not in out


def test_video_pairs_threshold_and_plan(spark):
    """min_matches gates direct pairs (3 shared sampled frames pass 2,
    fail 4); the frame pair plan inherits the pigeonhole guarantees —
    no cartesian."""
    vh = videohash.video_hashes(
        _assets(
            spark,
            [
                (1, "video", bytearray(_avi([0, 1, 2, 3, 4, 5])), {}),
                (2, "video", bytearray(_avi([2, 3, 4, 5, 6, 7])), {}),
            ],
        ),
        n_frames=5,
    ).where("frame_hashes IS NOT NULL").select("asset_id", "frame_hashes")
    vp2 = videohash.video_pairs(vh, min_matches=2)
    got = [(r.vid_a, r.vid_b, r.n_matches) for r in vp2.collect()]
    assert got == [(1, 2, 3)]
    assert videohash.video_pairs(vh, min_matches=4).count() == 0
    plan = vp2._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cli_media_hash_and_dedup_video_mode(spark, tmp_path, capsys):
    """media-hash / media-dedup --media video through the CLI:
    persisted frame_hashes column with quarantine count, then clusters
    over the same parquet; cross-modality knobs warn."""
    from proyecto_gasto_publico_etl_per__spark import cli

    assets_dir = str(tmp_path / "assets")
    _assets(
        spark,
        [
            (1, "video", bytearray(_avi([0, 1, 2, 3, 4, 5])), {}),
            (2, "video", bytearray(_avi([2, 3, 4, 5, 6, 7])), {}),
            (3, "video", bytearray(_avi([30, 31, 32, 33, 34, 35])), {}),
            (4, "video", bytearray(b"RIFFxxxxAVI junk"), {}),
        ],
    ).write.parquet(assets_dir)

    hdir = str(tmp_path / "hashes")
    cli.main(
        ["media-hash", assets_dir, hdir, "--media", "video",
         "--n-mels", "8"]
    )
    out = capsys.readouterr().out
    assert "--n-mels does not apply to --media video" in out
    assert "hashed 3/4 assets (frame-phash)" in out
    got = {
        r["asset_id"]: r["frame_hashes"]
        for r in spark.read.parquet(hdir).collect()
    }
    assert len(got[1]) == 5 and got[4] is None

    cdir = str(tmp_path / "clusters")
    cli.main(["media-dedup", assets_dir, cdir, "--media", "video"])
    out = capsys.readouterr().out
    assert "clustered 3 frame-hashed assets into 2 groups" in out
    assert "radius 3, matches >= 2" in out
    clusters = {
        r["asset_id"]: r["cluster_id"]
        for r in spark.read.parquet(cdir).collect()
    }
    assert clusters[1] == clusters[2] == 1
    assert clusters[3] == 3
    assert 4 not in clusters


def test_video_hash_at_ingest_streamed_equals_batch(spark, tmp_path):
    """Frame hashing composes with streaming ingest (the image/audio
    at-ingest pattern): video assets arriving in micro-batches hash
    inside foreachBatch, and the streamed key set is identical to
    batch-hashing the same assets — map-only, no cross-batch state."""
    rows = [
        (i, "video", bytearray(_avi([10 * i + j for j in range(6)])), {})
        for i in range(3)
    ]
    rows.append((9, "video", bytearray(b"RIFFxxxxAVI junk"), {}))

    src = tmp_path / "src"
    src.mkdir()
    schema_ddl = (
        "asset_id LONG, media_type STRING, payload BINARY, "
        "meta MAP<STRING, STRING>"
    )
    _assets(spark, rows[:2]).coalesce(1).write.parquet(str(src / "b1"))
    _assets(spark, rows[2:]).coalesce(1).write.parquet(str(src / "b2"))
    out_dir = str(tmp_path / "vh")

    def hash_batch(batch_df, _epoch):
        videohash.video_hashes(batch_df, n_frames=5).select(
            "asset_id", "frame_hashes"
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

    def keyed(df):
        return {
            (
                r.asset_id,
                tuple(r.frame_hashes) if r.frame_hashes is not None
                else None,
            )
            for r in df.collect()
        }

    streamed = keyed(spark.read.parquet(out_dir))
    batch = keyed(
        videohash.video_hashes(_assets(spark, rows), n_frames=5).select(
            "asset_id", "frame_hashes"
        )
    )
    assert streamed == batch
    assert (9, None) in streamed  # quarantine identical across modes


def test_video_pairs_value_level_counting(spark):
    """Review r12 semantics: counts are per distinct matched hash-VALUE
    pair, so (1) a third video sharing a hash cannot steal a pair's
    match (the rep-routing undercount), (2) freeze-frame repeats of one
    hash count once (the star fan-out inflation), and (3) asset ids
    carry no range restriction (no frame-key packing)."""
    h1, h2 = 0x1111, (0x77 << 32)
    rows = [
        (0, [h1, 555 << 40]),          # third video sharing h1 only
        (5, [h1, h2]),
        (9, [h1, h2]),
        # freeze-frame video: h1 repeated, nothing else shared
        (12, [h1, h1, h1, 999 << 40]),
        ((1 << 62) + 3, [h1, h2]),     # giant id works now
    ]
    vh = spark.createDataFrame(
        rows, "asset_id long, frame_hashes array<long>"
    )
    got = {
        (r.vid_a, r.vid_b): r.n_matches
        for r in videohash.video_pairs(vh, min_matches=2).collect()
    }
    big = (1 << 62) + 3
    # the h1+h2 trio all pair with 2 matches despite video 0 owning h1
    assert got[(5, 9)] == 2 and got[(5, big)] == 2 and got[(9, big)] == 2
    # freeze-frame video never reaches 2 distinct matched value pairs
    assert not any(12 in p for p in got)
    # the h1-only video pairs with nobody at min_matches=2
    assert not any(0 in p for p in got)


def test_video_pairs_ubiquitous_frame_cap(spark, caplog):
    """A frame value present in (almost) every video — black frames,
    title cards — would fan the identity join out quadratically; past
    max_value_df it drops from matching with a logged accounting (INFO
    on the operator logger since round 13), while genuinely duplicated
    videos still pair through their OTHER shared frames."""
    import logging

    caplog.set_level(
        logging.INFO,
        logger="proyecto_gasto_publico_etl_per__spark.operators.videohash",
    )
    black = 0  # the ubiquitous frame
    # fillers live in bits 48-58, the true-pair values in bits 0-15,
    # ≥8 bits apart from each other and from every filler — no
    # accidental near-value matches muddy the assertion
    rows = [(i, [black, (1000 + i) << 48]) for i in range(500)]
    # a real near-dup pair sharing two NON-ubiquitous values
    rows.append((900, [black, 0xFF, 0xFF00]))
    rows.append((901, [black, 0xFF, 0xFF00]))
    vh = spark.createDataFrame(
        rows, "asset_id long, frame_hashes array<long>"
    )
    got = {
        (r.vid_a, r.vid_b): r.n_matches
        for r in videohash.video_pairs(
            vh, min_matches=2, max_value_df=100, log_capped=True
        ).collect()
    }
    out = caplog.text
    assert "dropped 1 ubiquitous frame value(s) in over 100 videos" in out
    assert "largest 502" in out
    # the black frame contributed nothing: only the true pair remains
    assert got == {(900, 901): 2}


def test_video_pairs_match_python_reference_property(spark):
    """Value-level counting, property-checked against a brute-force
    python reference over random corpora with shared / near / repeated
    hash values — with and without the ubiquity cap."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def spread(g):
        return (g << 40) ^ (g << 20) ^ (g << 4)

    hv = st.tuples(
        st.integers(0, 4),
        st.sampled_from([0, 0, 1, 3, 255]),
    ).map(lambda t: spread(t[0]) ^ t[1])
    video = st.lists(hv, min_size=1, max_size=6)

    def ref(vids, max_hamming, min_matches, max_value_df):
        frames = {i: set(v) for i, v in enumerate(vids)}
        if max_value_df is not None:
            df = {}
            for s in frames.values():
                for h in s:
                    df[h] = df.get(h, 0) + 1
            frames = {
                i: {h for h in s if df[h] <= max_value_df}
                for i, s in frames.items()
            }
        out = {}
        ids = sorted(frames)
        for ai, a in enumerate(ids):
            for b in ids[ai + 1 :]:
                matched = {
                    tuple(sorted((x, y)))
                    for x in frames[a]
                    for y in frames[b]
                    if bin((x ^ y) & ((1 << 64) - 1)).count("1")
                    <= max_hamming
                }
                if len(matched) >= min_matches:
                    out[(a, b)] = len(matched)
        return out

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vids=st.lists(video, min_size=1, max_size=8),
        cap=st.sampled_from([None, 2, 4]),
    )
    def run(vids, cap):
        vh = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vids)],
            "asset_id long, frame_hashes array<long>",
        )
        got = {
            (r.vid_a, r.vid_b): r.n_matches
            for r in videohash.video_pairs(
                vh, min_matches=1, max_value_df=cap
            ).collect()
        }
        assert got == ref(vids, 3, 1, cap)

    run()


def test_video_hashes_rejects_bad_n_frames(spark):
    with pytest.raises(ValueError, match="n_frames"):
        videohash.video_hashes(_assets(spark, []), n_frames=0)
