"""Audio near-dup lane end-to-end (round 12, VERDICT task 5): log-mel
fingerprints → LSH-bucketed cosine pairs → shared connected components,
through the operator, the media-dedup CLI (audio mode), and the
at-ingest streamed==batch twin — mirroring what the image lane got in
round 11 (tests/test_imagehash.py)."""

from __future__ import annotations

import sys
import wave
from io import BytesIO
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    multimodal,
)


def _wav(samples: np.ndarray, sr: int = 8000) -> bytes:
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def _tone(freq: float, n: int, sr: int = 8000, amp: float = 0.5) -> np.ndarray:
    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def _assets(spark, rows):
    return spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)


def test_audio_neardup_clusters_groups_same_program(spark):
    """The same tone at different durations clusters (the fingerprint is
    duration-invariant); distinct program material stays a singleton;
    corrupt and non-audio rows carry no fingerprint and are excluded."""
    sr = 8000
    rows = [
        (1, "audio", bytearray(_wav(_tone(1000.0, 4096), sr)), {}),
        (2, "audio", bytearray(_wav(_tone(1000.0, 8192), sr)), {}),
        (3, "audio", bytearray(_wav(_tone(2000.0, 4096), sr)), {}),
        (4, "audio", bytearray(b"RIFFjunk"), {}),  # quarantined
        (5, "image", bytearray(b"\x89PNGnope"), {}),  # wrong modality
    ]
    out = {
        r["asset_id"]: r["cluster_id"]
        for r in multimodal.audio_neardup_clusters(
            _assets(spark, rows)
        ).collect()
    }
    assert out[1] == out[2] == 1  # same tone, different length
    assert out[3] == 3  # different program material
    assert 4 not in out and 5 not in out


def test_audio_identical_cohort_collapses_to_stars(spark):
    """The audio twin of the r12 collapse contract: a cohort of
    bit-identical clips (silent/constant audio, re-ingests) collapses
    to star edges from the min-id rep BEFORE the LSH self-join — the
    in-bucket clique never materializes — and still clusters with a
    near (but not identical) re-master through the rep."""
    sr = 8000
    same = _wav(_tone(600.0, 2048), sr)
    rows = [(i, "audio", bytearray(same), {}) for i in range(300)]
    # near member: same tone, longer take (duration-invariant print)
    rows.append((900, "audio", bytearray(_wav(_tone(600.0, 4096), sr)), {}))
    rows.append((901, "audio", bytearray(_wav(_tone(3000.0, 2048), sr)), {}))
    out = {
        r["asset_id"]: r["cluster_id"]
        for r in multimodal.audio_neardup_clusters(
            _assets(spark, rows)
        ).collect()
    }
    assert all(out[i] == 0 for i in range(300))  # the whole cohort
    assert out[900] == 0  # near re-master joins through the rep
    assert out[901] == 901  # distinct program stays out


def test_audio_fingerprint_pairs_collapse_and_threshold(spark):
    """The factored pair stage (round 13 — feeds the audio_neardup_pairs
    driver oracle): bit-identical fingerprints emit star edges at score
    1000 from the min-id rep, near prints pair through the LSH bucket
    with exact quantized cosine, far prints stay out, and NULL
    fingerprints are quarantined."""
    rows = [
        (10, [1.0, 2.0, -1.0, 0.5]),
        (11, [1.0, 2.0, -1.0, 0.5]),   # bit-identical → star edge
        (12, [1.0, 2.0, -1.0, 0.5]),   # second member
        (20, [1.001, 2.0, -1.0, 0.5]),  # near rep 10 (cosine ~1)
        (30, [-1.0, -2.0, 1.0, -0.5]),  # opposite direction
        (40, None),                     # quarantined
    ]
    fps = spark.createDataFrame(
        rows, "asset_id long, fingerprint array<double>"
    )
    got = {
        (r.id_a, r.id_b): r.score_q3
        for r in multimodal.audio_fingerprint_pairs(
            fps, threshold=0.95, n_planes=4
        ).collect()
    }
    assert got[(10, 11)] == 1000 and got[(10, 12)] == 1000  # star edges
    assert got[(10, 20)] == 1000  # cosine rounds to 1.000 on the grid
    assert not any(30 in p or 40 in p for p in got)
    assert set(got) == {(10, 11), (10, 12), (10, 20)}


def test_cli_media_dedup_warns_on_cross_modality_knobs(spark, tmp_path,
                                                       capsys):
    """A knob for the OTHER modality prints a warning instead of being
    silently discarded (review r12)."""
    from proyecto_gasto_publico_etl_per__spark import cli

    assets_dir = str(tmp_path / "assets")
    _assets(
        spark,
        [(1, "audio", bytearray(_wav(_tone(700.0, 2048), 8000)), {})],
    ).write.parquet(assets_dir)
    cdir = str(tmp_path / "c1")
    cli.main(
        ["media-dedup", assets_dir, cdir, "--media", "audio",
         "--max-hamming", "2"]
    )
    out = capsys.readouterr().out
    assert "--max-hamming does not apply to --media audio" in out
    cdir2 = str(tmp_path / "c2")
    cli.main(["media-dedup", assets_dir, cdir2, "--threshold", "0.8"])
    out = capsys.readouterr().out
    assert "--threshold does not apply to --media image" in out


def test_cli_media_dedup_audio_mode(spark, tmp_path, capsys):
    """media-dedup --media audio over an assets parquet: clusters land
    as (asset_id, cluster_id) with the cosine knob echoed."""
    from proyecto_gasto_publico_etl_per__spark import cli

    sr = 8000
    assets_dir = str(tmp_path / "assets")
    _assets(
        spark,
        [
            (1, "audio", bytearray(_wav(_tone(700.0, 4096), sr)), {}),
            (2, "audio", bytearray(_wav(_tone(700.0, 6144), sr)), {}),
            (3, "audio", bytearray(_wav(_tone(2500.0, 4096), sr)), {}),
            (4, "audio", bytearray(b"FORMjunk"), {}),
        ],
    ).write.parquet(assets_dir)
    cdir = str(tmp_path / "clusters")
    cli.main(["media-dedup", assets_dir, cdir, "--media", "audio"])
    out = capsys.readouterr().out
    assert "clustered 3 fingerprinted assets into 2 groups" in out
    assert "cosine >= 0.95" in out
    clusters = {
        r["asset_id"]: r["cluster_id"]
        for r in spark.read.parquet(cdir).collect()
    }
    assert clusters[1] == clusters[2] == 1
    assert clusters[3] == 3
    assert 4 not in clusters


def test_embedding_neardup_hot_bucket_cap(spark, caplog):
    """The r12 LSH cap: near-identical (but not bit-equal) vectors all
    land in one hyperplane bucket — the low-rank hazard
    hyperplane_buckets documents.  Past max_bucket the bucket drops
    from candidate generation with a logged accounting (bounded recall
    trade — INFO on the operator logger since round 13); None keeps the
    exact test-scale semantics the declared oracles pin."""
    import logging

    caplog.set_level(
        logging.INFO,
        logger="proyecto_gasto_publico_etl_per__spark.operators.similarity",
    )
    from proyecto_gasto_publico_etl_per__spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    # one direction, tiny per-row jitter: same sign pattern under any
    # hyperplane, cosine ~1
    rows = [
        (i, [1.0 + i * 1e-6, 2.0, -1.0, 0.5]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = embedding_neardup_pairs(df, threshold=0.9, n_planes=4)
    assert uncapped.count() == 30 * 29 // 2
    capped = embedding_neardup_pairs(
        df, threshold=0.9, n_planes=4, max_bucket=10, log_capped=True
    )
    assert capped.count() == 0  # the single hot bucket was dropped
    out = caplog.text
    assert "capped 1 hot LSH bucket(s) over 10 vectors" in out
    assert "largest 30" in out


def test_embedding_lsh_cap_recall_bound_property(spark):
    """The LSH cap's recall bound, property-pinned the way round 13
    pinned ``hamming_pairs`` (tests/test_imagehash.py): over corpora
    mixing several direction cohorts so the cap fires PARTIALLY — some
    buckets hot, some not — (1) the uncapped pair set is exactly the
    same-direction pairs (cross-direction candidates sharing a sign
    pattern are rejected by the exact-cosine verify), (2) capping only
    removes pairs, (3) the capped set is exactly the uncapped pairs
    whose one shared bucket stayed at or under ``max_bucket`` — a pair
    is missed ONLY if its single shared bucket was hot, the
    embedding_neardup_pairs docstring's bound stated directly.

    Vectors are ±one-hot with per-coordinate jitter ≤ 1e-3, so the
    hyperplane sign pattern cannot flip (|⟨v, plane⟩| ≥ 1 − 3e-3) and
    every cosine sits far from the 0.9 threshold's quantization grid
    (same direction ≈ 1, cross direction ≈ 0 or −1)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from proyecto_gasto_publico_etl_per__spark.operators.similarity import (
        embedding_neardup_pairs,
        hyperplane_buckets,
    )

    member = st.tuples(
        st.integers(0, 7),  # direction: ±e_d over 4 dims
        st.integers(0, 999),  # jitter seed
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        members=st.lists(member, min_size=2, max_size=24),
        cap=st.sampled_from([1, 2, 4]),
    )
    def run(members, cap):
        rows = []
        for i, (direction, seed) in enumerate(members):
            d, sign = direction % 4, 1.0 if direction < 4 else -1.0
            vec = [((seed * (j + 1)) % 7) * 1e-4 for j in range(4)]
            vec[d] += sign
            rows.append((i, direction, vec))
        df = spark.createDataFrame(
            [(i, v) for i, _, v in rows],
            "vec_id long, embedding array<double>",
        )

        def pairs(max_bucket):
            return {
                (r.id_a, r.id_b)
                for r in embedding_neardup_pairs(
                    df, threshold=0.9, n_planes=4, max_bucket=max_bucket
                ).collect()
            }

        uncapped, capped = pairs(None), pairs(cap)
        same_direction = {
            (a, b)
            for a in range(len(rows))
            for b in range(a + 1, len(rows))
            if rows[a][1] == rows[b][1]
        }
        assert uncapped == same_direction
        # bucket ground truth from the operator's own bucketing pass
        # (its determinism is pinned elsewhere); the cap counts FULL
        # bucket occupancy, so an unrelated cohort sharing a sign
        # pattern can push a small cohort's bucket over the cap
        bucket_of = {
            r.doc: r.bucket
            for r in hyperplane_buckets(
                df, "vec_id", "embedding", n_planes=4
            ).collect()
        }
        size = {}
        for b in bucket_of.values():
            size[b] = size.get(b, 0) + 1
        assert capped <= uncapped
        assert capped == {
            (a, b) for a, b in uncapped if size[bucket_of[a]] <= cap
        }
        for a, b in uncapped - capped:
            assert bucket_of[a] == bucket_of[b]
            assert size[bucket_of[a]] > cap

    run()


def test_cli_media_hash_audio_mode(spark, tmp_path, capsys):
    """media-hash --media audio persists the fingerprint column with
    the quarantine count (lane symmetry with the image media-hash)."""
    from proyecto_gasto_publico_etl_per__spark import cli

    assets_dir = str(tmp_path / "assets")
    _assets(
        spark,
        [
            (1, "audio", bytearray(_wav(_tone(440.0, 2048), 8000)), {}),
            (2, "audio", bytearray(b"RIFFjunk"), {}),
            (3, "image", bytearray(b"\x89PNGnope"), {}),
        ],
    ).write.parquet(assets_dir)
    fdir = str(tmp_path / "fps")
    cli.main(
        ["media-hash", assets_dir, fdir, "--media", "audio", "--kind",
         "ahash"]
    )
    out = capsys.readouterr().out
    assert "--kind does not apply to --media audio" in out
    assert "hashed 1/3 assets (mel-fingerprint)" in out
    got = {
        r["asset_id"]: r["fingerprint"]
        for r in spark.read.parquet(fdir).collect()
    }
    assert len(got[1]) == 32 and got[2] is None and got[3] is None


def test_audio_fingerprint_at_ingest_streamed_equals_batch(spark, tmp_path):
    """Audio fingerprinting composes with streaming ingest (the image-
    hash at-ingest pattern): assets arriving in micro-batches
    fingerprint inside foreachBatch, and the streamed set is identical
    to batch-fingerprinting the same assets — map-only, no cross-batch
    state to drift."""
    sr = 8000
    rows = [
        (i, "audio", bytearray(_wav(_tone(500.0 + 400 * i, 4096), sr)), {})
        for i in range(4)
    ]
    rows.append((9, "audio", bytearray(b"RIFFjunk"), {}))  # quarantined

    src = tmp_path / "src"
    src.mkdir()
    schema_ddl = (
        "asset_id LONG, media_type STRING, payload BINARY, "
        "meta MAP<STRING, STRING>"
    )
    _assets(spark, rows[:2]).coalesce(1).write.parquet(str(src / "b1"))
    _assets(spark, rows[2:]).coalesce(1).write.parquet(str(src / "b2"))
    out_dir = str(tmp_path / "fps")

    def fp_batch(batch_df, _epoch):
        multimodal.audio_fingerprints(batch_df).select(
            "asset_id", "fingerprint"
        ).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(fp_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def keyed(df):
        return {
            (
                r.asset_id,
                tuple(r.fingerprint) if r.fingerprint is not None else None,
            )
            for r in df.collect()
        }

    streamed = keyed(spark.read.parquet(out_dir))
    batch = keyed(
        multimodal.audio_fingerprints(_assets(spark, rows)).select(
            "asset_id", "fingerprint"
        )
    )
    assert streamed == batch
    assert (9, None) in streamed  # quarantine identical across modes
