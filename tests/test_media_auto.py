"""Mixed-media `media-dedup --media auto` (round 13, VERDICT task 5):
one CLI pass sniffs each payload's magic bytes, routes it to the
image / audio / video lane, and unions the per-lane clusters — so a
real crawl directory needs one invocation, not three.  The contract
under test: per-modality outputs are IDENTICAL to single-media runs
with correct labels, even when the stored media_type labels are all
wrong (auto ignores labels entirely)."""

from __future__ import annotations

import sys
import wave
from io import BytesIO
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from jpeg_ref import jpeg_encode  # noqa: E402
from test_video import mjpeg_avi  # noqa: E402

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    multimodal,
)
from proyecto_gasto_publico_etl_per__spark.operators.multimodal import (  # noqa: E402
    sniff_media_type,
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


def _png(seed: int) -> bytes:
    img = _scene(seed)
    return multimodal._png_encode(W, H, 1, img.tobytes())


def _avi(seeds: list[int]) -> bytes:
    return mjpeg_avi(
        [jpeg_encode(_scene(s).tobytes(), W, H, 1, quality=95) for s in seeds],
        W,
        H,
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


def _tone(freq: float, n: int, sr: int = 8000) -> np.ndarray:
    t = np.arange(n) / sr
    return 0.5 * np.sin(2 * np.pi * freq * t)


def _assets(spark, rows):
    return spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)


# a still GIF: header, no GCT, one 1x1 image descriptor, 2-bit LZW
# stub, trailer — the sniffer walks blocks without decoding
_GIF_STILL = (
    b"GIF89a\x01\x00\x01\x00\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    b"\x02\x02\x44\x01\x00"
    b"\x3b"
)
# animated: the same image descriptor twice, with a GCE extension
_GIF_ANIM = (
    b"GIF89a\x01\x00\x01\x00\x00\x00\x00"
    b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    b"\x02\x02\x44\x01\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    b"\x02\x02\x44\x01\x00"
    b"\x3b"
)


def test_sniff_media_type_magic_table():
    """Byte-for-byte dispatch parity with the lane decoders: every
    magic the image/audio/video decoders open routes to that lane;
    everything else (incl. a bare RIFF with an unknown form type)
    quarantines to None."""
    cases = {
        _png(0): "image",
        jpeg_encode(_scene(0).tobytes(), W, H, 1, quality=90): "image",
        b"BM" + b"\x00" * 20: "image",
        b"II*\x00" + b"\x00" * 8: "image",
        b"MM\x00*" + b"\x00" * 8: "image",
        b"P5 2 2 255\n....": "image",
        _GIF_STILL: "image",
        _GIF_ANIM: "video",
        _avi([0, 1]): "video",
        b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8: "video",
        _wav(_tone(700.0, 256)): "audio",
        b"FORM\x00\x00\x00\x20AIFF" + b"\x00" * 8: "audio",
        b"FORM\x00\x00\x00\x20AIFC" + b"\x00" * 8: "audio",
        b".snd" + b"\x00" * 20: "audio",
        b"fLaC" + b"\x00" * 20: "audio",
        b"RIFF\x00\x00\x00\x20JUNK" + b"\x00" * 8: None,
        b"junkjunkjunkjunkjunk": None,
        b"": None,
        None: None,
    }
    for payload, want in cases.items():
        assert sniff_media_type(payload) == want, payload[:12]
    # TGA heuristic last: a plausible TGA header still sniffs image
    tga = bytes([0, 0, 2] + [0] * 13 + [24, 0]) + b"\x00" * 16
    assert sniff_media_type(tga) == "image"


def test_media_dedup_auto_matches_single_media_runs(spark, tmp_path, capsys):
    """The lifecycle contract: --media auto over a mixed fixture whose
    media_type labels are ALL WRONG produces, per modality, exactly the
    clusters of a correctly-labeled single-media operator run; junk
    payloads are excluded; the summary reports per-lane counts."""
    from proyecto_gasto_publico_etl_per__spark import cli
    from proyecto_gasto_publico_etl_per__spark.operators.imagehash import (
        image_neardup_clusters,
    )
    from proyecto_gasto_publico_etl_per__spark.operators.videohash import (
        video_neardup_clusters,
    )

    sr = 8000
    png_a, png_b, png_c = _png(1), _png(1), _png(99)
    wav_a = _wav(_tone(700.0, 4096), sr)
    wav_b = _wav(_tone(700.0, 6144), sr)
    wav_c = _wav(_tone(2500.0, 4096), sr)
    avi_a = _avi([0, 1, 2, 3, 4, 5])
    avi_b = _avi([2, 3, 4, 5, 6, 7])
    avi_c = _avi([30, 31, 32, 33, 34, 35])
    # labels deliberately point at the WRONG lane everywhere
    mixed = [
        (1, "audio", bytearray(png_a), {}),
        (2, "video", bytearray(png_b), {}),
        (3, "audio", bytearray(png_c), {}),
        (10, "image", bytearray(wav_a), {}),
        (11, "video", bytearray(wav_b), {}),
        (12, "image", bytearray(wav_c), {}),
        (20, "image", bytearray(avi_a), {}),
        (21, "audio", bytearray(avi_b), {}),
        (22, "image", bytearray(avi_c), {}),
        (90, "image", bytearray(b"junkjunkjunkjunk"), {}),
    ]
    assets_dir = str(tmp_path / "assets")
    _assets(spark, mixed).write.parquet(assets_dir)
    out_dir = str(tmp_path / "clusters")
    cli.main(["media-dedup", assets_dir, out_dir, "--media", "auto"])
    out = capsys.readouterr().out
    assert "image 3, audio 3, video 3" in out
    assert "1 unrecognized/quarantined" in out

    got = {
        r["asset_id"]: r["cluster_id"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert 90 not in got

    # single-media expectations over CORRECTLY labeled subsets
    img = {
        r["asset_id"]: r["cluster_id"]
        for r in image_neardup_clusters(
            _assets(
                spark,
                [
                    (1, "image", bytearray(png_a), {}),
                    (2, "image", bytearray(png_b), {}),
                    (3, "image", bytearray(png_c), {}),
                ],
            )
        ).collect()
    }
    aud = {
        r["asset_id"]: r["cluster_id"]
        for r in multimodal.audio_neardup_clusters(
            _assets(
                spark,
                [
                    (10, "audio", bytearray(wav_a), {}),
                    (11, "audio", bytearray(wav_b), {}),
                    (12, "audio", bytearray(wav_c), {}),
                ],
            )
        ).collect()
    }
    vid = {
        r["asset_id"]: r["cluster_id"]
        for r in video_neardup_clusters(
            _assets(
                spark,
                [
                    (20, "video", bytearray(avi_a), {}),
                    (21, "video", bytearray(avi_b), {}),
                    (22, "video", bytearray(avi_c), {}),
                ],
            )
        ).collect()
    }
    assert {k: got[k] for k in img} == img
    assert {k: got[k] for k in aud} == aud
    assert {k: got[k] for k in vid} == vid
    assert set(got) == set(img) | set(aud) | set(vid)
    # sanity on the fixture itself: each lane has one real pair
    assert img[1] == img[2] != img[3]
    assert aud[10] == aud[11] != aud[12]
    assert vid[20] == vid[21] != vid[22]


def _keyset(df):
    """Comparable (asset_id, media_type, keys) tuples with arrays frozen."""
    return {
        (
            r.asset_id,
            r.media_type,
            r.phash64,
            tuple(r.fingerprint) if r.fingerprint is not None else None,
            tuple(r.frame_hashes) if r.frame_hashes is not None else None,
        )
        for r in df.collect()
    }


def _mixed_rows():
    """A mislabeled mixed crawl batch: 2 images, 2 audio clips, 1 video,
    1 junk payload, 1 NULL payload — labels all wrong ('auto' must
    ignore them)."""
    return [
        (1, "audio", bytearray(_png(1)), {}),
        (2, "video", bytearray(_png(2)), {}),
        (3, "image", bytearray(_wav(_tone(500.0, 4096))), {}),
        (4, "image", bytearray(_wav(_tone(900.0, 4096))), {}),
        (5, "image", bytearray(_avi([3, 4])), {}),
        (6, "image", bytearray(b"junkjunkjunkjunk"), {}),
        (7, "video", None, {}),
    ]


def test_media_keys_auto_matches_chained_single_media_extractors(spark):
    """The fused one-Arrow-pass extractor must be value-identical to
    the single-media extractors run per lane over the sniffed frame:
    fusing is a cost move, never a semantics move.

    The per-lane runs are deliberately NOT chained extractor-over-
    extractor (image_hashes → audio_fingerprints → ...): a nullable
    int64 key column crossing a LATER extractor's Arrow pass coerces
    to float64 in pandas (int64 has no NaN) and silently loses low
    bits past 2^53 — caught live writing this test (phash
    ...008027 came back ...008128).  That corruption hazard is half
    the reason media_keys_auto is one fused pass."""
    from proyecto_gasto_publico_etl_per__spark.operators.videohash import (
        video_hashes,
    )

    assets = _assets(spark, _mixed_rows())
    fused = _keyset(multimodal.media_keys_auto(assets))

    sniffed = multimodal.sniff_media_types(assets).localCheckpoint()
    mt = {r.asset_id: r.media_type for r in sniffed.collect()}
    img = {
        r.asset_id: r.phash64
        for r in multimodal.image_hashes(sniffed).collect()
    }
    aud = {
        r.asset_id: (
            tuple(r.fingerprint) if r.fingerprint is not None else None
        )
        for r in multimodal.audio_fingerprints(sniffed).collect()
    }
    vid = {
        r.asset_id: (
            tuple(r.frame_hashes)
            if r.frame_hashes is not None
            else None
        )
        for r in video_hashes(sniffed).collect()
    }
    chained = {(a, mt[a], img[a], aud[a], vid[a]) for a in mt}
    assert fused == chained
    by_type = {t[0]: t[1] for t in fused}
    assert by_type == {
        1: "image", 2: "image", 3: "audio", 4: "audio", 5: "video",
        6: "unknown", 7: "unknown",
    }
    # every recognized row got ITS modality's key and no other
    for aid, mt, ph, fp, fh in fused:
        assert (ph is not None) == (mt == "image"), aid
        assert (fp is not None) == (mt == "audio"), aid
        assert (fh is not None) == (mt == "video"), aid


def test_media_keys_at_ingest_streamed_equals_batch(spark, tmp_path):
    """The --media auto streaming twin (r13 verdict task 8): a MIXED
    crawl stream (images + audio + video + junk, mislabeled) keyed per
    micro-batch by media_keys_ingest produces exactly the batch pass's
    key set — map-only, no cross-batch state — and a replay of the
    same source is idempotent (per-epoch overwrite)."""
    from proyecto_gasto_publico_etl_per__spark.streaming.incremental import (
        media_keys_ingest,
    )

    rows = _mixed_rows()
    src = tmp_path / "src"
    src.mkdir()
    schema_ddl = (
        "asset_id LONG, media_type STRING, payload BINARY, "
        "meta MAP<STRING, STRING>"
    )
    _assets(spark, rows[:3]).coalesce(1).write.parquet(str(src / "b1"))
    _assets(spark, rows[3:]).coalesce(1).write.parquet(str(src / "b2"))
    out_dir = str(tmp_path / "keys")

    def run(ckpt):
        q = media_keys_ingest(
            spark.readStream.schema(schema_ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*")),
            out_dir,
            str(tmp_path / ckpt),
        )
        q.awaitTermination(180)

    run("ckpt")
    streamed = _keyset(
        spark.read.parquet(out_dir).drop("epoch")
    )
    batch = _keyset(multimodal.media_keys_auto(_assets(spark, rows)))
    assert streamed == batch
    # junk + NULL payloads quarantined identically across modes
    assert (6, "unknown", None, None, None) in streamed
    assert (7, "unknown", None, None, None) in streamed

    # replay from a fresh checkpoint: per-epoch overwrite keeps the
    # zone duplicate-free (at-least-once safety)
    run("ckpt2")
    assert _keyset(spark.read.parquet(out_dir).drop("epoch")) == batch


def test_cli_media_hash_auto(spark, tmp_path, capsys):
    """media-hash --media auto: one fused pass keys a mislabeled mixed
    directory; per-modality counts and quarantine are reported."""
    from proyecto_gasto_publico_etl_per__spark import cli

    src = str(tmp_path / "assets")
    _assets(spark, _mixed_rows()).write.parquet(src)
    out_dir = str(tmp_path / "keys")
    cli.main(["media-hash", src, out_dir, "--media", "auto"])
    outmsg = capsys.readouterr().out
    assert "recognized 5/7 assets" in outmsg
    assert "image 2, audio 2, video 1; 2 unrecognized" in outmsg
    got = _keyset(spark.read.parquet(out_dir))
    want = _keyset(multimodal.media_keys_auto(_assets(spark, _mixed_rows())))
    assert got == want
