"""Codec robustness fuzz (round 11): the per-row quarantine contract in
bulk ingest (`sample_frames`, `extract_features`) catches exceptions,
but the DIRECT decode surfaces promise a typed error contract — a
malformed payload raises ValueError (corrupt) or NotImplementedError
(unsupported feature), NEVER IndexError / KeyError / struct.error /
ZeroDivisionError, which would make triage impossible and could mask
decoder bugs.  Seeded truncations + byte flips of VALID payloads are
the highest-yield mutation family: they keep magics intact so the
mutation reaches deep decode logic instead of the magic check."""

from __future__ import annotations

import sys
import zlib
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    bmp,
    flac,
    gif,
    mp4,
    multimodal,
    tiff,
)
from proyecto_gasto_publico_etl_per__spark.operators.jpeg import (  # noqa: E402
    jpeg_decode,
)

#: the typed contract: anything else escaping a decoder is a bug
ALLOWED = (ValueError, NotImplementedError)


def _mutations(payload: bytes, rng: np.random.Generator, n_flips: int = 40):
    """Truncations at structural-ish boundaries + seeded byte flips,
    magic bytes preserved so mutations reach the decode logic."""
    outs = []
    for frac in (0.15, 0.4, 0.6, 0.85, 0.98):
        outs.append(payload[: max(4, int(len(payload) * frac))])
    for _ in range(n_flips):
        b = bytearray(payload)
        at = int(rng.integers(12, max(13, len(b))))
        if at < len(b):
            b[at] ^= int(rng.integers(1, 256))
        outs.append(bytes(b))
    return outs


def _assert_contract(decode, payloads):
    for i, p in enumerate(payloads):
        try:
            decode(p)
        except ALLOWED:
            pass
        except Exception as exc:  # noqa: BLE001 — the assertion itself
            raise AssertionError(
                f"mutation {i}: {type(exc).__name__} escaped the "
                f"ValueError/NotImplementedError contract: {exc}"
            ) from exc


def _pixels(w=12, h=10, ch=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8).tobytes()


def test_fuzz_png():
    src = _pixels()
    payload = multimodal._png_encode(12, 10, 3, src)
    _assert_contract(
        multimodal._png_decode,
        _mutations(payload, np.random.default_rng(1)),
    )


def test_fuzz_jpeg_baseline_and_lossless():
    from jpeg_ref import jpeg_encode
    from test_jpeg_lossless import jpeg_lossless_encode

    base = jpeg_encode(_pixels(ch=1), 12, 10, 1, quality=90)
    ll = jpeg_lossless_encode(_pixels(ch=1, seed=2), 12, 10, 1, predictor=4)
    rng = np.random.default_rng(2)
    _assert_contract(jpeg_decode, _mutations(base, rng))
    _assert_contract(jpeg_decode, _mutations(ll, rng))


def test_fuzz_gif():
    from test_gif import GCT, _rand_idx, gif_write  # the test-side writer

    payload = gif_write([{"idx": _rand_idx(10, 12)}], 12, 10, GCT)
    _assert_contract(
        gif.gif_decode, _mutations(payload, np.random.default_rng(3))
    )


def test_fuzz_tiff():
    from test_tiff_bmp import tiff_encode

    rng = np.random.default_rng(4)
    for comp in (1, 5, 32773):
        payload = tiff_encode(
            _pixels(seed=comp), 12, 10, 3, compression=comp,
            rows_per_strip=4,
        )
        _assert_contract(tiff.tiff_decode, _mutations(payload, rng))


def test_fuzz_bmp():
    from test_tiff_bmp import bmp_encode

    rng = np.random.default_rng(5)
    for ch in (1, 3, 4):
        payload = bmp_encode(_pixels(ch=ch, seed=ch), 12, 10, ch)
        _assert_contract(bmp.bmp_decode, _mutations(payload, rng))


def test_fuzz_mp4():
    from jpeg_ref import jpeg_encode
    from test_mp4 import mjpeg_mp4

    frames = [
        jpeg_encode(_pixels(ch=1, seed=i), 12, 10, 1, quality=90)
        for i in range(3)
    ]
    payload = mjpeg_mp4(frames, chunking=[2, 1])
    _assert_contract(
        mp4.mp4_mjpeg_frames, _mutations(payload, np.random.default_rng(6))
    )


def test_fuzz_avi():
    from jpeg_ref import jpeg_encode
    from test_video import mjpeg_avi

    frames = [
        jpeg_encode(_pixels(ch=1, seed=i), 12, 10, 1, quality=90)
        for i in range(3)
    ]
    payload = mjpeg_avi(frames, 12, 10)
    _assert_contract(
        multimodal._avi_mjpeg_frames,
        _mutations(payload, np.random.default_rng(7)),
    )


def test_fuzz_flac():
    from flac_ref import flac_encode

    rng = np.random.default_rng(8)
    samples = [int(v) for v in rng.integers(-2000, 2000, 512)]
    payload = flac_encode([samples], sample_rate=8000)
    _assert_contract(
        flac.flac_decode, _mutations(payload, np.random.default_rng(9))
    )


def test_fuzz_quarantine_end_to_end(spark):
    """The Spark-side promise the typed contract serves: a batch whose
    video payloads are mutated garbage still produces frames for every
    row via the span fallback — no mutation may abort the job."""
    from jpeg_ref import jpeg_encode
    from test_mp4 import mjpeg_mp4

    frames = [jpeg_encode(_pixels(ch=1), 12, 10, 1, quality=90)]
    good = mjpeg_mp4(frames * 3, chunking=[3])
    rng = np.random.default_rng(10)
    rows = [(0, "video", bytearray(good), {})]
    for i, mut in enumerate(_mutations(good, rng, n_flips=6)[:9], start=1):
        rows.append((i, "video", bytearray(mut), {}))
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    out = multimodal.sample_frames(assets, n_frames=2).collect()
    ids = {r["asset_id"] for r in out}
    assert ids == set(range(len(rows)))  # every row yielded frames
    assert all(len(bytes(r["frame"])) > 0 for r in out)


def test_fuzz_aiff_and_au():
    from test_pcm_audio import aiff_write, au_write
    import struct as _struct

    from proyecto_gasto_publico_etl_per__spark.operators import pcm_audio

    rng = np.random.default_rng(11)
    samples = [int(v) for v in rng.integers(-30000, 30000, 300)]
    aiff = aiff_write(samples, rate=8000, nch=1)
    au = au_write(
        b"".join(_struct.pack(">h", s) for s in samples), enc=3
    )
    _assert_contract(
        pcm_audio.aiff_decode, _mutations(aiff, np.random.default_rng(12))
    )
    _assert_contract(
        pcm_audio.au_decode, _mutations(au, np.random.default_rng(13))
    )


def test_fuzz_pnm_and_tga():
    from test_simple_images import pnm_write, tga_write

    from proyecto_gasto_publico_etl_per__spark.operators import (
        simple_images,
    )

    src = _pixels(seed=14)
    rng = np.random.default_rng(15)
    for payload in (
        pnm_write(src, 12, 10, 3),
        pnm_write(src, 12, 10, 3, ascii_mode=True),
        tga_write(src, 12, 10, 3, rle=True),
    ):
        decode = (
            simple_images.pnm_decode
            if payload[:1] == b"P"
            else simple_images.tga_decode
        )
        _assert_contract(decode, _mutations(payload, rng))
