"""Real MJPEG/AVI video frame sampling (round 10): RIFF container walk
→ evenly-spaced frame pick → each frame a standalone baseline JPEG
decodable by the stdlib decoder.  The minimal AVI writer below is
test-side only (like the JPEG reference encoder) so the path is
exercisable with no video codec in the container."""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from proyecto_gasto_publico_etl_per__spark.operators import multimodal  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.operators.jpeg import (  # noqa: E402
    jpeg_decode,
)
from jpeg_ref import jpeg_encode  # noqa: E402


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def mjpeg_avi(frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """Minimal RIFF/AVI wrapper around pre-encoded JPEG frames: hdrl
    with avih/strh/strf (header fields approximate — the engine's
    parser only needs the movi walk, and real players need far more),
    then LIST movi with one 00dc chunk per frame."""
    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<12I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0, 0, 0
    )
    strf = struct.pack(
        "<I2i2H4sI2i2I", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _frame_pixels(shift: int, w: int = 16, h: int = 16) -> bytes:
    y, x = np.mgrid[0:h, 0:w]
    return (((x + shift * 7) * 9 + y * 3) % 200 + 20).astype(np.uint8).tobytes()


def test_avi_walk_extracts_all_frames():
    frames = [
        jpeg_encode(_frame_pixels(i), 16, 16, 1, quality=95) for i in range(6)
    ]
    avi = mjpeg_avi(frames, 16, 16)
    got = multimodal._avi_mjpeg_frames(avi)
    assert got == frames  # byte-exact, order preserved


def test_sample_frames_real_avi_yields_decodable_jpegs(spark):
    """End-to-end: AVI payload in an asset row → sample_frames picks
    evenly-spaced REAL frames → each decodes to the expected source
    pixels (JPEG tolerance).  An odd payload alongside proves the
    non-RIFF fallback still slices spans."""
    n_src, n_pick = 6, 3
    frames = [
        jpeg_encode(_frame_pixels(i), 16, 16, 1, quality=95)
        for i in range(n_src)
    ]
    avi = mjpeg_avi(frames, 16, 16)
    assets = spark.createDataFrame(
        [(1, "video", bytearray(avi), {"src": "cam0"}),
         (2, "video", bytearray(b"NOTRIFFxxxxxxxxxxxxxxxxx"), {})],
        multimodal.ASSET_SCHEMA,
    )
    out = {
        (r["asset_id"], r["frame_idx"]): bytes(r["frame"])
        for r in multimodal.sample_frames(assets, n_frames=n_pick).collect()
    }
    assert len(out) == 2 * n_pick
    for i in range(n_pick):
        picked = out[(1, i)]
        expect_idx = i * n_src // n_pick
        assert picked == frames[expect_idx]  # the real container frame
        d = jpeg_decode(picked)
        assert (d["width"], d["height"], d["channels"]) == (16, 16, 1)
        ref = np.frombuffer(_frame_pixels(expect_idx), np.uint8).astype(int)
        got = np.frombuffer(d["pixels"], np.uint8).astype(int)
        assert np.abs(ref - got).max() <= 8
    # non-RIFF payload: deterministic span fallback, never empty
    assert all(len(out[(2, i)]) > 0 for i in range(n_pick))


def test_sample_frames_meta_passthrough_on_real_path(spark):
    frames = [jpeg_encode(_frame_pixels(0), 16, 16, 1)]
    avi = mjpeg_avi(frames, 16, 16)
    assets = spark.createDataFrame(
        [(7, "video", bytearray(avi), {"cam": "a"})],
        multimodal.ASSET_SCHEMA,
    )
    rows = multimodal.sample_frames(assets, n_frames=2).collect()
    assert all(dict(r["meta"]) == {"cam": "a"} for r in rows)
