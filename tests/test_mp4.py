"""ISO BMFF (MP4/MOV) demuxing (`operators/mp4.py`, round 11): moov
box-tree walk → stsc×stco×stsz sample location → MJPEG frame payloads,
each a standalone JPEG the stdlib decoder decodes for real.  The
minimal MP4 writer below is test-side only (the AVI-writer pattern):
it builds real sample tables — multi-run stsc, co64, multi-track —
with no video codec in the container."""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    mp4,
    multimodal,
)
from proyecto_gasto_publico_etl_per__spark.operators.jpeg import (  # noqa: E402
    jpeg_decode,
)
from jpeg_ref import jpeg_encode  # noqa: E402


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", version << 24) + payload)


def _hdlr(handler: bytes) -> bytes:
    return _full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 + b"t\x00")


def _trak(
    frames: list[bytes],
    chunking: list[int],
    data_start: int,
    codec: bytes,
    handler: bytes = b"vide",
    co64: bool = False,
) -> bytes:
    """A track whose stbl places `frames` split into chunks of
    `chunking` samples, contiguous from `data_start`."""
    assert sum(chunking) == len(frames)
    entry = _box(
        codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    # chunk offsets: chunks are laid out back-to-back from data_start
    offsets, sizes_iter, pos = [], iter(frames), data_start
    for n in chunking:
        offsets.append(pos)
        for _ in range(n):
            pos += len(next(sizes_iter))
    if co64:
        stco = _full(
            b"co64",
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">Q", o) for o in offsets),
        )
    else:
        stco = _full(
            b"stco",
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
    # stsc runs: collapse consecutive equal samples-per-chunk
    runs: list[tuple[int, int]] = []
    for i, n in enumerate(chunking, start=1):
        if not runs or runs[-1][1] != n:
            runs.append((i, n))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", f, n, 1) for f, n in runs),
    )
    stbl = _box(b"stbl", stsd + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _hdlr(handler) + minf)
    return _box(b"trak", mdia)


def mjpeg_mp4(
    frames: list[bytes],
    chunking: list[int] | None = None,
    codec: bytes = b"jpeg",
    co64: bool = False,
    lead_track: bytes | None = None,
) -> bytes:
    """Minimal ISO BMFF wrapper: ftyp + mdat(frames) + moov with one
    video track (optionally preceded by a non-video track)."""
    chunking = chunking or [len(frames)]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomiso2")
    data_start = len(ftyp) + 8  # mdat header is 8 bytes
    mdat = _box(b"mdat", b"".join(frames))
    traks = b""
    if lead_track is not None:
        traks += lead_track
    traks += _trak(frames, chunking, data_start, codec, co64=co64)
    moov = _box(b"moov", traks)
    return ftyp + mdat + moov


def _frame_pixels(shift: int, w: int = 16, h: int = 16) -> bytes:
    y, x = np.mgrid[0:h, 0:w]
    return (((x + shift * 7) * 9 + y * 3) % 200 + 20).astype(np.uint8).tobytes()


def _frames(n: int) -> list[bytes]:
    return [
        jpeg_encode(_frame_pixels(i), 16, 16, 1, quality=95) for i in range(n)
    ]


def test_mp4_walk_extracts_all_frames_multi_chunk():
    frames = _frames(5)
    payload = mjpeg_mp4(frames, chunking=[2, 2, 1])
    assert mp4.mp4_mjpeg_frames(payload) == frames  # byte-exact, in order


def test_mp4_co64_and_single_chunk():
    frames = _frames(3)
    assert mp4.mp4_mjpeg_frames(mjpeg_mp4(frames, co64=True)) == frames
    assert mp4.mp4_mjpeg_frames(mjpeg_mp4(frames, chunking=[3])) == frames


def test_mp4_skips_non_video_lead_track():
    frames = _frames(2)
    # a sound track before the video track must be walked past
    lead = _trak(
        [b"\x01\x02"], [1], 0, b"mp4a", handler=b"soun"
    )
    payload = mjpeg_mp4(frames, lead_track=lead)
    assert mp4.mp4_mjpeg_frames(payload) == frames


def test_mp4_intercoded_codec_raises_loud_guard():
    frames = _frames(2)
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4.mp4_mjpeg_frames(mjpeg_mp4(frames, codec=b"avc1"))


def test_mp4_malformed_containers_raise_valueerror():
    frames = _frames(2)
    good = mjpeg_mp4(frames)
    with pytest.raises(ValueError, match="no moov"):
        mp4.mp4_mjpeg_frames(good[: good.index(b"moov") - 4])
    with pytest.raises(ValueError, match="no video track"):
        mp4.mp4_mjpeg_frames(_box(b"ftyp", b"isom") + _box(b"moov", b""))
    # a box whose size overruns its container
    bad = bytearray(good)
    moov_at = good.index(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, len(good) * 2)
    with pytest.raises(ValueError, match="overruns"):
        mp4.mp4_mjpeg_frames(bytes(bad))
    # sample offset past the payload end
    truncated = good[: len(good) // 2]  # mdat cut, moov gone → no moov
    with pytest.raises(ValueError):
        mp4.mp4_mjpeg_frames(truncated)


def test_mp4_frames_decode_to_source_pixels():
    frames = _frames(3)
    got = mp4.mp4_mjpeg_frames(mjpeg_mp4(frames, chunking=[1, 2]))
    for i, f in enumerate(got):
        d = jpeg_decode(f)
        assert (d["width"], d["height"], d["channels"]) == (16, 16, 1)
        src = np.frombuffer(_frame_pixels(i), np.uint8).astype(np.int16)
        dec = np.frombuffer(d["pixels"], np.uint8).astype(np.int16)
        assert np.abs(src - dec).max() <= 24  # q95 JPEG tolerance


def test_sample_frames_real_mp4_yields_decodable_jpegs(spark):
    """End-to-end through the Spark operator: MP4 payload in an asset
    row → sample_frames demuxes REAL frames via the sample tables; an
    inter-coded MP4 alongside quarantines to the span-slicing fallback
    (never aborts the batch)."""
    frames = _frames(6)
    good = mjpeg_mp4(frames, chunking=[3, 3])
    h264ish = mjpeg_mp4(frames[:2], codec=b"avc1")
    assets = spark.createDataFrame(
        [
            (1, "video", bytearray(good), {}),
            (2, "video", bytearray(h264ish), {}),
        ],
        multimodal.ASSET_SCHEMA,
    )
    out = multimodal.sample_frames(assets, n_frames=3)
    rows = {
        (r["asset_id"], r["frame_idx"]): bytes(r["frame"])
        for r in out.collect()
    }
    # real path: evenly spaced picks from the 6 real frames
    for i in range(3):
        assert rows[(1, i)] == frames[i * 2]
        d = jpeg_decode(rows[(1, i)])
        assert (d["width"], d["height"]) == (16, 16)
    # guarded codec: deterministic span slices of the raw payload
    span = max(1, len(h264ish) // 3)
    for i in range(3):
        assert rows[(2, i)] == h264ish[i * span : (i + 1) * span]


def test_mp4_zero_first_chunk_is_corrupt_not_wraparound():
    """stsc first_chunk is 1-based; 0 must raise (Python negative
    indexing would silently read the LAST chunk's offset)."""
    frames = _frames(2)
    good = mjpeg_mp4(frames, chunking=[2])
    at = good.index(b"stsc") + 4 + 4 + 4  # type + fullbox + entry_count
    bad = bytearray(good)
    struct.pack_into(">I", bad, at, 0)  # first_chunk = 0
    with pytest.raises(ValueError, match="stsc"):
        mp4.mp4_mjpeg_frames(bytes(bad))
