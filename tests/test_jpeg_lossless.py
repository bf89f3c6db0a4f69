"""Lossless JPEG (SOF3) decode tests: a test-side Annex-H DPCM encoder
(the jpeg_ref pattern — tables in-stream, so encoder and decoder are
independently checkable against the spec's bit layout) and EXACT
roundtrip assertions: lossless means byte equality, no tolerance."""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators.jpeg import (  # noqa: E402
    jpeg_decode,
)


# --- test-side SOF3 encoder ---------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s per T.81


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


#: one DHT with 17 five-bit codes: symbol s (SSSS category 0..16) gets
#: canonical code s — valid (code 31, all-ones, unused) and trivially
#: cross-checkable by hand
_DHT_COUNTS = bytes([0, 0, 0, 0, 17] + [0] * 11)
_DHT_SYMBOLS = bytes(range(17))


def _category(diff: int) -> tuple[int, int]:
    """(SSSS, appended bits) for a signed difference, T.81 H.1.2.2 /
    F.1.2.1.2: negatives append ``diff + (1<<s) - 1``."""
    if diff == 0:
        return 0, 0
    if diff == 32768:
        return 16, 0
    mag = abs(diff)
    s = mag.bit_length()
    return s, (diff if diff > 0 else diff + (1 << s) - 1)


def jpeg_lossless_encode(
    pixels: bytes,
    w: int,
    h: int,
    channels: int,
    predictor: int = 1,
    pt: int = 0,
    restart_rows: int = 0,
) -> bytes:
    """Minimal-but-conformant SOF3 writer: one DC-format Huffman table
    shared by all components, samples interleaved one-per-component per
    MCU, optional point transform and row-aligned restart markers."""
    arr = (
        np.frombuffer(pixels, np.uint8)
        .reshape(h, w, channels)
        .astype(np.int64)
    )
    if pt:
        arr = arr >> pt
    default = 1 << (8 - 1 - pt)
    planes = [arr[:, :, c] for c in range(channels)]
    recon = [np.zeros((h, w), np.int64) for _ in range(channels)]

    out = bytearray(b"\xff\xd8")  # SOI
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([channels])
    for c in range(channels):
        sof += bytes([c + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    out += _seg(0xC4, bytes([0x00]) + _DHT_COUNTS + _DHT_SYMBOLS)
    if restart_rows:
        out += _seg(0xDD, struct.pack(">H", restart_rows * w))
    sos = bytes([channels])
    for c in range(channels):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    rst = 0
    rows_per = restart_rows or h
    for y in range(h):
        if y and y % rows_per == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
        fresh = y % rows_per == 0
        for x in range(w):
            for c in range(channels):
                plane, rec = planes[c], recon[c]
                if fresh:
                    px = default if x == 0 else int(rec[y, x - 1])
                elif x == 0:
                    px = int(rec[y - 1, 0])
                else:
                    ra, rb, rc = (
                        int(rec[y, x - 1]),
                        int(rec[y - 1, x]),
                        int(rec[y - 1, x - 1]),
                    )
                    px = {
                        1: ra,
                        2: rb,
                        3: rc,
                        4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                diff = (int(plane[y, x]) - px) % 65536
                if diff >= 32768 and diff != 32768:
                    diff -= 65536  # shortest signed representation
                s, bits_ = _category(diff)
                bw.write(s, 5)  # canonical 5-bit code == symbol
                if s and s != 16:
                    bw.write(bits_, s)
                rec[y, x] = (px + diff) & 0xFFFF
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _noise(w: int, h: int, channels: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, channels), dtype=np.uint8).tobytes()


# --- tests --------------------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_roundtrip_every_predictor_gray(predictor):
    src = _noise(13, 9, 1, seed=predictor)
    d = jpeg_decode(jpeg_lossless_encode(src, 13, 9, 1, predictor))
    assert (d["width"], d["height"], d["channels"]) == (13, 9, 1)
    assert d["pixels"] == src  # EXACT — lossless


def test_lossless_roundtrip_rgb_no_color_transform():
    src = _noise(8, 6, 3, seed=42)
    d = jpeg_decode(jpeg_lossless_encode(src, 8, 6, 3, predictor=4))
    assert d["channels"] == 3
    assert d["pixels"] == src  # components pass through untransformed


def test_lossless_gradient_and_flat_images():
    y, x = np.mgrid[0:10, 0:17]
    grad = ((x * 15 + y * 3) % 256).astype(np.uint8).tobytes()
    for predictor in (1, 2, 7):
        assert jpeg_decode(
            jpeg_lossless_encode(grad, 17, 10, 1, predictor)
        )["pixels"] == grad
    flat = bytes([200]) * (17 * 10)
    assert jpeg_decode(jpeg_lossless_encode(flat, 17, 10, 1, 5))[
        "pixels"
    ] == flat


def test_lossless_point_transform_rescales():
    src = _noise(7, 5, 1, seed=3)
    d = jpeg_decode(jpeg_lossless_encode(src, 7, 5, 1, predictor=1, pt=1))
    expect = ((np.frombuffer(src, np.uint8).astype(np.int64) >> 1) << 1)
    assert d["pixels"] == expect.astype(np.uint8).tobytes()


def test_lossless_restart_rows_reenter_scan_start_state():
    src = _noise(11, 9, 1, seed=7)
    d = jpeg_decode(
        jpeg_lossless_encode(src, 11, 9, 1, predictor=6, restart_rows=2)
    )
    assert d["pixels"] == src


def test_lossless_restart_splitting_a_line_is_guarded():
    src = _noise(8, 4, 1, seed=1)
    payload = bytearray(jpeg_lossless_encode(src, 8, 4, 1))
    dri = payload.index(b"\xff\xdd") if b"\xff\xdd" in payload else None
    assert dri is None  # encoder omitted DRI; splice one that splits a line
    sos_at = payload.index(b"\xff\xda")
    payload[sos_at:sos_at] = bytes([0xFF, 0xDD, 0x00, 0x04]) + struct.pack(
        ">H", 3
    )
    with pytest.raises(NotImplementedError, match="splits a line"):
        jpeg_decode(bytes(payload))


def test_lossless_truncated_stream_raises():
    src = _noise(16, 16, 1, seed=9)
    good = jpeg_lossless_encode(src, 16, 16, 1, restart_rows=4)
    # cut inside the entropy data, before the second restart marker
    cut = good[: good.index(b"\xff\xd0") + 2]
    with pytest.raises(ValueError):
        jpeg_decode(cut)


def test_lossless_sweep_random_shapes_and_predictors():
    rng = np.random.default_rng(123)
    for trial in range(20):
        w = int(rng.integers(1, 24))
        h = int(rng.integers(1, 20))
        ch = int(rng.choice([1, 3]))
        predictor = int(rng.integers(1, 8))
        restart = int(rng.choice([0, 1, 2, 5]))
        if restart >= h:
            restart = 0
        src = _noise(w, h, ch, seed=1000 + trial)
        got = jpeg_decode(
            jpeg_lossless_encode(
                src, w, h, ch, predictor, restart_rows=restart
            )
        )["pixels"]
        assert got == src, (w, h, ch, predictor, restart)
