"""Round-trip tests for the stdlib/numpy baseline-JPEG decoder
(`operators/jpeg.py`) against the test-side reference encoder
(`tests/jpeg_ref.py`, T.81 annex K tables).  No Spark session and no
external codec: the encoder exists precisely so the decoder is
exercisable in this codec-less container."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from proyecto_gasto_publico_etl_per__spark.operators import multimodal  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.operators.jpeg import (  # noqa: E402
    jpeg_decode,
)
from jpeg_ref import jpeg_encode  # noqa: E402


def _gradient(h: int, w: int, ch: int) -> bytes:
    """Smooth 2-D gradient — the friendly case for DCT quantization, so
    round-trip error stays near the per-coefficient bound."""
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 5 + y * 3) % 200 + 20
    if ch == 1:
        return base.astype(np.uint8).tobytes()
    img = np.stack(
        [base, np.flipud(base), np.fliplr(base)][:ch], axis=-1
    )
    return img.astype(np.uint8).tobytes()


def _maxerr(a: bytes, b: bytes) -> int:
    x = np.frombuffer(a, np.uint8).astype(np.int64)
    y = np.frombuffer(b, np.uint8).astype(np.int64)
    return int(np.abs(x - y).max())


def test_grayscale_roundtrip():
    px = _gradient(24, 32, 1)
    d = jpeg_decode(jpeg_encode(px, 32, 24, 1, quality=95))
    assert (d["width"], d["height"], d["channels"]) == (32, 24, 1)
    assert len(d["pixels"]) == 24 * 32
    assert _maxerr(px, d["pixels"]) <= 8


def test_flat_grayscale_is_near_exact():
    """A flat block is DC-only: the entire round-trip error is one DC
    quantization rounding — ≤ 1 gray level at quality 90."""
    px = bytes([200] * (16 * 16))
    d = jpeg_decode(jpeg_encode(px, 16, 16, 1, quality=90))
    assert _maxerr(px, d["pixels"]) <= 1


def test_rgb_444_roundtrip():
    px = _gradient(16, 24, 3)
    d = jpeg_decode(jpeg_encode(px, 24, 16, 3, quality=95))
    assert (d["width"], d["height"], d["channels"]) == (24, 16, 3)
    assert len(d["pixels"]) == 16 * 24 * 3
    # color transform + quantization: a few levels on a smooth ramp
    assert _maxerr(px, d["pixels"]) <= 12


def test_rgb_420_odd_dimensions():
    """4:2:0 with non-multiple-of-16 dims exercises MCU padding, the
    2×2 chroma upsample, and the final crop."""
    px = _gradient(13, 21, 3)
    d = jpeg_decode(
        jpeg_encode(px, 21, 13, 3, quality=95, subsample_420=True)
    )
    assert (d["width"], d["height"], d["channels"]) == (21, 13, 3)
    assert len(d["pixels"]) == 13 * 21 * 3
    # chroma is box-averaged 2×2 then replicated: looser bound, but the
    # luma-dominated budget keeps a smooth ramp close
    assert _maxerr(px, d["pixels"]) <= 24


def test_restart_intervals_do_not_change_pixels():
    """DRI only re-segments the entropy stream (predictor resets +
    bitstream realignment) — decoded pixels must be byte-identical to
    the unsegmented encoding of the same quantized coefficients."""
    px = _gradient(32, 48, 3)
    plain = jpeg_decode(jpeg_encode(px, 48, 32, 3, quality=85))
    rst = jpeg_decode(
        jpeg_encode(px, 48, 32, 3, quality=85, restart_interval=2)
    )
    assert plain["pixels"] == rst["pixels"]


def test_progressive_raises_not_implemented():
    # SOI + minimal SOF2 header: the explicit unsupported-format guard
    payload = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + (11 + 3).to_bytes(2, "big")
        + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="SOF"):
        jpeg_decode(payload)


def test_truncated_jpeg_raises_value_error():
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xe0junk")
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg at all")


def test_decode_image_dispatches_jpeg():
    """multimodal.decode_image routes JPEG magic to the stdlib decoder
    (when Pillow is absent) with the same output contract as PNG."""
    px = _gradient(8, 8, 3)
    d = multimodal.decode_image(jpeg_encode(px, 8, 8, 3, quality=95))
    assert (d["width"], d["height"], d["channels"]) == (8, 8, 3)
    assert _maxerr(px, d["pixels"]) <= 12


def test_resize_image_real_on_jpeg_payload():
    """The stdlib resize path decodes JPEG, nearest-neighbor resamples,
    and re-encodes PNG — decode the output and check geometry."""
    px = _gradient(16, 16, 3)
    out = multimodal.resize_image_real(
        jpeg_encode(px, 16, 16, 3, quality=95), 4, 4
    )
    d = multimodal.decode_image(out)
    assert (d["width"], d["height"], d["channels"]) == (4, 4, 3)
