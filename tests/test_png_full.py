"""Full static-PNG coverage for the stdlib decoder (round 10): palette
(+tRNS alpha), sub-byte gray depths, 16-bit, and Adam7 interlace.  The
parametric writer below is test-side only (filter 0 everywhere — the
filter types themselves are pinned by test_png_filters_roundtrip)."""

from __future__ import annotations

import struct
import sys
import zlib
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators import multimodal  # noqa: E402


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def _pack_rows(img: np.ndarray, depth: int) -> bytes:
    """[h, w, ch] sample array → filter-0 scanlines at the given depth
    (MSB-first sub-byte packing, big-endian 16-bit with low byte 0)."""
    h, w, ch = img.shape
    out = bytearray()
    for y in range(h):
        out.append(0)  # filter type 0
        vals = img[y].reshape(-1)
        if depth == 8:
            out += bytes(int(v) for v in vals)
        elif depth == 16:
            for v in vals:
                out += bytes([int(v), 0])
        else:
            acc, nbits = 0, 0
            for v in vals:
                acc = (acc << depth) | int(v)
                nbits += depth
                while nbits >= 8:
                    out.append((acc >> (nbits - 8)) & 0xFF)
                    nbits -= 8
            if nbits:
                out.append((acc << (8 - nbits)) & 0xFF)
                acc, nbits = 0, 0
    return bytes(out)


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def png_write(
    img: np.ndarray,
    depth: int,
    ctype: int,
    plte: bytes | None = None,
    trns: bytes | None = None,
    interlace: int = 0,
) -> bytes:
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[..., None]
    if interlace == 0:
        raw = _pack_rows(img, depth)
    else:
        raw = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size:
                raw += _pack_rows(sub, depth)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def test_palette_png_decodes_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])  # 4 colors
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 0]], np.uint8)
    d = multimodal._png_decode(png_write(idx, 8, 3, plte=plte))
    assert (d["width"], d["height"], d["channels"]) == (4, 3, 3)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(3, 4, 3)
    pal = np.frombuffer(plte, np.uint8).reshape(4, 3)
    assert (got == pal[idx]).all()


def test_palette_trns_yields_rgba():
    plte = bytes([10, 20, 30, 40, 50, 60])
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    d = multimodal._png_decode(
        png_write(idx, 8, 3, plte=plte, trns=bytes([128]))
    )
    assert d["channels"] == 4
    got = np.frombuffer(d["pixels"], np.uint8).reshape(2, 2, 4)
    assert (got[idx == 0][:, 3] == 128).all()  # tRNS-covered index
    assert (got[idx == 1][:, 3] == 255).all()  # default opaque


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_scales_to_full_range(depth):
    hi = (1 << depth) - 1
    idx = np.arange(3 * 7, dtype=np.uint8).reshape(3, 7) % (hi + 1)
    d = multimodal._png_decode(png_write(idx, depth, 0))
    got = np.frombuffer(d["pixels"], np.uint8).reshape(3, 7)
    assert (got == (idx.astype(np.uint16) * 255 // hi)).all()
    assert got.max() == 255 or hi > idx.max()


def test_palette_subbyte_depth():
    plte = bytes([1, 2, 3, 9, 8, 7, 100, 101, 102, 200, 201, 202])
    idx = np.array([[0, 3, 2, 1, 0], [2, 2, 1, 3, 0]], np.uint8)
    d = multimodal._png_decode(png_write(idx, 2, 3, plte=plte))
    got = np.frombuffer(d["pixels"], np.uint8).reshape(2, 5, 3)
    pal = np.frombuffer(plte, np.uint8).reshape(4, 3)
    assert (got == pal[idx]).all()


def test_16bit_rgb_downsamples_high_byte():
    img = np.array(
        [[[10, 20, 30], [200, 100, 50]], [[0, 255, 7], [9, 9, 9]]], np.uint8
    )
    d = multimodal._png_decode(png_write(img, 16, 2))
    got = np.frombuffer(d["pixels"], np.uint8).reshape(2, 2, 3)
    assert (got == img).all()  # writer put value in the HIGH byte


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (6, 4)])
def test_adam7_matches_sequential(ctype, ch):
    """The interlaced decode must reproduce the sequential decode of
    the same image EXACTLY — including non-multiple-of-8 dims where
    late passes are ragged and pass 2 can be empty."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(11, 13, ch), dtype=np.uint8)
    if ch == 1:
        img2 = img[:, :, 0]
    else:
        img2 = img
    seq = multimodal._png_decode(png_write(img2, 8, ctype))
    lac = multimodal._png_decode(png_write(img2, 8, ctype, interlace=1))
    assert seq["pixels"] == lac["pixels"]
    assert (lac["width"], lac["height"], lac["channels"]) == (13, 11, ch)


def test_adam7_tiny_image_skips_empty_passes():
    img = np.array([[5]], np.uint8)  # 1×1: only pass 1 has pixels
    d = multimodal._png_decode(png_write(img, 8, 0, interlace=1))
    assert d["pixels"] == bytes([5])


def test_palette_index_out_of_range_raises():
    plte = bytes([1, 2, 3])  # 1 color
    idx = np.array([[0, 1]], np.uint8)  # index 1 out of range
    with pytest.raises(ValueError, match="palette index"):
        multimodal._png_decode(png_write(idx, 8, 3, plte=plte))


def test_gray_trns_yields_alpha():
    img = np.array([[7, 42], [42, 9]], np.uint8)
    d = multimodal._png_decode(
        png_write(img, 8, 0, trns=struct.pack(">H", 42))
    )
    assert d["channels"] == 2
    got = np.frombuffer(d["pixels"], np.uint8).reshape(2, 2, 2)
    assert (got[img == 42][:, 1] == 0).all()
    assert (got[img != 42][:, 1] == 255).all()
    assert (got[:, :, 0] == img).all()


def test_truecolor_trns_yields_rgba():
    img = np.array([[[1, 2, 3], [9, 9, 9]], [[1, 2, 3], [1, 2, 4]]], np.uint8)
    d = multimodal._png_decode(
        png_write(img, 8, 2, trns=struct.pack(">HHH", 1, 2, 3))
    )
    assert d["channels"] == 4
    got = np.frombuffer(d["pixels"], np.uint8).reshape(2, 2, 4)
    transparent = (img == [1, 2, 3]).all(axis=-1)
    assert (got[transparent][:, 3] == 0).all()
    assert (got[~transparent][:, 3] == 255).all()


def test_16bit_trns_matches_full_precision_not_high_byte():
    """The tRNS key must match the EXACT 16-bit sample: a pixel sharing
    only the high byte stays opaque.  The writer puts values in the
    high byte with low byte 0, so key (42 << 8) matches value 42 while
    key (42 << 8) + 1 matches nothing."""
    img = np.array([[42, 17]], np.uint8)
    exact = multimodal._png_decode(
        png_write(img, 16, 0, trns=struct.pack(">H", 42 << 8))
    )
    got = np.frombuffer(exact["pixels"], np.uint8).reshape(1, 2, 2)
    assert got[0, 0, 1] == 0 and got[0, 1, 1] == 255
    near = multimodal._png_decode(
        png_write(img, 16, 0, trns=struct.pack(">H", (42 << 8) + 1))
    )
    got2 = np.frombuffer(near["pixels"], np.uint8).reshape(1, 2, 2)
    assert (got2[:, :, 1] == 255).all()  # high-byte collision stays opaque


# --- property test: lossless round-trip over the static format space ---------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ctype=st.sampled_from([0, 2, 3, 4, 6]),
    depth_sel=st.integers(0, 3),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, ctype, depth_sel, interlace, seed):
    """PNG is lossless: any geometry, color type, legal sub-16 depth,
    and interlace mode round-trips exactly (sub-byte gray compares on
    the defined 255/(2^d−1) scaling; palette on the mapped colors)."""
    rng = np.random.RandomState(seed)
    depths = [1, 2, 4, 8] if ctype in (0, 3) else [8]
    depth = depths[depth_sel % len(depths)]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    hi = (1 << depth) - 1
    img = rng.randint(0, hi + 1, (h, w, ch)).astype(np.uint8)
    plte = None
    if ctype == 3:
        plte = bytes(rng.randint(0, 256, 3 * (hi + 1)).astype(np.uint8))
    d = multimodal._png_decode(
        png_write(
            img if ch > 1 else img[:, :, 0], depth, ctype, plte=plte,
            interlace=1 if interlace else 0,
        )
    )
    out_ch = 3 if ctype == 3 else ch
    assert (d["width"], d["height"], d["channels"]) == (w, h, out_ch)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, out_ch)
    if ctype == 3:
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        assert (got == pal[img[:, :, 0]]).all()
    elif depth < 8:
        assert (got[:, :, 0] == img[:, :, 0].astype(np.uint16) * 255 // hi).all()
    else:
        assert (got == img).all()
