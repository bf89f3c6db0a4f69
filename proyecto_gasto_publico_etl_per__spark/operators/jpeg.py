"""Baseline JPEG decode in numpy + stdlib — no Pillow required.

Covers ITU-T T.81 baseline sequential DCT (SOF0, plus SOF1
extended-sequential with 8-bit precision): marker walk, Huffman entropy
decode with restart intervals, dequantize, batch 8×8 IDCT (numpy
einsum), integer-ratio chroma upsampling, JFIF YCbCr→RGB.  Progressive
(SOF2), arithmetic coding, hierarchical, 12-bit, and CMYK payloads
raise ``NotImplementedError`` with a pointer to Pillow — same contract
as the stdlib PNG path in ``multimodal._png_decode``.

Like the PNG path, this runs per-row inside an Arrow batch on the
executor: the per-block Huffman loop is pure Python (bounded by batch
sizing and thumbnail-scale payloads), while the O(pixels) math — IDCT,
upsampling, color transform — is vectorized numpy.

Reference surface parity: the reference engine has no multimodal
operators at all; this extends the training-data-pipeline lane
(SURVEY.md §2 extension rows), where real corpora are mostly JPEG.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

#: zigzag scan order: ZIGZAG[k] = natural (row-major) index of the k-th
#: zigzag-ordered coefficient (T.81 figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis ``C[u, x]``; IDCT of block F is
    ``C.T @ F @ C`` (the separable T.81 annex A transform)."""
    x = np.arange(8, dtype=np.float64)
    c = 0.5 * np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0)
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman decode table: (code_length, code) → symbol
    (T.81 annex C code assignment)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _Bits:
    """MSB-first bit reader over a destuffed entropy-coded segment.
    Reads past the end return 0 — the final EOB's padding bits."""

    __slots__ = ("d", "i", "b")

    def __init__(self, d: bytes) -> None:
        self.d = d
        self.i = 0
        self.b = 0

    def read_bit(self) -> int:
        if self.i >= len(self.d):
            return 0
        bit = (self.d[self.i] >> (7 - self.b)) & 1
        self.b += 1
        if self.b == 8:
            self.b = 0
            self.i += 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def extend(self, s: int) -> int:
        """T.81 F.2.2.1 sign extension: an s-bit magnitude whose top bit
        is 0 encodes a negative value."""
        v = self.receive(s)
        return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _destuff_split(data: bytes) -> list[bytes]:
    """Remove 0xFF00 byte stuffing and split on RSTn markers: each
    returned part is one restart interval's bitstream."""
    parts: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                parts.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # next true marker — end of scan
        cur.append(b)
        i += 1
    parts.append(bytes(cur))
    return parts


def _decode_block(
    bits: _Bits, dc_table: dict, ac_table: dict
) -> np.ndarray:
    """One 8×8 block's quantized coefficients in ZIGZAG order (DC diff
    NOT yet accumulated — caller owns the predictor)."""
    coef = np.zeros(64, dtype=np.int64)
    s = _huff_decode(bits, dc_table)
    coef[0] = bits.extend(s) if s else 0
    k = 1
    while k < 64:
        rs = _huff_decode(bits, ac_table)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        coef[k] = bits.extend(size)
        k += 1
    return coef


def jpeg_decode(payload: bytes) -> dict[str, Any]:
    """Decode a baseline JPEG to ``{width, height, channels, pixels}``
    (row-major interleaved 8-bit bytes — same contract as
    ``multimodal._png_decode``).  Grayscale (1 component) and JFIF
    YCbCr (3 components, any integer-ratio subsampling incl. 4:2:0 and
    4:2:2) are supported."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → table
    frame = None
    restart_interval = 0
    planes_done = None
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RST: no body
            continue
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    qt[tq] = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 sequential
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG needs Pillow (stdlib path is 8-bit)"
                )
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (progressive/arithmetic/"
                "hierarchical) needs Pillow; stdlib path covers baseline "
                "sequential (SOF0/SOF1)"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = seg[i + 1 : i + 17]
                nsym = sum(counts)
                symbols = seg[i + 17 : i + 17 + nsym]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — baseline: one interleaved scan
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG needs Pillow"
                )
            scan_tabs = {}
            for c in range(ns):
                cs, tda = seg[1 + 2 * c : 3 + 2 * c]
                scan_tabs[cs] = (tda >> 4, tda & 0x0F)
            planes_done = _decode_scan(
                payload, pos, frame, scan_tabs, qt, huff, restart_interval
            )
            break  # baseline: nothing after the single scan but EOI
    if frame is None or planes_done is None:
        raise ValueError("JPEG missing SOF/SOS")
    return _to_pixels(frame, planes_done)


def _decode_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    scan_tabs: dict,
    qt: dict,
    huff: dict,
    restart_interval: int,
) -> dict[int, np.ndarray]:
    """Entropy-decode the scan into per-component planes at their
    subsampled resolution (float64, level-shifted to [0, 255]).

    A SINGLE-component scan is NON-interleaved per T.81 §A.2.2: the MCU
    is one data unit and blocks run in raster order over the
    component's own grid, with its SOF sampling factors ignored — a
    grayscale JPEG that kept 2×2 factors from a color source would
    otherwise be consumed in 2×2-MCU order and silently scramble."""
    comps = frame["comps"]
    if len(comps) == 1:
        comps = [dict(comps[0], h=1, v=1)]
        frame = dict(frame, comps=comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    parts = _destuff_split(payload[pos:])

    # per component: collected zigzag coefficient blocks, MCU-ordered
    blocks: dict[int, list[np.ndarray]] = {c["id"]: [] for c in comps}
    dc_pred = {c["id"]: 0 for c in comps}
    part_idx = 0
    bits = _Bits(parts[0])
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            part_idx += 1
            if part_idx >= len(parts):
                raise ValueError("JPEG truncated: missing restart interval")
            bits = _Bits(parts[part_idx])
            dc_pred = {c["id"]: 0 for c in comps}
        for c in comps:
            td, ta = scan_tabs[c["id"]]
            for _ in range(c["h"] * c["v"]):
                zz = _decode_block(bits, huff[(0, td)], huff[(1, ta)])
                dc_pred[c["id"]] += int(zz[0])
                zz[0] = dc_pred[c["id"]]
                blocks[c["id"]].append(zz)

    planes: dict[int, np.ndarray] = {}
    for c in comps:
        q = qt[c["tq"]]
        zz = np.stack(blocks[c["id"]])  # [nblocks, 64] zigzag order
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz * q[None, :]  # dequantize + un-zigzag
        f = nat.reshape(-1, 8, 8).astype(np.float64)
        # batch IDCT: pix[n,x,y] = Σ_u Σ_v C[u,x]·F[n,u,v]·C[v,y]
        pix = np.einsum("ux,nuv,vy->nxy", _C, f, _C) + 128.0
        # reassemble MCU-ordered blocks into the component plane
        bw, bh = mcux * c["h"], mcuy * c["v"]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = pix[i]
                        i += 1
        # integer-ratio upsample to the full-resolution grid
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry * c["v"] != vmax or rx * c["h"] != hmax:
            raise NotImplementedError(
                "non-integer JPEG chroma subsampling ratio needs Pillow"
            )
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[c["id"]] = plane[: frame["h"], : frame["w"]]
    return planes


def _to_pixels(frame: dict, planes: dict[int, np.ndarray]) -> dict[str, Any]:
    comps = frame["comps"]
    if len(comps) == 1:
        gray = np.clip(np.round(planes[comps[0]["id"]]), 0, 255)
        return {
            "width": frame["w"],
            "height": frame["h"],
            "channels": 1,
            "pixels": gray.astype(np.uint8).tobytes(),
        }
    if len(comps) == 3:
        y = planes[comps[0]["id"]]
        cb = planes[comps[1]["id"]] - 128.0
        cr = planes[comps[2]["id"]] - 128.0
        # JFIF / ITU-R BT.601 full-range inverse transform
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return {
            "width": frame["w"],
            "height": frame["h"],
            "channels": 3,
            "pixels": out.tobytes(),
        }
    raise NotImplementedError(
        f"{len(comps)}-component JPEG (CMYK/unknown) needs Pillow"
    )
