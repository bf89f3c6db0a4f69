"""Reference baseline-JPEG ENCODER for round-trip tests (T.81 annex K
standard quantization + Huffman tables).  Test-only: the package side
is the decoder (`operators/jpeg.py`); this encoder exists so the
decoder can be exercised in a container with no JPEG codec at all.
Supports 8-bit grayscale and RGB with 4:4:4 or 4:2:0 chroma
subsampling, optional restart intervals.
"""

from __future__ import annotations

import struct

import numpy as np

from proyecto_gasto_publico_etl_per__spark.operators.jpeg import ZIGZAG, _C

# T.81 annex K.1 — luminance / chrominance quantization (zigzag order
# is NOT how K.1 prints them; these are natural row-major order)
QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 annex K.3 — standard Huffman table specs: (BITS counts, HUFFVAL)
DC_L = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
DC_C = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
AC_L = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes(
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
            0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
            0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
            0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
            0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
            0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
            0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
            0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
            0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
            0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
            0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
            0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
            0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
            0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ]
    ),
)
AC_C = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes(
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
            0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
            0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
            0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
            0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
            0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
            0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
            0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
            0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
            0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
            0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
            0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
            0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ]
    ),
)


def _encode_table(counts: bytes, symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment (annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magnitude_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _quality_scale(q_base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public IJG formula)."""
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q_base * scale + 50) // 100, 1, 255).astype(np.int64)


def _block_split(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Pad (edge-replicate) to bh×bw blocks and return [n, 8, 8] in
    row-major block order."""
    h, w = plane.shape
    padded = np.pad(
        plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _fdct_quant(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize → [n, 64] zigzag-ordered int coefficients.
    Forward transform is C @ B @ C.T with the decoder's orthonormal
    basis; indexing the natural-order vector by ZIGZAG emits zigzag
    scan order (ZIGZAG[k] = natural index of the k-th zigzag coef)."""
    f = np.einsum("ux,nxy,vy->nuv", _C, blocks - 128.0, _C)
    qd = np.round(f / q.reshape(8, 8)[None]).astype(np.int64)
    return qd.reshape(-1, 64)[:, ZIGZAG]


def jpeg_encode(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 90,
    subsample_420: bool = False,
    restart_interval: int = 0,
    gray_hv: tuple[int, int] = (1, 1),
) -> bytes:
    """Minimal baseline JPEG encoder (annex K tables, quality-scaled).

    ``gray_hv`` declares SOF sampling factors for the grayscale case
    WITHOUT changing the scan layout — per T.81 §A.2.2 a
    single-component scan is non-interleaved (raster-order data units)
    regardless of factors, so e.g. (2, 2) produces the byte-identical
    scan a color-stripped 4:2:0 source keeps, exercising the decoder's
    non-interleaved path."""
    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    ql = _quality_scale(QL, quality)
    qc = _quality_scale(QC, quality)

    if channels == 1:
        comps = [("Y", arr[:, :, 0], ql, 1, 1, 0)]
        sof_comps = [(1, gray_hv[0], gray_hv[1], 0)]
    elif channels == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            # box-average 2×2 (pad odd dims by edge replication first)
            def down(p: np.ndarray) -> np.ndarray:
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                p = np.pad(
                    p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                    mode="edge",
                )
                return p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

            comps = [
                ("Y", y, ql, 2, 2, 0),
                ("Cb", down(cb), qc, 1, 1, 1),
                ("Cr", down(cr), qc, 1, 1, 1),
            ]
            sof_comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            comps = [
                ("Y", y, ql, 1, 1, 0),
                ("Cb", cb, qc, 1, 1, 1),
                ("Cr", cr, qc, 1, 1, 1),
            ]
            sof_comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        raise ValueError("encoder supports 1 or 3 channels")

    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # per component: quantized zigzag blocks addressable by (block_row, block_col)
    comp_blocks = []
    for _, plane, q, ch, cv, _tq in comps:
        bw, bh = mcux * ch, mcuy * cv
        blocks = _fdct_quant(_block_split(plane, bw, bh), q)
        comp_blocks.append((blocks.reshape(bh, bw, 64), ch, cv))

    dc_tabs = [_encode_table(*DC_L), _encode_table(*DC_C)]
    ac_tabs = [_encode_table(*AC_L), _encode_table(*AC_C)]

    w_ = _BitWriter()
    body = bytearray()
    dc_pred = [0] * len(comps)
    mcu_in_interval = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_in_interval == restart_interval
            ):
                w_.flush()
                body += w_.out
                body += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                w_ = _BitWriter()
                dc_pred = [0] * len(comps)
                mcu_in_interval = 0
            for ci, (blocks, ch, cv) in enumerate(comp_blocks):
                t = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        zz = blocks[my * cv + by, mx * ch + bx]
                        _write_block(
                            w_, zz, dc_pred, ci, dc_tabs[t], ac_tabs[t]
                        )
            mcu_in_interval += 1
    w_.flush()
    body += w_.out

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + ql[ZIGZAG].astype(np.uint8).tobytes())
    if channels == 3:
        out += _seg(
            0xDB, bytes([0x01]) + qc[ZIGZAG].astype(np.uint8).tobytes()
        )
    sof = bytearray(struct.pack(">BHHB", 8, height, width, len(sof_comps)))
    for cid, ch, cv, tq in sof_comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(0xC0, bytes(sof))
    out += _seg(0xC4, bytes([0x00]) + DC_L[0] + DC_L[1])
    out += _seg(0xC4, bytes([0x10]) + AC_L[0] + AC_L[1])
    if channels == 3:
        out += _seg(0xC4, bytes([0x01]) + DC_C[0] + DC_C[1])
        out += _seg(0xC4, bytes([0x11]) + AC_C[0] + AC_C[1])
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(sof_comps)])
    for i, (cid, _, _, _) in enumerate(sof_comps):
        t = 0 if i == 0 else 1
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


def _write_block(
    w: _BitWriter,
    zz: np.ndarray,
    dc_pred: list[int],
    ci: int,
    dc_tab: dict,
    ac_tab: dict,
) -> None:
    dc = int(zz[0])
    diff = dc - dc_pred[ci]
    dc_pred[ci] = dc
    s = _category(diff)
    code, ln = dc_tab[s]
    w.write(code, ln)
    if s:
        w.write(_magnitude_bits(diff, s), s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        w.write(code, ln)
        w.write(_magnitude_bits(v, s), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)


# --- progressive (SOF2) encoder ----------------------------------------------


def _enc_ac_first_block(w, zz, ss, se, al, tab) -> None:
    """First AC scan of a band, per-block EOB (eobrun == 1 everywhere —
    valid, and keeps the encoder simple)."""
    r = 0
    for k in range(ss, se + 1):
        raw = int(zz[k])
        v = (abs(raw) >> al) * (1 if raw >= 0 else -1)
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = tab[0xF0]
            w.write(code, ln)
            r -= 16
        s = _category(v)
        code, ln = tab[(r << 4) | s]
        w.write(code, ln)
        w.write(_magnitude_bits(v, s), s)
        r = 0
    if r:
        code, ln = tab[0x00]
        w.write(code, ln)


def _enc_ac_refine_block(w, zz, ss, se, al, tab) -> None:
    """AC refinement (T.81 G.1.2.3): runs count zero-history positions,
    nonzero-history positions queue correction bits that flush after
    the next emitted code; per-block EOB carries trailing corrections."""
    r = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        if t == 0:
            r += 1
            continue
        # drain ZRLs BEFORE handling any nonzero (correction included):
        # flushed correction bits must all lie within the decoder's
        # 16-zero ZRL window, so pending may never straddle >15 zeros
        while r > 15:
            code, ln = tab[0xF0]
            w.write(code, ln)
            for b in pending:
                w.write(b, 1)
            pending = []
            r -= 16
        if t > 1:  # history-nonzero at this scan: one correction bit
            pending.append(t & 1)
            continue
        code, ln = tab[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in pending:
            w.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        code, ln = tab[0x00]
        w.write(code, ln)
        for b in pending:
            w.write(b, 1)


def jpeg_encode_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 90,
    subsample_420: bool = False,
    script: list[tuple] | None = None,
    eob_runs: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive JPEG encoder over the SAME quantized coefficients as
    the baseline encoder — so progressive and baseline decodes of the
    same image must be pixel-identical once every script ends at Al=0.

    ``script`` entries: ``(kind, comp_index_or_None, ss, se, ah, al)``
    with kind ∈ {dc_first, dc_refine, ac_first, ac_refine}; DC scans
    are interleaved over all components.  The default script uses both
    spectral selection and successive approximation (the libjpeg-style
    shape)."""
    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    ql = _quality_scale(QL, quality)
    qc = _quality_scale(QC, quality)
    if channels == 1:
        planes = [(arr[:, :, 0], ql, 1, 1, 0)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                p = np.pad(
                    p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                    mode="edge",
                )
                return p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

            planes = [
                (y, ql, 2, 2, 0), (down(cb), qc, 1, 1, 1),
                (down(cr), qc, 1, 1, 1),
            ]
        else:
            planes = [
                (y, ql, 1, 1, 0), (cb, qc, 1, 1, 1), (cr, qc, 1, 1, 1)
            ]
    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for ci, (plane, q, ch, cv, tq) in enumerate(planes):
        bw, bh = mcux * ch, mcuy * cv
        grid = _fdct_quant(_block_split(plane, bw, bh), q).reshape(
            bh, bw, 64
        )
        cw = (width * ch + hmax - 1) // hmax
        chh = (height * cv + vmax - 1) // vmax
        comps.append(
            {
                "cid": ci + 1, "grid": grid, "h": ch, "v": cv, "tq": tq,
                "cbx": (cw + 7) // 8, "cby": (chh + 7) // 8,
                "tab": 0 if ci == 0 else 1,
            }
        )

    if script is None:
        script = [("dc_first", None, 0, 0, 0, 1)]
        for ci in range(len(comps)):
            script.append(("ac_first", ci, 1, 63, 0, 2))
        for ci in range(len(comps)):
            script.append(("ac_refine", ci, 1, 63, 2, 1))
            script.append(("ac_refine", ci, 1, 63, 1, 0))
        script.append(("dc_refine", None, 0, 0, 1, 0))

    dc_tabs = [_encode_table(*DC_L), _encode_table(*DC_C)]
    if eob_runs:
        # cross-block EOB runs need the EOBn symbols (libjpeg's real
        # shape); the annex-K tables only carry EOB0
        ac_tabs = [_encode_table(*AC_PROG)] * 2
    else:
        ac_tabs = [_encode_table(*AC_L), _encode_table(*AC_C)]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + ql[ZIGZAG].astype(np.uint8).tobytes())
    if channels == 3:
        out += _seg(
            0xDB, bytes([0x01]) + qc[ZIGZAG].astype(np.uint8).tobytes()
        )
    sof = bytearray(struct.pack(">BHHB", 8, height, width, len(comps)))
    for c in comps:
        sof += bytes([c["cid"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC2, bytes(sof))
    out += _seg(0xC4, bytes([0x00]) + DC_L[0] + DC_L[1])
    ac_l, ac_c = (AC_PROG, AC_PROG) if eob_runs else (AC_L, AC_C)
    out += _seg(0xC4, bytes([0x10]) + ac_l[0] + ac_l[1])
    if channels == 3:
        out += _seg(0xC4, bytes([0x01]) + DC_C[0] + DC_C[1])
        out += _seg(0xC4, bytes([0x11]) + ac_c[0] + ac_c[1])
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    for kind, ci, ss, se, ah, al in script:
        body = bytearray()
        w = _BitWriter()
        rst = 0

        def restart(flush_run=None, tab=None):
            nonlocal w, rst
            if flush_run is not None:
                flush_run.flush(w, tab)
            w.flush()
            body.extend(w.out)
            body.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            w = _BitWriter()

        if kind in ("dc_first", "dc_refine"):
            sos = bytearray([len(comps)])
            for c in comps:
                sos += bytes([c["cid"], (c["tab"] << 4) | 0])
            sos += bytes([ss, se, (ah << 4) | al])
            pred = [0] * len(comps)
            for u in range(mcuy * mcux):
                if restart_interval and u and u % restart_interval == 0:
                    restart()
                    pred = [0] * len(comps)
                my, mx = divmod(u, mcux)
                for i, c in enumerate(comps):
                    tab = dc_tabs[c["tab"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc = int(
                                c["grid"][
                                    my * c["v"] + by, mx * c["h"] + bx, 0
                                ]
                            )
                            if kind == "dc_first":
                                d = (dc >> al) - pred[i]
                                pred[i] = dc >> al
                                s = _category(d)
                                code, ln = tab[s]
                                w.write(code, ln)
                                if s:
                                    w.write(_magnitude_bits(d, s), s)
                            else:  # one two's-complement bit per block
                                w.write((dc >> al) & 1, 1)
        else:  # AC scans: single component, raster over ITS grid
            c = comps[ci]
            sos = bytearray([1])
            sos += bytes([c["cid"], (0 << 4) | c["tab"]])
            sos += bytes([ss, se, (ah << 4) | al])
            tab = ac_tabs[c["tab"]]
            run = _RunState()
            u = 0
            for by in range(c["cby"]):
                for bx in range(c["cbx"]):
                    if (
                        restart_interval
                        and u
                        and u % restart_interval == 0
                    ):
                        restart(flush_run=run, tab=tab)
                    zz = c["grid"][by, bx]
                    if eob_runs:
                        if kind == "ac_first":
                            _enc_ac_first_runs(w, zz, ss, se, al, tab, run)
                        else:
                            _enc_ac_refine_runs(w, zz, ss, se, al, tab, run)
                    elif kind == "ac_first":
                        _enc_ac_first_block(w, zz, ss, se, al, tab)
                    else:
                        _enc_ac_refine_block(w, zz, ss, se, al, tab)
                    u += 1
            run.flush(w, tab)
        w.flush()
        body.extend(w.out)
        out += _seg(0xDA, bytes(sos))
        out += body
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive with TRUE cross-block EOB runs + restart intervals ----------
# The annex-K AC tables carry only EOB0 (0x00), so a run-capable scan
# needs a custom table with the EOBn symbols libjpeg actually emits.

#: canonical table: 176 symbols, all length 8 — EOBn (r 0..14), ZRL,
#: and (run, size) for sizes 1..10
_AC_PROG_SYMS = bytes(
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
AC_PROG = (
    bytes([0] * 7 + [len(_AC_PROG_SYMS)] + [0] * 8),
    _AC_PROG_SYMS,
)


class _RunState:
    """Cross-block EOB-run accumulator for one AC scan (first or
    refinement): ``n`` pending blocks, ``bits`` the correction bits
    queued during the run (refinement only)."""

    def __init__(self) -> None:
        self.n = 0
        self.bits: list[int] = []

    def flush(self, w: _BitWriter, tab) -> None:
        if self.n == 0:
            return
        r = self.n.bit_length() - 1
        extra = self.n - (1 << r)
        code, ln = tab[r << 4]
        w.write(code, ln)
        if r:
            w.write(extra, r)
        for b in self.bits:
            w.write(b, 1)
        self.n = 0
        self.bits = []


def _enc_ac_first_runs(w, zz, ss, se, al, tab, run: _RunState) -> None:
    vals = [
        (abs(int(zz[k])) >> al) * (1 if int(zz[k]) >= 0 else -1)
        for k in range(ss, se + 1)
    ]
    if not any(vals):
        run.n += 1
        if run.n == 32767:
            run.flush(w, tab)
        return
    run.flush(w, tab)
    last_nz = max(i for i, v in enumerate(vals) if v)
    r = 0
    for v in vals[: last_nz + 1]:
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = tab[0xF0]
            w.write(code, ln)
            r -= 16
        s = _category(v)
        code, ln = tab[(r << 4) | s]
        w.write(code, ln)
        w.write(_magnitude_bits(v, s), s)
        r = 0
    if last_nz < len(vals) - 1:
        run.n = 1  # this block ends in EOB; following zero blocks join


def _enc_ac_refine_runs(w, zz, ss, se, al, tab, run: _RunState) -> None:
    ts = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    if 1 not in ts:  # corrections only: join/start the EOB run
        run.n += 1
        run.bits.extend(t & 1 for t in ts if t > 1)
        if run.n == 32767:
            run.flush(w, tab)
        return
    run.flush(w, tab)
    last_new = max(i for i, t in enumerate(ts) if t == 1)
    r = 0
    pending: list[int] = []
    for i in range(last_new + 1):
        t = ts[i]
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, ln = tab[0xF0]
            w.write(code, ln)
            for b in pending:
                w.write(b, 1)
            pending = []
            r -= 16
        if t > 1:
            pending.append(t & 1)
            continue
        k = ss + i
        code, ln = tab[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in pending:
            w.write(b, 1)
        pending = []
        r = 0
    tail = [t & 1 for t in ts[last_new + 1 :] if t > 1]
    if ts[last_new + 1 :] or pending or tail:
        # block ends in EOB carrying the leftover corrections
        run.n = 1
        run.bits = pending + tail
