"""Reference FLAC ENCODER for round-trip tests — test-side only, like
the JPEG/AVI reference writers: the package ships the decoder
(`operators/flac.py`); this minimal-but-valid encoder exists so every
decoder path (constant / verbatim / fixed+Rice / trivial LPC / escape
partitions / wasted bits / mid-side stereo / multi-frame) is
exercisable in a container with no audio codec."""

from __future__ import annotations

import struct


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        self.write(0, q) if q else None
        self.write(1, 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_bytes(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # 2-byte form covers every frame count these tests reach
    return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])


def _write_rice(w: _BitWriter, resid: list[int], k: int, pbits: int) -> None:
    w.write(k, pbits)
    for r in resid:
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        w.write_unary(z >> k)
        if k:
            w.write(z & ((1 << k) - 1), k)


def _pick_k(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) // max(1, len(resid)) + 1
    return min(14, max(0, mean.bit_length()))


def _write_subframe(
    w: _BitWriter,
    samples: list[int],
    bps: int,
    mode: str = "verbatim",
    wasted: int = 0,
    escape_raw: int = 0,
) -> None:
    eb = bps - wasted
    vals = [s >> wasted for s in samples] if wasted else samples
    w.write(0, 1)  # padding bit
    type_code = {
        "constant": 0, "verbatim": 1, "fixed0": 8, "fixed1": 9,
        "fixed2": 10, "lpc1": 32,
    }[mode]
    w.write(type_code, 6)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)
    if mode == "constant":
        assert len(set(vals)) == 1
        w.write(vals[0], eb)
        return
    if mode == "verbatim":
        for v in vals:
            w.write(v, eb)
        return
    order = {"fixed0": 0, "fixed1": 1, "fixed2": 2, "lpc1": 1}[mode]
    if order >= len(vals):
        raise ValueError(
            f"predictor order {order} needs a block longer than "
            f"{len(vals)} samples (no real encoder emits this)"
        )
    for v in vals[:order]:
        w.write(v, eb)
    if mode == "lpc1":  # trivial LPC: pred = 1 * prev >> 0 ≡ fixed order 1
        w.write(3, 4)  # precision-1 = 3 → 4-bit coefficients
        w.write(0, 5)  # shift 0
        w.write(1, 4)  # the single coefficient: 1
        resid = [vals[i] - vals[i - 1] for i in range(1, len(vals))]
    elif mode == "fixed0":
        resid = list(vals)
    elif mode == "fixed1":
        resid = [vals[i] - vals[i - 1] for i in range(1, len(vals))]
    else:  # fixed2
        resid = [
            vals[i] - 2 * vals[i - 1] + vals[i - 2]
            for i in range(2, len(vals))
        ]
    w.write(0, 2)  # residual method 0: 4-bit Rice parameters
    w.write(0, 4)  # partition order 0 (one partition)
    if escape_raw:
        w.write(15, 4)  # 4-bit escape code
        w.write(escape_raw, 5)
        for r in resid:
            w.write(r, escape_raw)
    else:
        _write_rice(w, resid, _pick_k(resid), 4)


def flac_encode(
    channels: list[list[int]],
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 256,
    mode: str = "verbatim",
    stereo: str = "independent",
    wasted: int = 0,
    escape_raw: int = 0,
) -> bytes:
    """Encode integer channel data as a valid FLAC stream.  ``mode``
    picks the subframe type (all blocks use it; constant requires
    constant input).  ``stereo='mid_side'`` exercises channel
    assignment 10 on 2-channel input."""
    nch = len(channels)
    total = len(channels[0])
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += (0).to_bytes(3, "big") * 2  # min/max frame size: unknown
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += bytes(16)  # md5: unset
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si  # last block

    n_blocks = (total + block_size - 1) // block_size
    for f in range(n_blocks):
        lo, hi = f * block_size, min((f + 1) * block_size, total)
        bs = hi - lo
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed block-size stream
        hdr.write(7, 4)  # block size: 16-bit field follows
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = 10 if (stereo == "mid_side" and nch == 2) else nch - 1
        hdr.write(ch_code, 4)
        hdr.write(0, 3)  # sample size: from STREAMINFO
        hdr.write(0, 1)
        for b in _utf8_bytes(f):
            hdr.write(b, 8)
        hdr.write(bs - 1, 16)
        hdr.align()
        hdr_bytes = bytes(hdr.out)
        frame = bytearray(hdr_bytes)
        frame.append(crc8(hdr_bytes))

        w = _BitWriter()
        if stereo == "mid_side" and nch == 2:
            left = channels[0][lo:hi]
            right = channels[1][lo:hi]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            _write_subframe(w, mid, bps, mode, wasted, escape_raw)
            _write_subframe(w, side, bps + 1, mode, wasted, escape_raw)
        else:
            for ch in channels:
                _write_subframe(
                    w, ch[lo:hi], bps, mode, wasted, escape_raw
                )
        w.align()
        frame += w.out
        frame += struct.pack(">H", crc16(bytes(frame)))
        out += frame
    return bytes(out)
