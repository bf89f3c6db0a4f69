"""FLAC decode in pure stdlib — no soundfile required.

Covers the free-lossless-audio-codec bitstream (xiph spec / RFC 9639):
STREAMINFO metadata walk, frame sync + header parse, all four subframe
types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32), Rice
residuals (4- and 5-bit parameter methods, partition orders, escape
codes), wasted bits, and the three stereo decorrelation modes
(left/side, right/side, mid/side).  CRCs are parsed past, not verified
(decode errors surface as loud ValueErrors from structure checks).

Like the PNG/JPEG stdlib paths, this runs per-row inside an Arrow batch
on the executor: the bit-level loop is pure Python, bounded by batch
sizing and clip-scale payloads; FLAC is lossless so the decode is
EXACT — tests assert sample equality, not tolerances.

Reference surface parity: the reference engine has no audio operators;
this extends the multimodal training-data lane (SURVEY.md §2 extension
rows) where raw audio corpora are predominantly FLAC/MP3 — FLAC now
decodes for real in the codec-less container, MP3 (patent-era DSP)
still requires soundfile.
"""

from __future__ import annotations
from .codec_errors import corrupt_guard

from typing import Any

#: frame-header block-size codes (index = 4-bit code); 6/7 read 8/16
#: bits from the stream, 0 is reserved
_BS_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

#: frame-header sample-size codes (3 bits); 0 = use STREAMINFO
_SS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: fixed-predictor coefficients by order: pred = Σ c_j · x[i-1-j]
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _Bits:
    """MSB-first bit reader; running off the end is a structure error
    (FLAC has no pad-to-EOB convention like JPEG)."""

    __slots__ = ("d", "i", "b")

    def __init__(self, d: bytes, byte_pos: int = 0) -> None:
        self.d = d
        self.i = byte_pos
        self.b = 0

    def read_bit(self) -> int:
        if self.i >= len(self.d):
            raise ValueError("FLAC bitstream truncated")
        bit = (self.d[self.i] >> (7 - self.b)) & 1
        self.b += 1
        if self.b == 8:
            self.b = 0
            self.i += 1
        return bit

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read_bit() == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.b:
            self.b = 0
            self.i += 1

    def exhausted(self) -> bool:
        return self.i >= len(self.d)


def _utf8_num(bits: _Bits) -> int:
    """The frame header's UTF-8-style coded sample/frame number
    (extended to 7 bytes / 36 bits)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("bad UTF-8-coded frame number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded frame number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _residual(bits: _Bits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    if block_size >> porder << porder != block_size:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(1 << porder):
        n = (block_size >> porder) - (order if p == 0 else 0)
        k = bits.read(pbits)
        if k == escape:
            raw = bits.read(5)
            out.extend(
                bits.read_signed(raw) if raw else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = bits.unary()
                v = (q << k) | (bits.read(k) if k else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eb = bps - wasted
    if t == 0:  # CONSTANT
        out = [bits.read_signed(eb)] * block_size
    elif t == 1:  # VERBATIM
        out = [bits.read_signed(eb) for _ in range(block_size)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        out = [bits.read_signed(eb) for _ in range(order)]
        resid = _residual(bits, block_size, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(
                c * out[len(out) - 1 - j] for j, c in enumerate(coefs)
            )
            out.append(pred + r)
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        out = [bits.read_signed(eb) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:  # stored 0b1111 is invalid per spec
            raise ValueError("invalid FLAC LPC precision code")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _residual(bits, block_size, order)
        for r in resid:
            acc = sum(
                c * out[len(out) - 1 - j] for j, c in enumerate(coefs)
            )
            out.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        out = [x << wasted for x in out]
    return out


def _decode_frame(
    bits: _Bits, si_bps: int
) -> tuple[list[list[int]], int]:
    """One frame → (per-channel sample lists, block_size)."""
    if bits.read(14) != 0x3FFE:
        raise ValueError("bad FLAC frame sync")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved
    _utf8_num(bits)
    if bs_code == 0:
        raise ValueError("reserved FLAC block-size code 0")
    if bs_code == 6:
        block_size = bits.read(8) + 1
    elif bs_code == 7:
        block_size = bits.read(16) + 1
    else:
        block_size = _BS_TABLE[bs_code]
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    elif sr_code == 15:
        raise ValueError("invalid FLAC sample-rate code 15")
    bps = si_bps if ss_code == 0 else _SS_TABLE.get(ss_code)
    if bps is None:
        raise ValueError(f"reserved FLAC sample-size code {ss_code}")
    bits.read(8)  # header CRC-8 (parsed past, not verified)

    if ch_code < 8:  # independent channels
        chans = [
            _subframe(bits, block_size, bps) for _ in range(ch_code + 1)
        ]
    elif ch_code in (8, 9, 10):  # stereo decorrelation; side has +1 bit
        if ch_code == 8:  # left/side
            left = _subframe(bits, block_size, bps)
            side = _subframe(bits, block_size, bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # side/right
            side = _subframe(bits, block_size, bps + 1)
            right = _subframe(bits, block_size, bps)
            chans = [[r + s for r, s in zip(right, side)], right]
        else:  # mid/side
            mid = _subframe(bits, block_size, bps)
            side = _subframe(bits, block_size, bps + 1)
            chans = [[], []]
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                chans[0].append((m2 + s) >> 1)
                chans[1].append((m2 - s) >> 1)
    else:
        raise ValueError(f"reserved FLAC channel assignment {ch_code}")
    bits.align()
    bits.read(16)  # frame CRC-16 (parsed past, not verified)
    return chans, block_size


@corrupt_guard("FLAC")
def flac_decode(payload: bytes) -> dict[str, Any]:
    """Decode a FLAC payload to ``{sample_rate, n_channels, samples}``
    with ``samples`` floats in [-1, 1], channel-interleaved — the same
    contract as ``multimodal.decode_audio``'s WAV path.  Lossless:
    the integer samples are bit-exact, only the final normalization
    divides."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    si = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        if hdr & 0x7F == 0:  # STREAMINFO
            raw = int.from_bytes(body, "big")
            # layout (bits): 16+16+24+24 | rate:20 ch:3 bps:5 total:36 | md5:128
            si = {
                "rate": (raw >> (128 + 36 + 5 + 3)) & 0xFFFFF,
                "nch": ((raw >> (128 + 36 + 5)) & 0x7) + 1,
                "bps": ((raw >> (128 + 36)) & 0x1F) + 1,
                "total": (raw >> 128) & 0xFFFFFFFFF,
            }
        pos += 4 + ln
        if hdr & 0x80:  # last metadata block
            break
    else:
        raise ValueError("FLAC metadata truncated")
    if si is None:
        raise ValueError("FLAC missing STREAMINFO")

    bits = _Bits(payload, pos)
    per_chan: list[list[int]] = [[] for _ in range(si["nch"])]
    decoded = 0
    while not bits.exhausted() and (
        si["total"] == 0 or decoded < si["total"]
    ):
        chans, block = _decode_frame(bits, si["bps"])
        if len(chans) != si["nch"]:
            raise ValueError(
                "FLAC frame channel count differs from STREAMINFO"
            )
        for c, vals in zip(per_chan, chans):
            c.extend(vals)
        decoded += block
    if si["total"] and decoded < si["total"]:
        raise ValueError("FLAC stream ends before STREAMINFO total")

    scale = float(1 << (si["bps"] - 1))
    n = si["total"] or decoded
    samples = [
        per_chan[c][i] / scale for i in range(n) for c in range(si["nch"])
    ]
    return {
        "sample_rate": si["rate"],
        "n_channels": si["nch"],
        "samples": samples,
    }
