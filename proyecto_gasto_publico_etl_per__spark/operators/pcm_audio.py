"""AIFF and Sun AU audio decode + G.711 µ-law/A-law — pure stdlib.

Round 11, same in-container-verifiability rule as the rest of the codec
lane: AIFF is chunked big-endian PCM with an 80-bit-extended sample
rate (all structural), and AU is a flat header over PCM or G.711
companding whose µ-law/A-law expansions are CLOSED-FORM (segment shift
arithmetic, no tables) — and this container still ships ``audioop``
(3.11), so the tests pin both expansions against an independent stdlib
implementation, byte-for-byte over all 256 code points.  The engine
path deliberately does NOT import ``audioop``/``aifc`` (both are
removed in Python 3.13); they are test-side references only.

Output matches ``multimodal.decode_audio``:
``{sample_rate, n_channels, samples}`` with interleaved floats in
[-1, 1).
"""

from __future__ import annotations

import struct

from .codec_errors import corrupt_guard


def read_extended80(b10: bytes) -> float:
    """IEEE 754 80-bit extended float (the AIFF sample-rate field):
    1 sign + 15 exponent (bias 16383) + 64-bit mantissa with explicit
    integer bit."""
    if len(b10) != 10:
        raise ValueError("extended float needs exactly 10 bytes")
    sign = b10[0] >> 7
    exp = ((b10[0] & 0x7F) << 8) | b10[1]
    mant = int.from_bytes(b10[2:10], "big")
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    val = mant * 2.0 ** (exp - 16383 - 63)
    return -val if sign else val


def ulaw_expand(code: int) -> int:
    """G.711 µ-law code byte → 16-bit linear sample (closed form:
    complement, 3-bit exponent segment, 4-bit mantissa, bias 0x84)."""
    u = ~code & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    man = u & 0x0F
    x = (((man << 3) + 0x84) << exp) - 0x84
    return -x if sign else x


def alaw_expand(code: int) -> int:
    """G.711 A-law code byte → 16-bit linear sample (closed form:
    0x55 XOR, segment shift; sign bit SET means positive in A-law)."""
    a = code ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 7
    man = a & 0x0F
    if exp:
        x = ((man << 4) + 0x108) << (exp - 1)
    else:
        x = (man << 4) + 8
    return x if sign else -x


#: precomputed expansion tables (256 ints each — closed form above)
ULAW_TABLE = [ulaw_expand(i) for i in range(256)]
ALAW_TABLE = [alaw_expand(i) for i in range(256)]


def _pcm_be_samples(data: bytes, width: int, signed8: bool) -> list[float]:
    """Big-endian linear PCM bytes → normalized floats."""
    if width == 1:
        if signed8:  # AIFF/AU 8-bit is SIGNED (WAV's is unsigned)
            return [
                (b - 256 if b >= 128 else b) / 128.0 for b in data
            ]
        return [(b - 128) / 128.0 for b in data]
    n = len(data) // width
    if width == 2:
        ints = struct.unpack(f">{n}h", data[: 2 * n])
        return [x / 32768.0 for x in ints]
    if width == 3:
        out = []
        for i in range(n):
            x = int.from_bytes(data[3 * i : 3 * i + 3], "big", signed=True)
            out.append(x / 8388608.0)
        return out
    if width == 4:
        ints = struct.unpack(f">{n}i", data[: 4 * n])
        return [x / 2147483648.0 for x in ints]
    raise NotImplementedError(f"unsupported PCM width {width}")


@corrupt_guard("AIFF")
def aiff_decode(payload: bytes) -> dict:
    """Decode an AIFF (or uncompressed AIFF-C) payload: FORM chunk walk,
    COMM geometry + 80-bit-extended rate, SSND big-endian PCM.
    Compressed AIFF-C types (other than NONE) raise the loud guard."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload (missing FORM/AIFF)")
    is_aifc = payload[8:12] == b"AIFC"
    pos, end = 12, min(len(payload), 8 + struct.unpack(">I", payload[4:8])[0])
    comm = None
    ssnd = None
    while pos + 8 <= end:
        ckid = payload[pos : pos + 4]
        (size,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("AIFF chunk truncated")
        if ckid == b"COMM":
            nch, nframes = struct.unpack(">HI", body[:6])
            (bits,) = struct.unpack(">H", body[6:8])
            rate = read_extended80(body[8:18])
            if is_aifc:
                ctype = body[18:22]
                if ctype not in (b"NONE", b"sowt", b""):
                    raise NotImplementedError(
                        f"AIFF-C compression {ctype!r} requires soundfile"
                    )
                if ctype == b"sowt":
                    raise NotImplementedError(
                        "little-endian AIFF-C (sowt) requires soundfile"
                    )
            comm = (nch, nframes, bits, rate)
        elif ckid == b"SSND":
            (offset,) = struct.unpack(">I", body[:4])
            ssnd = body[8 + offset :]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    nch, nframes, bits, rate = comm
    if nch < 1 or not rate >= 1.0:
        # a denormal / negative / zero 80-bit rate or zero channels is
        # corrupt, not plausible-looking garbage for the feature tiers
        raise ValueError("AIFF header with non-positive rate/channels")
    if bits % 8 or not 8 <= bits <= 32:
        raise NotImplementedError(f"{bits}-bit AIFF requires soundfile")
    width = bits // 8
    need = nframes * nch * width
    if len(ssnd) < need:
        raise ValueError("AIFF SSND shorter than COMM frame count")
    samples = _pcm_be_samples(ssnd[:need], width, signed8=True)
    return {
        "sample_rate": int(round(rate)),
        "n_channels": nch,
        "samples": samples,
    }


#: AU encoding ids → (handler kind, sample width)
_AU_PCM = {2: 1, 3: 2, 4: 3, 5: 4}


@corrupt_guard("AU")
def au_decode(payload: bytes) -> dict:
    """Decode a Sun AU (.snd) payload: flat big-endian header, then
    µ-law (1), linear PCM 8/16/24/32 (2-5), float32/64 (6/7), or
    A-law (27) data.  Other encodings raise the loud guard."""
    if payload[:4] != b".snd":
        raise ValueError("not an AU payload (missing .snd magic)")
    hdr_size, data_size, enc, rate, nch = struct.unpack(
        ">IIIII", payload[4:24]
    )
    if hdr_size < 24:
        raise ValueError("AU header size smaller than the fixed fields")
    data = payload[hdr_size:]
    if data_size != 0xFFFFFFFF:
        if len(data) < data_size:
            raise ValueError("AU data truncated")
        data = data[:data_size]
    if nch < 1 or rate < 1:
        raise ValueError("AU header with non-positive rate/channels")
    if enc == 1:
        samples = [ULAW_TABLE[b] / 32768.0 for b in data]
    elif enc == 27:
        samples = [ALAW_TABLE[b] / 32768.0 for b in data]
    elif enc in _AU_PCM:
        samples = _pcm_be_samples(data, _AU_PCM[enc], signed8=True)
    elif enc == 6:
        n = len(data) // 4
        samples = list(struct.unpack(f">{n}f", data[: 4 * n]))
    elif enc == 7:
        n = len(data) // 8
        samples = list(struct.unpack(f">{n}d", data[: 8 * n]))
    else:
        raise NotImplementedError(
            f"AU encoding {enc} (ADPCM/...) requires soundfile"
        )
    return {"sample_rate": rate, "n_channels": nch, "samples": samples}


#: WAVE fmt tags → decode kind (EXTENSIBLE resolves to its SubFormat)
_WAV_PCM_WIDTHS = {8, 16, 24, 32}


def _pcm_le_samples(data: bytes, width: int) -> list[float]:
    """Little-endian WAV PCM → normalized floats (8-bit is UNSIGNED,
    the WAV convention — AIFF/AU's is signed)."""
    if width == 1:
        return [(b - 128) / 128.0 for b in data]
    n = len(data) // width
    if width == 2:
        return [x / 32768.0 for x in struct.unpack(f"<{n}h", data[: 2 * n])]
    if width == 3:
        out = []
        for i in range(n):
            x = int.from_bytes(
                data[3 * i : 3 * i + 3], "little", signed=True
            )
            out.append(x / 8388608.0)
        return out
    if width == 4:
        return [
            x / 2147483648.0
            for x in struct.unpack(f"<{n}i", data[: 4 * n])
        ]
    raise NotImplementedError(f"unsupported PCM width {width}")


@corrupt_guard("WAV")
def wav_decode(payload: bytes) -> dict:
    """Full RIFF/WAVE decode: PCM 8/16/24/32 (tag 1), IEEE float32/64
    (tag 3), G.711 A-law (6) / µ-law (7), and WAVE_FORMAT_EXTENSIBLE
    (0xFFFE, resolved through its SubFormat GUID).  This supersedes the
    stdlib ``wave`` fallback, which rejects everything but integer PCM
    — telephony corpora are largely G.711 WAV.  ADPCM and other
    compressed tags raise the loud guard."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE)")
    pos, end = 12, min(
        len(payload), 8 + struct.unpack("<I", payload[4:8])[0]
    )
    fmt = None
    data = None
    while pos + 8 <= end:
        ckid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("WAV chunk truncated")
        if ckid == b"fmt ":
            tag, nch, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if tag == 0xFFFE:  # EXTENSIBLE: real tag = SubFormat GUID
                if len(body) < 40:
                    raise ValueError("WAV extensible fmt truncated")
                (tag,) = struct.unpack("<H", body[24:26])
                # the first u16 alone doesn't identify the codec: only
                # the Microsoft media-subtype GUID family maps its tag
                # onto WAVE format tags — a vendor GUID sharing that
                # u16 must hit the loud guard, not decode as PCM
                if body[26:40] != (
                    b"\x00\x00\x00\x00\x10\x00"
                    b"\x80\x00\x00\xaa\x00\x38\x9b\x71"
                ):
                    raise NotImplementedError(
                        "WAV extensible SubFormat GUID "
                        f"{body[24:40].hex()} is not a standard media "
                        "subtype; needs soundfile"
                    )
            fmt = (tag, nch, rate, bits)
        elif ckid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, nch, rate, bits = fmt
    if nch < 1 or rate < 1:
        raise ValueError("WAV header with non-positive rate/channels")
    if tag == 1:
        if bits not in _WAV_PCM_WIDTHS:
            raise NotImplementedError(f"{bits}-bit WAV PCM needs soundfile")
        samples = _pcm_le_samples(data, bits // 8)
    elif tag == 3:
        if bits == 32:
            n = len(data) // 4
            samples = list(struct.unpack(f"<{n}f", data[: 4 * n]))
        elif bits == 64:
            n = len(data) // 8
            samples = list(struct.unpack(f"<{n}d", data[: 8 * n]))
        else:
            raise ValueError(f"WAV float with {bits} bits")
    elif tag == 6:
        samples = [ALAW_TABLE[b] / 32768.0 for b in data]
    elif tag == 7:
        samples = [ULAW_TABLE[b] / 32768.0 for b in data]
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (ADPCM/MP3-in-WAV/...) needs soundfile"
        )
    return {"sample_rate": rate, "n_channels": nch, "samples": samples}
