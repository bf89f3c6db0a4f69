"""ISO Base Media File Format (MP4/MOV) demuxer — pure stdlib.

Round 11 narrows the "MP4-family video" guard the honest way: the
CONTAINER layer of ISO/IEC 14496-12 is pure structure (length-prefixed
box tree + integer sample tables — no spec-side entropy tables), so it
is fully implementable and verifiable in this environment, exactly like
the RIFF/AVI walk (multimodal._avi_mjpeg_frames).  Frame extraction is
therefore REAL for any MP4/MOV whose video track is MJPEG-coded
(sample entry ``jpeg``/``mjpa``/``mjpb``/``mjpg``): each extracted
sample is a standalone JPEG that ``jpeg.jpeg_decode`` decodes for real.
Inter-coded codecs (avc1/hev1/vp09/av01/mp4v) raise a loud
NotImplementedError naming the codec — decoding those needs either the
optional libs or spec table data that cannot be verified in-container
(see the decode_audio decision record in multimodal.py).

Reference parity note: the reference repo has no multimodal surface at
all (SURVEY.md §2.12 extension lane); this module exists for the
LLM-training-data pipeline requirement.

Box layout (ISO 14496-12 §4.2): 4-byte big-endian size + 4-byte type;
size==1 → 64-bit largesize follows the type; size==0 → box extends to
the end of the enclosing container.  Sample location = stsc
(sample→chunk runs) × stco/co64 (chunk file offsets) × stsz (sample
sizes); chunk data is contiguous samples.
"""

from __future__ import annotations
from .codec_errors import corrupt_guard

import struct

#: sample-entry fourccs whose samples are standalone JPEG bytestreams
MJPEG_ENTRIES = frozenset({b"jpeg", b"mjpa", b"mjpb", b"mjpg", b"MJPG"})

#: container boxes whose payload is a plain box sequence
_CONTAINERS = frozenset(
    {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex"}
)


def _boxes(payload: bytes, pos: int, end: int):
    """Yield ``(type, body_start, body_end)`` for the box sequence in
    ``payload[pos:end]``.  Malformed sizes raise ValueError (the
    corrupt-container contract; callers in bulk ingest quarantine)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("MP4 box truncated in largesize")
            (size,) = struct.unpack(">Q", payload[body : body + 8])
            body += 8
            if size < 16:
                raise ValueError("MP4 largesize smaller than its header")
        elif size == 0:
            size = end - pos
        elif size < 8:
            raise ValueError(f"MP4 box size {size} smaller than its header")
        box_end = pos + size
        if box_end > end:
            raise ValueError("MP4 box overruns its container")
        yield btype, body, box_end
        pos = box_end


def _find(payload: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _boxes(payload, pos, end):
        if t == btype:
            return b, e
    return None


def _full_box(payload: bytes, body: int) -> int:
    """Skip a FullBox's version+flags word; returns the payload start."""
    return body + 4


def _sample_table(payload: bytes, stbl_b: int, stbl_e: int):
    """Decode stsd entry fourcc + the (offset, size) list of every
    sample, from the stbl sample tables."""
    fourcc = None
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc_runs: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    for t, b, e in _boxes(payload, stbl_b, stbl_e):
        if t == b"stsd":
            p = _full_box(payload, b)
            (entry_count,) = struct.unpack(">I", payload[p : p + 4])
            if entry_count < 1:
                raise ValueError("MP4 stsd has no sample entries")
            # first entry: 4-byte size + 4-byte format fourcc
            fourcc = payload[p + 8 : p + 12]
        elif t == b"stsz":
            p = _full_box(payload, b)
            const_size, count = struct.unpack(">II", payload[p : p + 8])
            if const_size:
                sizes = [const_size] * count
            else:
                sizes = list(
                    struct.unpack(
                        f">{count}I", payload[p + 8 : p + 8 + 4 * count]
                    )
                )
        elif t in (b"stco", b"co64"):
            p = _full_box(payload, b)
            (count,) = struct.unpack(">I", payload[p : p + 4])
            fmt, w = (">%dI" % count, 4) if t == b"stco" else (">%dQ" % count, 8)
            chunk_offsets = list(
                struct.unpack(fmt, payload[p + 4 : p + 4 + w * count])
            )
        elif t == b"stsc":
            p = _full_box(payload, b)
            (count,) = struct.unpack(">I", payload[p : p + 4])
            for i in range(count):
                first, per_chunk, _sdi = struct.unpack(
                    ">III", payload[p + 4 + 12 * i : p + 16 + 12 * i]
                )
                stsc_runs.append((first, per_chunk))
    if fourcc is None or not sizes or not chunk_offsets or not stsc_runs:
        raise ValueError("MP4 stbl is missing required sample tables")

    # expand stsc runs: samples-per-chunk for each 1-based chunk index
    spans: list[tuple[int, int]] = []  # (offset, size) per sample
    si = 0
    n_chunks = len(chunk_offsets)
    # stsc first_chunk is 1-based and runs must strictly increase —
    # first_chunk=0 would wrap to chunk_offsets[-1] via Python negative
    # indexing and return silently wrong sample bytes
    firsts = [f for f, _ in stsc_runs]
    if firsts[0] < 1 or any(
        b <= a for a, b in zip(firsts, firsts[1:])
    ):
        raise ValueError("MP4 stsc chunk runs invalid (non-increasing "
                         "or zero first_chunk)")
    for ri, (first, per_chunk) in enumerate(stsc_runs):
        last = (
            stsc_runs[ri + 1][0] - 1 if ri + 1 < len(stsc_runs) else n_chunks
        )
        for chunk in range(first, last + 1):
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    break
                spans.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si < len(sizes):
        raise ValueError(
            f"MP4 sample tables inconsistent: {len(sizes)} sizes but the "
            f"chunk map places only {si}"
        )
    return fourcc, spans


@corrupt_guard("MP4")
def mp4_video_samples(payload: bytes) -> tuple[bytes, list[bytes]]:
    """Walk the moov box tree and return ``(codec_fourcc, samples)`` for
    the FIRST video (``hdlr`` handler ``vide``) track.  Raises
    ValueError on a malformed container or when no video track exists —
    the quarantine class; codec support is the CALLER's decision."""
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 container has no moov box")
    for t, b, e in _boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None:
            continue
        hp = _full_box(payload, hdlr[0])
        handler = payload[hp + 4 : hp + 8]
        if handler != b"vide":
            continue
        minf = _find(payload, *mdia, b"minf")
        stbl = _find(payload, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("MP4 video track has no stbl")
        fourcc, spans = _sample_table(payload, *stbl)
        out = []
        for off, size in spans:
            if off + size > len(payload):
                raise ValueError("MP4 sample overruns the payload")
            out.append(payload[off : off + size])
        return fourcc, out
    raise ValueError("MP4 container has no video track")


def mp4_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Extract the MJPEG video frames of an MP4/MOV payload: each
    returned element is a standalone JPEG (decodable by
    ``jpeg.jpeg_decode``).  A video track in any inter-coded codec
    raises the loud NotImplementedError guard naming it."""
    fourcc, samples = mp4_video_samples(payload)
    if fourcc not in MJPEG_ENTRIES:
        raise NotImplementedError(
            f"MP4 video codec {fourcc!r} requires the optional decode "
            "libs; the stdlib path extracts MJPEG "
            f"({'/'.join(sorted(f.decode() for f in MJPEG_ENTRIES))}) "
            "sample entries only"
        )
    return samples
