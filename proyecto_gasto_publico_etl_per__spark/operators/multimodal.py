"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — the one place this engine crosses into
Python, because byte-level media decoding is genuinely inexpressible in
Spark SQL.  The Spark-side plumbing (schemas, batch iteration, partition
parallelism) is real and tested.  Decoding is REAL where a codec path
exists: Pillow / soundfile when importable, with pure-stdlib/numpy
fallbacks for full static PNG (all color types incl. palette+tRNS,
depths 1-16, Adam7 interlace),
baseline AND progressive JPEG (``operators/jpeg.py``: Huffman +
multi-scan successive approximation + batch IDCT + chroma upsample), PCM WAV (the ``wave`` module), FLAC (``operators/flac.py``:
full bitstream — all subframe types, Rice partitions, stereo
decorrelation), GIF incl. animation (``operators/gif.py``: LZW,
interlace, transparency, frame compositing), and MJPEG video frame
extraction from BOTH container families (RIFF/AVI ``movi`` walk and the
ISO BMFF/MP4 sample tables, ``operators/mp4.py``) so the real path runs
even in codec-less containers; ``NotImplementedError`` only for formats
none of those cover (arithmetic-coded JPEG / MP3 / inter-coded
MP4-family video without the optional libs).  The deterministic md5 fake remains
the correctness-oracle path — DuckDB can reproduce it, real pixel math
it can't.

Scale notes: media bytes never pass through the driver; each Arrow batch
is decoded inside its executor task.  Keep batches small via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when rows carry megabyte
blobs, and store blobs in their own column family (parquet column) so
metadata-only queries never read them (column pruning).
"""

from __future__ import annotations
from .codec_errors import corrupt_guard

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of a multimodal asset record: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_md5", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _unfilter(
    raw: bytes, n_rows: int, stride: int, bpp: int, offset: int = 0
) -> tuple[bytearray, int]:
    """Reverse the five per-scanline PNG filter types over ``n_rows``
    rows of ``stride`` bytes starting at ``offset`` in the inflated
    stream (each row is prefixed by its filter-type byte).  ``bpp`` is
    the filter's left-neighbor distance in BYTES (max(1, channels·depth
    // 8) per spec, so sub-byte depths use 1).  Returns (pixel bytes,
    next offset) — shared by the sequential and per-Adam7-pass paths."""
    out = bytearray()
    prev = bytearray(stride)
    pos = offset
    for _ in range(n_rows):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out += line
        prev = line
    return out, pos


def _rows_to_samples(
    rows: bytes, n_rows: int, width: int, channels: int, depth: int,
    full16: bool = False,
):
    """Unfiltered scanline bytes → uint8 sample array [n_rows, width,
    channels].  Sub-byte depths unpack MSB-first; 16-bit keeps the high
    byte (the defined 16→8 downsample) unless ``full16`` asks for the
    exact uint16 values (needed to match a 16-bit tRNS key before
    downsampling); indices (palette) pass through unscaled — the caller
    maps them through the PLTE."""
    import numpy as np

    stride = (width * channels * depth + 7) // 8
    arr = np.frombuffer(rows, dtype=np.uint8).reshape(n_rows, stride)
    if depth == 8:
        return arr[:, : width * channels].reshape(n_rows, width, channels)
    if depth == 16:
        a16 = arr.reshape(n_rows, -1)[:, : width * channels * 2]
        pairs = a16.reshape(n_rows, width * channels, 2)
        if full16:
            full = (
                pairs[:, :, 0].astype(np.uint16) << 8
            ) | pairs[:, :, 1].astype(np.uint16)
            return full.reshape(n_rows, width, channels)
        return pairs[:, :, 0].reshape(n_rows, width, channels)
    bits = np.unpackbits(arr, axis=1)[:, : width * depth]
    groups = bits.reshape(n_rows, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (groups * weights[None, None, :]).sum(axis=2).astype(np.uint8)
    return vals.reshape(n_rows, width, 1)


#: Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


@corrupt_guard("PNG")
def _png_decode(payload: bytes) -> dict[str, Any]:
    """Pure-stdlib/numpy PNG decoder covering the full STATIC format:
    gray / gray+alpha / RGB / RGBA / palette, bit depths 1/2/4/8/16
    (16-bit downsamples to the high byte — the contract is 8-bit
    pixels), Adam7 interlace, and palette transparency (tRNS → RGBA).
    Chunk walk → concat IDAT → zlib inflate → per-scanline unfilter
    (``_unfilter``, per Adam7 pass when interlaced) → bit unpack →
    palette map.  Animated PNG's extra frames (acTL/fdAT) are ignored
    per spec — the static IDAT image decodes.  Runs per-row inside an
    Arrow batch on the executor; payloads this path targets are
    thumbnails/tiles, so the O(pixels) Python unfilter loop is bounded
    by batch sizing, not data scale."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr, plte, trns = 8, b"", None, None, None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16) or (
        ctype in (2, 4, 6) and depth < 8
    ):
        raise ValueError(f"invalid PNG depth {depth} for color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = zlib.decompress(idat)
    bpp = max(1, channels * depth // 8)

    # tRNS on gray/truecolor names ONE sample value as fully
    # transparent; the 16-bit key must be matched at full precision
    # BEFORE the high-byte downsample or opaque pixels sharing the high
    # byte would wrongly vanish
    full16 = depth == 16 and trns is not None and ctype in (0, 2)
    sample_dtype = np.uint16 if full16 else np.uint8
    if interlace == 0:
        stride = (w * channels * depth + 7) // 8
        rows, _ = _unfilter(raw, h, stride, bpp)
        img = _rows_to_samples(bytes(rows), h, w, channels, depth, full16)
    elif interlace == 1:  # Adam7
        img = np.zeros((h, w, channels), dtype=sample_dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * channels * depth + 7) // 8
            rows, off = _unfilter(raw, ph, pstride, bpp, off)
            img[y0::dy, x0::dx] = _rows_to_samples(
                bytes(rows), ph, pw, channels, depth, full16
            )
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")

    if ctype == 3:  # palette indices → RGB(A)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            img = np.concatenate([rgb, alpha[idx][..., None]], axis=-1)
            channels = 4
        else:
            img = rgb
            channels = 3
    else:
        trns_mask = None
        if trns is not None and ctype in (0, 2):
            # key samples are big-endian u16 in SOURCE depth units —
            # compare before any scaling/downsampling
            key = np.frombuffer(trns, dtype=">u2").astype(np.int64)
            if len(key) != channels:
                raise ValueError("PNG tRNS length mismatch")
            trns_mask = (
                img.astype(np.int64) == key[None, None, :]
            ).all(axis=-1)
        if full16:
            img = (img >> 8).astype(np.uint8)
        elif depth < 8:  # scale sub-byte gray to full 8-bit range
            img = (
                img.astype(np.uint16) * 255 // ((1 << depth) - 1)
            ).astype(np.uint8)
        if trns_mask is not None:
            alpha = np.where(trns_mask, 0, 255).astype(np.uint8)
            img = np.concatenate([img, alpha[..., None]], axis=-1)
            channels += 1

    return {
        "width": w,
        "height": h,
        "channels": channels,
        "pixels": img.tobytes(),
    }


def decode_image(payload: bytes) -> dict[str, Any]:
    """Decode an image payload to ``{width, height, channels, pixels}``
    (``pixels`` = row-major interleaved 8-bit bytes).

    Pillow when importable (any format it knows); otherwise the
    stdlib paths (full static PNG above, baseline + progressive JPEG in
    ``operators/jpeg.py``).  Raises ``NotImplementedError`` only when
    none covers the payload (e.g. arithmetic-coded JPEG without
    Pillow)."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        if payload[:8] == _PNG_MAGIC:
            return _png_decode(payload)
        if payload[:2] == b"\xff\xd8":
            from .jpeg import jpeg_decode

            return jpeg_decode(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import gif_decode

            return gif_decode(payload)
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from .tiff import tiff_decode

            return tiff_decode(payload)
        if payload[:2] == b"BM":
            from .bmp import bmp_decode

            return bmp_decode(payload)
        if payload[:1] == b"P" and payload[1:2] in b"123456":
            from .simple_images import pnm_decode

            return pnm_decode(payload)
        if _looks_like_tga(payload):
            from .simple_images import tga_decode

            return tga_decode(payload)
        raise NotImplementedError(
            "image decoding beyond PNG, JPEG (baseline/progressive/"
            "lossless), GIF, baseline TIFF, BMP, netpbm, and TGA "
            "requires Pillow, which is not importable in this "
            "environment"
        ) from None
    img = Image.open(io.BytesIO(payload))
    if img.mode not in ("L", "LA", "RGB", "RGBA"):
        img = img.convert("RGBA")
    return {
        "width": img.width,
        "height": img.height,
        "channels": len(img.getbands()),
        "pixels": img.tobytes(),
    }


def _png_encode(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Pure-stdlib PNG writer (8-bit gray/gray+A/RGB/RGBA, filter 0).
    The re-encode half of the stdlib codec path — filter 0 trades a few
    compressed bytes for zero per-pixel Python work."""
    import struct
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _box_weights(dst: int, src: int) -> "np.ndarray":
    """Row-normalized overlap matrix W (dst × src) for exact
    area-average resampling: W[d, s] = |[d·src/dst, (d+1)·src/dst) ∩
    [s, s+1)| · dst/src.  Rows sum to 1 exactly up to FP, so flat
    images stay flat and the global mean is preserved."""
    import numpy as np

    edges = np.arange(dst + 1, dtype=np.float64) * (src / dst)
    w = np.zeros((dst, src), dtype=np.float64)
    for dpos in range(dst):
        lo, hi = edges[dpos], edges[dpos + 1]
        for s in range(int(lo), min(int(np.ceil(hi)), src)):
            w[dpos, s] = min(hi, s + 1) - max(lo, s)
    return w * (dst / src)


def _looks_like_tga(p: bytes) -> bool:
    """TGA has no magic — sniff only headers the stdlib decoder handles
    (uncolormapped type 2/3/10/11 at 8/24/32 bpp).  Checked LAST in the
    dispatch, after every real magic, so it can't shadow other
    formats."""
    return (
        len(p) >= 18
        and p[1] == 0
        and p[2] in (2, 3, 10, 11)
        and p[16] in (8, 24, 32)
    )


def sniff_media_type(payload: bytes | None) -> str | None:
    """Classify an asset payload as ``"image"``/``"audio"``/``"video"``
    by MAGIC BYTES alone (round 13 — the ``--media auto`` dispatcher):
    a real crawl directory's labels are unreliable, so mixed-media
    ingest sniffs each payload and routes it to the right near-dup
    lane in one pass.  Returns None for unrecognized / empty payloads
    (quarantine — no lane claims them).

    Rules mirror the decoders' own dispatch byte-for-byte
    (``decode_image`` / ``decode_audio`` / ``real_video_frames``), so
    a sniffed row is one its lane can actually open:

    - RIFF container splits on the form type: ``AVI `` → video,
      ``WAVE`` → audio.  ISO BMFF (``ftyp`` at offset 4) → video.
    - GIF is the one genuinely ambiguous magic: ≥2 image descriptors
      (a cheap block walk — sub-block skipping, no LZW decode) →
      video (animated), else image (still).  A truncated/corrupt GIF
      sniffs as image and quarantines in the image lane's decoder.
    - FORM/AIFF, ``.snd`` (AU), ``fLaC`` → audio.
    - PNG / JPEG / TIFF / BMP / netpbm / TGA-heuristic (last, it has
      no magic) → image.
    """
    if not payload:
        return None
    p = bytes(payload[:16])
    if len(payload) >= 12 and p[:4] == b"RIFF":
        form = p[8:12]
        if form == b"AVI ":
            return "video"
        if form == b"WAVE":
            return "audio"
        return None
    if len(payload) >= 8 and p[4:8] == b"ftyp":
        return "video"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "video" if _gif_is_animated(bytes(payload)) else "image"
    if len(payload) >= 12 and p[:4] == b"FORM" and p[8:12] in (
        b"AIFF", b"AIFC",
    ):
        return "audio"
    if p[:4] == b".snd" or p[:4] == b"fLaC":
        return "audio"
    if (
        p[:8] == _PNG_MAGIC
        or p[:2] == b"\xff\xd8"
        or p[:4] in (b"II*\x00", b"MM\x00*")
        or p[:2] == b"BM"
        or (p[:1] == b"P" and p[1:2] in b"123456")
        or _looks_like_tga(bytes(payload[:18]))
    ):
        return "image"
    return None


def _gif_is_animated(payload: bytes) -> bool:
    """True when the GIF holds ≥2 image descriptors — a sub-block SKIP
    walk (length bytes only, LZW data never touched), so sniffing a
    large still costs header bytes, not a decode.  Any structural error
    answers False: the still-image lane owns the loud failure."""
    try:
        if len(payload) < 14:
            return False
        pos = 13
        if payload[10] & 0x80:
            pos += 3 * (2 ** ((payload[10] & 7) + 1))
        frames = 0
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:
                break
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
            elif b == 0x2C:  # image descriptor
                p2 = payload[pos + 9]
                pos += 10
                if p2 & 0x80:
                    pos += 3 * (2 ** ((p2 & 7) + 1))
                pos += 1  # LZW min-code byte
                frames += 1
                if frames >= 2:
                    return True
            else:
                return False
            # skip the sub-block chain (extension payload / LZW data)
            while pos < len(payload):
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
        return False
    except IndexError:
        # truncated walk (the loop indexes ahead of bounds checks);
        # struct is never used here — a stale struct.error in this
        # tuple was an unbound name that turned the quarantine into a
        # NameError crash on corrupt GIFs (r13 review)
        return False


def sniff_media_types(assets: DataFrame) -> DataFrame:
    """Relabel ``media_type`` from payload magic bytes — one Arrow map
    pass, schema preserved (``sniff_media_type`` per row; unrecognized
    payloads get ``"unknown"`` so no modality lane claims them).  The
    ``--media auto`` front door: downstream lanes keep filtering on
    ``media_type`` exactly as in single-media runs, so per-modality
    outputs are identical to three separate invocations with correct
    labels."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["media_type"] = [
                sniff_media_type(p) or "unknown" for p in out["payload"]
            ]
            yield out

    return assets.mapInPandas(batches, schema=assets.schema)


def media_keys_auto(
    assets: DataFrame,
    kind: str = "phash",
    n_mels: int = 16,
    n_frames: int = 5,
) -> DataFrame:
    """Mixed-media near-dup keys in ONE Arrow pass (round 14 — the
    ``--media auto`` ingest shape): each payload is sniffed by magic
    bytes (``sniff_media_type``) and keyed by ITS modality's extractor
    in the same batch — image → ``phash64`` (BIGINT), audio →
    ``fingerprint`` (array<double>, ``audio_dsp.mel_fingerprint``),
    video → ``frame_hashes`` (array<long>, evenly sampled frames, the
    ``videohash.video_hashes`` pick).  Off-modality key columns are
    NULL; unrecognized payloads get media_type ``"unknown"`` with all
    keys NULL (quarantine); per-row decode failures quarantine to a
    NULL key, never a job abort.

    Why fused: the chained form (``sniff_media_types`` →
    ``image_hashes`` → ``audio_fingerprints`` → ``video_hashes``)
    moves every payload across the Arrow boundary FOUR times — and
    worse, it CORRUPTS keys: a nullable int64 column (``phash64``)
    crossing a later extractor's Arrow pass coerces to float64 in
    pandas (int64 has no NaN) and silently loses low bits past 2^53
    (caught live in testing — a phash of ...008027 came back
    ...008128).  One fused pass means the bytes cross once and no key
    column ever re-enters pandas.  Value-identity with the per-lane
    single-media extractors is test-pinned, and the streaming twin
    (``streaming.incremental.media_keys_ingest``) runs this per
    micro-batch — map-only, so streamed == batch exactly."""
    from .audio_dsp import mel_fingerprint
    from .imagehash import image_phash64
    from .videohash import real_video_frames

    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")

    def keys(p) -> tuple[str, int | None, list | None, list | None]:
        mt = sniff_media_type(p) or "unknown"
        try:
            if mt == "image":
                return mt, image_phash64(bytes(p), kind), None, None
            if mt == "audio":
                d = decode_audio(bytes(p))
                return (
                    mt,
                    None,
                    mel_fingerprint(
                        d["samples"],
                        d["sample_rate"],
                        n_channels=d["n_channels"],
                        n_mels=n_mels,
                    ),
                    None,
                )
            if mt == "video":
                frames = real_video_frames(bytes(p))
                if not frames:
                    raise ValueError("no real frame decode path")
                return (
                    mt,
                    None,
                    None,
                    [
                        image_phash64(
                            frames[i * len(frames) // n_frames], kind
                        )
                        for i in range(n_frames)
                    ],
                )
        except Exception:
            return mt, None, None, None  # per-row quarantine
        return mt, None, None, None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = [keys(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": [c[0] for c in cols],
                    "phash64": pd.Series(
                        [c[1] for c in cols],
                        index=pdf.index,
                        dtype="object",
                    ),
                    "fingerprint": pd.Series(
                        [c[2] for c in cols],
                        index=pdf.index,
                        dtype="object",
                    ),
                    "frame_hashes": pd.Series(
                        [c[3] for c in cols],
                        index=pdf.index,
                        dtype="object",
                    ),
                }
            )

    schema = (
        "asset_id LONG, media_type STRING, phash64 LONG, "
        "fingerprint ARRAY<DOUBLE>, frame_hashes ARRAY<BIGINT>"
    )
    return assets.mapInPandas(batches, schema=schema)


def resize_image_real(payload: bytes, width: int, height: int) -> bytes:
    """Real decode → resample → re-encode.  Pillow (LANCZOS, any format)
    when importable; else stdlib decode + exact area-average (box)
    resampling + stdlib PNG encode (round 11 — antialiased downscales;
    was nearest-neighbor).  Output is always PNG on the stdlib path
    (Pillow keeps PNG too, for determinism across environments)."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        if payload[:8] == _PNG_MAGIC:
            d = _png_decode(payload)
        elif payload[:2] == b"\xff\xd8":
            from .jpeg import jpeg_decode

            d = jpeg_decode(payload)
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import gif_decode

            d = gif_decode(payload)
        elif payload[:4] in (b"II*\x00", b"MM\x00*"):
            from .tiff import tiff_decode

            d = tiff_decode(payload)
        elif payload[:2] == b"BM":
            from .bmp import bmp_decode

            d = bmp_decode(payload)
        elif payload[:1] == b"P" and payload[1:2] in b"123456":
            from .simple_images import pnm_decode

            d = pnm_decode(payload)
        elif _looks_like_tga(payload):
            from .simple_images import tga_decode

            d = tga_decode(payload)
        else:
            raise NotImplementedError(
                "resize beyond PNG, JPEG (baseline/progressive/lossless), "
                "GIF, baseline TIFF, BMP, netpbm, and TGA requires "
                "Pillow, not importable here"
            ) from None
        import numpy as np

        ch, sw, sh = d["channels"], d["width"], d["height"]
        src = np.frombuffer(d["pixels"], np.uint8).reshape(sh, sw, ch)
        # exact area-average (box) resampling, separable: out = Wy·S·Wxᵀ
        # per channel.  Each target pixel averages its exact fractional
        # source box, so downscales are antialiased (nearest-neighbor
        # aliases hard on thumbnails) and an upscale whose target box
        # falls inside one source pixel reduces to replication — the
        # same blocks nearest-neighbor produced.  Vectorized numpy,
        # O(H·sh + W·sw) weight build + two matmuls per image.
        wy = _box_weights(height, sh)
        wx = _box_weights(width, sw)
        # Factored two-matmul contraction (Wy·S, then ·Wxᵀ) — a single
        # three-operand einsum without optimize= evaluates the naive
        # O(H·W·sh·sw·C) loop (measured 25 s for one 800×800→64×64).
        tmp = np.tensordot(wy, src.astype(np.float64), axes=(1, 0))
        res = np.moveaxis(np.tensordot(tmp, wx, axes=(1, 1)), 2, 1)
        out = np.clip(np.round(res), 0, 255).astype(np.uint8)
        return _png_encode(width, height, ch, out.tobytes())
    img = Image.open(io.BytesIO(payload))
    buf = io.BytesIO()
    # Resampling.LANCZOS on modern Pillow; the module-level constant on old
    lanczos = getattr(getattr(Image, "Resampling", Image), "LANCZOS")
    img.resize((width, height), resample=lanczos).save(buf, format="PNG")
    return buf.getvalue()


def image_features(payload: bytes, dim: int = 4) -> list[float]:
    """Real image features: [width, height, channels, mean/255, ...]
    padded with per-channel means (dim > 4) or truncated (dim < 4).
    Deterministic given the payload — usable as a pytest oracle.

    Each mean is an O(pixels) scan, so (like ``audio_features``'s
    zero-crossing gate) a slot's scan only runs when the slot survives
    the ``dim`` cut — at the default dim=4 no per-channel work happens."""
    d = decode_image(payload)
    px, ch = d["pixels"], d["channels"]
    mean = (sum(px) / len(px) / 255.0) if px and dim >= 4 else 0.0
    feats = [float(d["width"]), float(d["height"]), float(ch), mean]
    for c in range(min(ch, max(0, dim - 4))):
        plane = px[c::ch]  # per-channel means fill any remaining dims
        feats.append((sum(plane) / len(plane) / 255.0) if plane else 0.0)
    return (feats + [0.0] * dim)[:dim]


def fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a feature extractor: ``dim`` doubles
    derived from the md5 of the payload (same formula the DuckDB oracle
    can reproduce: byte i of md5 / 255)."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(
    assets: DataFrame, dim: int = 4, decoder: str = "fake",
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps whole partitions streaming through Python in
    Arrow batches — no per-row serialization, no driver collection.

    ``decoder="fake"`` (default): the deterministic md5 features — the
    DuckDB-reproducible correctness-oracle path.
    ``decoder="real"``: actually decode — ``image_features`` /
    ``audio_features`` per ``media_type`` (Pillow/soundfile or the
    stdlib PNG/WAV fallbacks); other media types keep the fake features
    so mixed-modality frames still pass through in one plan.

    A corpus-scale ingest must not abort on one corrupt/truncated/
    codec-less asset, so real-decode failures quarantine PER ROW by
    default: the row keeps its n_bytes/byte_md5 audit columns and gets
    NULL features (downstream filters on ``features IS NULL`` find the
    quarantined assets).  ``strict=True`` restores loud failure for
    pipelines that want one bad asset to stop the job.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"decoder must be 'fake' or 'real', got {decoder!r}")

    def featurize(media_type: str, payload: bytes | None) -> list | None:
        if payload is None:
            return None
        payload = bytes(payload)
        try:
            if decoder == "real" and media_type == "image":
                return image_features(payload, dim)
            if decoder == "real" and media_type == "audio":
                return audio_features(payload, dim)
        except Exception:
            if strict:
                raise
            return None  # quarantined: bad payload degrades per-asset
        return fake_features(payload, dim)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "byte_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": [
                        featurize(m, b)
                        for m, b in zip(pdf["media_type"], payloads)
                    ],
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


def decode_audio(payload: bytes) -> dict[str, Any]:
    """Decode an audio payload to ``{sample_rate, n_channels, samples}``
    (``samples`` = floats in [-1, 1], channel-interleaved).

    soundfile when importable (WAV/FLAC/OGG...); otherwise the stdlib
    paths — ``operators/flac.py`` for FLAC (full bitstream: all
    subframe types, Rice partitions, stereo decorrelation) and
    ``operators/pcm_audio.py`` for AIFF, Sun AU, and WAV (round 11:
    PCM 8-32 bit, float32/64, G.711 µ-law/A-law, EXTENSIBLE — the
    stdlib ``wave`` module is no longer used).  ``NotImplementedError``
    only for formats none of those cover (e.g. MP3 without
    soundfile)."""
    import io

    try:
        import soundfile as sf  # type: ignore[import-not-found]
    except ImportError:
        pass
    else:
        data, rate = sf.read(io.BytesIO(payload), always_2d=True)
        return {
            "sample_rate": int(rate),
            "n_channels": int(data.shape[1]),
            "samples": [float(x) for row in data for x in row],
        }
    if payload[:4] == b"fLaC":
        from .flac import flac_decode

        return flac_decode(payload)
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        from .pcm_audio import aiff_decode

        return aiff_decode(payload)
    if payload[:4] == b".snd":
        from .pcm_audio import au_decode

        return au_decode(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # full WAV parser (round 11): PCM 8-32, float32/64, G.711
        # µ-law/A-law, and WAVE_FORMAT_EXTENSIBLE — supersedes the
        # stdlib `wave` fallback, which rejected everything but
        # integer PCM (telephony corpora are largely G.711 WAV)
        from .pcm_audio import wav_decode

        return wav_decode(payload)
    # Why MP3/OGG get no stdlib path while FLAC/JPEG/PNG/GIF did
    # (round-11 decision record): every shipped stdlib codec is
    # verifiable IN-CONTAINER because its entropy/table state is
    # either carried in the stream (JPEG ships its Huffman/quant
    # tables in DHT/DQT segments; FLAC its predictors per
    # subframe) or algorithmic (PNG zlib, GIF LZW, Rice codes).
    # MPEG audio is the opposite: the 34 Layer-III Huffman
    # codebooks (ISO 11172-3 Table B.7), the 512-tap synthesis
    # window (Table B.3), and the Layer-II allocation tables
    # (B.2a-d) are ~1k arbitrary constants that live in the SPEC,
    # not the stream.  With no network, reference decoder, or
    # sample files here, table data could only be reproduced from
    # memory and tested for SELF-consistency — an encoder/decoder
    # roundtrip cannot distinguish the standard's tables from any
    # other prefix-free set, so wrong data would pass every
    # in-container test and silently decode real-world MP3s to
    # garbage.  A loud guard is the correct behavior until
    # soundfile (or verified spec table data) is available.
    raise NotImplementedError(
        "audio decoding beyond WAV (PCM/float/G.711), FLAC, AIFF, and "
        "AU requires soundfile, which is not importable in this "
        "environment"
    )


def audio_features(payload: bytes, dim: int = 4) -> list[float]:
    """Real audio features: [sample_rate, n_channels, n_frames, rms];
    at dim >= 5, the zero-crossing rate; at dim >= 6, the remaining
    slots fill with the log-mel fingerprint (per-band mean/std of the
    Hann-rFFT-mel spectrogram, ``audio_dsp.mel_fingerprint`` — the
    duration-invariant embedding audio near-dup keys on).  Each tier's
    O(samples) work only runs when its slots survive the cut.
    Deterministic — pytest-oracle-able."""
    d = decode_audio(payload)
    s, nch = d["samples"], d["n_channels"]
    n_frames = len(s) // nch if nch else 0
    rms = (sum(x * x for x in s) / len(s)) ** 0.5 if s else 0.0
    feats = [float(d["sample_rate"]), float(nch), float(n_frames), rms]
    if dim >= 5:
        zc = sum(
            1 for i in range(1, len(s)) if (s[i - 1] < 0) != (s[i] < 0)
        ) / max(1, len(s) - 1)
        feats.append(zc)
    if dim >= 6:
        from .audio_dsp import mel_fingerprint

        n_mels = (dim - 5 + 1) // 2  # mean+std per band fill the tail
        feats.extend(
            mel_fingerprint(
                s, d["sample_rate"], n_channels=nch, n_mels=max(1, n_mels)
            )
        )
    return (feats + [0.0] * dim)[:dim]


def _fake_resized(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: a payload
    derived from (md5(payload), target dims).  Real impl decodes with a
    codec and re-encodes; only these bytes change, not the plumbing."""
    seed = hashlib.md5(
        payload + f":{width}x{height}".encode()
    ).digest()
    return seed * (width * height // len(seed) + 1)


def image_hashes(
    assets: DataFrame, kind: str = "phash", strict: bool = False
) -> DataFrame:
    """64-bit perceptual hash per image asset (round 11): asset columns
    plus a BIGINT ``phash64`` — the image near-dup key.  Arrow-batched
    ``mapInPandas``; non-image / NULL-payload rows get NULL, and decode
    failures quarantine PER ROW to NULL (the ``extract_features``
    contract) unless ``strict=True``.

    Scale shape: one map pass, no shuffle.  Candidate generation
    downstream is the SimHash idiom — band the 16 nibbles
    (``F.expr("(phash64 >> (4*b)) & 15")`` per band) and equi-join on
    (band, value), never all-pairs; verify with JVM-side
    ``F.bit_count(a ^ b)``.  See ``operators/imagehash`` for the hash
    math (area-average luma downscale + mean/gradient/DCT bits)."""
    from .imagehash import image_phash64

    def one(b) -> int | None:
        if b is None:
            return None
        try:
            return image_phash64(bytes(b), kind)
        except Exception:
            if strict:
                raise
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            is_img = out["media_type"] == "image"
            vals = [
                one(p) if ok else None
                for ok, p in zip(is_img, out["payload"])
            ]
            out["phash64"] = pd.array(vals, dtype="Int64")
            yield out

    schema = T.StructType(
        [*assets.schema.fields, T.StructField("phash64", T.LongType(), True)]
    )
    return assets.mapInPandas(batches, schema=schema)


def audio_fingerprints(
    assets: DataFrame, n_mels: int = 16, strict: bool = False
) -> DataFrame:
    """Duration-invariant log-mel fingerprint per audio asset (round
    11): asset columns plus ``fingerprint`` — ``array<double>`` of
    2·n_mels per-band mean/std stats (``audio_dsp.mel_fingerprint``).
    The audio analogue of ``image_hashes``: one Arrow map pass, non-
    audio / failed rows get NULL (the quarantine contract).  The column
    is embedding-shaped on purpose — it feeds the existing
    ``similarity``/``embedding_neardup`` operators (cosine top-k,
    LSH/IVF bucketing) without new machinery."""
    from .audio_dsp import mel_fingerprint

    def one(b) -> list | None:
        if b is None:
            return None
        try:
            d = decode_audio(bytes(b))
            return mel_fingerprint(
                d["samples"], d["sample_rate"],
                n_channels=d["n_channels"], n_mels=n_mels,
            )
        except Exception:
            if strict:
                raise
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            is_audio = out["media_type"] == "audio"
            out["fingerprint"] = [
                one(p) if ok else None
                for ok, p in zip(is_audio, out["payload"])
            ]
            yield out

    schema = T.StructType(
        [
            *assets.schema.fields,
            T.StructField(
                "fingerprint", T.ArrayType(T.DoubleType()), True
            ),
        ]
    )
    return assets.mapInPandas(batches, schema=schema)


def audio_fingerprint_pairs(
    fps: DataFrame,
    id_col: str = "asset_id",
    fp_col: str = "fingerprint",
    threshold: float = 0.95,
    n_planes: int = 4,
    max_bucket: int | None = 10_000,
    log_capped: bool = False,
) -> DataFrame:
    """Near-dup pairs over a fingerprint frame — the audio lane's pair
    stage, factored out of ``audio_neardup_clusters`` (round 13) so the
    driver-oracle query ``audio_neardup_pairs`` can exercise it over
    synthesized fingerprints the way ``video_neardup_pairs`` feeds
    ``videohash.video_pairs`` synthesized frame hashes.  Input is any
    (id, array<double>) frame — typically ``audio_fingerprints`` output
    with NULLs filtered; returns (id_a, id_b, score_q3) with cosine
    quantized to the 1e-3 grid.

    Two-stage shape, the ``hamming_pairs`` contract: bit-identical
    fingerprints (re-ingests, silent/constant clips) collapse to star
    edges (score 1000) from the min-id representative BEFORE the LSH
    self-join — connected components are unchanged because identical
    vectors have identical cosine relations — and only representatives
    enter ``similarity.embedding_neardup_pairs`` (hyperplane-LSH
    buckets, exact-cosine verify, ``max_bucket`` hot-bucket cap)."""
    from pyspark.sql import Window

    from .similarity import embedding_neardup_pairs

    base = fps.where(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("asset_id"), F.col(fp_col).alias("fingerprint")
    )
    from .skew import pin

    tagged = pin(
        base.withColumn(
            "rep",
            F.min("asset_id").over(Window.partitionBy("fingerprint")),
        )
    )
    star = tagged.where(F.col("asset_id") != F.col("rep")).select(
        F.col("rep").alias("id_a"),
        F.col("asset_id").alias("id_b"),
        F.lit(1000).cast("long").alias("score_q3"),  # cosine 1.0 on the grid
    )
    reps = tagged.where(F.col("asset_id") == F.col("rep")).select(
        "asset_id", "fingerprint"
    )
    # max_bucket guards the residual near-identical-but-not-equal
    # cohort (the collapse above only absorbs BIT-identical prints):
    # a hot LSH bucket past the cap drops from candidate generation
    # instead of going quadratic — the hamming_pairs cap contract
    pairs = embedding_neardup_pairs(
        reps,
        id_col="asset_id",
        vec_col="fingerprint",
        threshold=threshold,
        n_planes=n_planes,
        max_bucket=max_bucket,
        log_capped=log_capped,
    ).withColumn("score_q3", F.col("score_q3").cast("long"))
    return pairs.unionByName(star)


def audio_neardup_clusters(
    assets: DataFrame,
    n_mels: int = 16,
    threshold: float = 0.95,
    n_planes: int = 4,
    max_bucket: int | None = 10_000,
    log_capped: bool = False,
) -> DataFrame:
    """End-to-end audio near-dup grouping (round 12 — the audio twin of
    ``imagehash.image_neardup_clusters``): log-mel fingerprint column
    (one Arrow map pass) → hyperplane-LSH-bucketed cosine pairs at
    ``threshold`` (``similarity.embedding_neardup_pairs`` — bucketed,
    never all-pairs) → the shared connected-components machinery.
    Returns (asset_id, cluster_id) for every fingerprinted asset,
    singletons included; non-audio / undecodable rows carry no
    fingerprint and are excluded (the quarantine contract).

    The fingerprint is duration- and container-invariant
    (``audio_dsp.mel_fingerprint``), so the same clip re-encoded
    WAV↔AIFF↔AU or resampled clusters together while distinct program
    material does not — the CLI exposes ``threshold`` and ``n_planes``
    (2^n_planes LSH buckets: the corpus-scale knob, exactly as
    ``hyperplane_buckets`` documents).

    Identical fingerprints (bit-for-bit re-ingests, silent/constant
    clips — the audio analogue of the constant-pHash cohort) collapse
    to star edges from the min-id representative BEFORE the LSH
    self-join, the round-12 ``hamming_pairs`` contract: a 10k-identical
    cohort contributes ONE row per bucket instead of a quadratic
    in-bucket clique, and connected components are unchanged (identical
    vectors have identical cosine relations, so the rep inherits every
    ≥-threshold pair a member had)."""
    from .dedup import cluster_duplicates

    # one decode+fingerprint pass feeds the pair join AND the label
    # join — same single-barrier rationale as the image lane
    from .skew import pin

    fps = pin(
        audio_fingerprints(assets, n_mels=n_mels)
        .where(F.col("fingerprint").isNotNull())
        .select("asset_id", "fingerprint"),
        eager=True,
    )
    pairs = audio_fingerprint_pairs(
        fps,
        threshold=threshold,
        n_planes=n_planes,
        max_bucket=max_bucket,
        log_capped=log_capped,
    )
    clustered = cluster_duplicates(pairs, id_a="id_a", id_b="id_b")
    return fps.join(
        clustered, fps.asset_id == clustered.doc_id, "left"
    ).select(
        "asset_id",
        F.coalesce(F.col("cluster_id"), F.col("asset_id")).alias(
            "cluster_id"
        ),
    )


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64,
    decoder: str = "fake", strict: bool = False,
) -> DataFrame:
    """Resize every image payload to (width, height) — asset schema in,
    asset schema out, so resizes compose with any other asset operator.

    Plumbing is real (Arrow batches, meta updated with the new dims,
    non-image rows pass through untouched).  ``decoder="real"`` runs
    ``resize_image_real`` (Pillow or the stdlib PNG codec path);
    ``"fake"`` keeps the deterministic md5 stand-in the oracle uses.

    Real-decode failures quarantine PER ROW by default (same contract
    as ``extract_features``): the bad asset's payload becomes NULL and
    its meta gains ``resize_error`` (never silently keeping the
    original bytes, which would claim a resize that didn't happen);
    ``strict=True`` restores loud failure.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"decoder must be 'fake' or 'real', got {decoder!r}")

    def one(b: bytes) -> bytes | None:
        try:
            if decoder == "real":
                return resize_image_real(bytes(b), width, height)
            return _fake_resized(bytes(b), width, height)
        except Exception:
            if strict:
                raise
            return None  # quarantined; meta marks the failure below

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            is_img = (out["media_type"] == "image") & out["payload"].notna()
            resized = out.loc[is_img, "payload"].map(one)
            out.loc[is_img, "payload"] = resized
            ok = resized.notna()
            out.loc[is_img, "meta"] = [
                {
                    **(dict(m) if m is not None else {}),
                    **(
                        {"width": str(width), "height": str(height)}
                        if good
                        else {"resize_error": "decode_failed"}
                    ),
                }
                for m, good in zip(out.loc[is_img, "meta"], ok)
            ]
            yield out

    return assets.mapInPandas(batches, ASSET_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Walk a RIFF/AVI container and return the video stream's frame
    payloads — the ``##dc``/``##db`` chunks inside ``LIST movi``.  For
    an MJPEG AVI each returned frame is a STANDALONE baseline JPEG
    decodable by ``operators/jpeg.jpeg_decode``, which makes the whole
    video path (container seek → frame extract → pixel decode) real in
    a codec-less container.  Header lists (hdrl/avih/strh/strf) are
    walked and skipped — frame extraction needs only the movi chunks.
    RIFF chunks are word-aligned (odd sizes pad one byte)."""
    import struct

    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            data_start = pos + 8
            data_end = min(data_start + size, len(payload))
            if fourcc in (b"RIFF", b"LIST"):
                walk(data_start + 4, data_end)  # skip the list-type tag
            elif (
                fourcc[2:4] in (b"dc", b"db")
                and fourcc[:2].isdigit()
                and size > 0
            ):
                frames.append(payload[data_start:data_end])
            pos = data_start + size + (size & 1)

    walk(0, len(payload))
    return frames


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames from each video payload —
    a row-expanding mapInPandas (one input row → n output rows), the shape
    a real video pipeline needs.  Non-video rows produce no frames.

    RIFF/AVI and ISO BMFF (MP4/MOV) payloads get REAL container
    seeking: the ``LIST movi`` chunk walk / the moov sample tables
    extract the actual frame bytestreams and the evenly-spaced pick
    indexes real frames (for MJPEG each one is a standalone JPEG —
    decodable downstream by ``decode_image``).  Animated GIFs
    composite their real frames once and re-encode each sampled one as
    PNG.  Other containers (MKV needs a real demuxer; inter-coded MP4
    tracks need the optional libs) fall back to
    the deterministic span-slicing fake — and so does any payload whose
    container walk FAILS (truncated download with a valid magic): a
    corpus-ingest operator must quarantine per row, never abort the
    job (the ``extract_features`` convention).  Each payload's
    container is walked/decoded ONCE, not once per sampled frame.  The
    expansion factor is bounded per batch, so executor memory stays
    O(batch × n_frames).  Asset meta passes through unchanged on every
    frame row (row repetition keeps the Arrow column backing — freshly
    built map columns don't round-trip).
    """

    def real_frames(p: bytes) -> list[bytes] | None:
        """Per-payload container walk, run ONCE per row: a list of
        standalone frame payloads, or None → span-slicing fallback.
        Any failure quarantines to None rather than raising — BOTH
        corrupt payloads (ValueError) and valid payloads hitting an
        unsupported feature (NotImplementedError, e.g. GIF disposal 3):
        bulk ingest must never abort on one row, so the loud-guard
        contract belongs to the direct ``gif_frames``/``decode_image``
        calls, and here unsupported degrades to the deterministic
        fallback like any other undecodable payload.  The dispatch is
        shared with the video near-dup lane (round 12) — one walk
        table for both consumers."""
        from .videohash import real_video_frames

        return real_video_frames(p)

    def frame_at(p: bytes, real: list[bytes] | None, i: int) -> bytes:
        if real:
            return real[i * len(real) // n_frames]
        span = max(1, len(p) // n_frames)
        return p[i * span : (i + 1) * span]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            video = pdf[
                (pdf["media_type"] == "video") & pdf["payload"].notna()
            ]
            if video.empty:
                continue
            # one bytes() conversion AND one container walk per row —
            # the n_frames repetition only indexes the caches
            pays = [bytes(p) for p in video["payload"]]
            cache = [real_frames(p) for p in pays]
            rep = video.loc[video.index.repeat(n_frames)]
            idx = list(range(n_frames)) * len(video)
            frames = [
                frame_at(pays[r // n_frames], cache[r // n_frames], i)
                for r, i in enumerate(idx)
            ]
            out = pd.DataFrame(
                {
                    "asset_id": rep["asset_id"].values,
                    "frame_idx": pd.array(idx, dtype="int32"),
                    "frame": frames,
                }
            )
            out["meta"] = rep["meta"].values
            yield out

    return assets.mapInPandas(batches, FRAME_SCHEMA)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload so the
    multimodal path can be exercised (and oracle-checked) on the synthetic
    ``documents`` table."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
