"""Perceptual image hashing for near-dup image dedup — pure numpy.

Round 11: the image-side analogue of the text MinHash / audio mel
fingerprints — a 64-bit perceptual hash whose Hamming distance is small
for visually-near-duplicate images (re-encodes, resizes, mild noise)
and ~32 for unrelated ones.  All three classic variants, every one
algorithmic (box-resample + mean/gradient/DCT — no spec tables, fully
verifiable in-container):

- ``ahash``: 8×8 box-downscale of the luma, bit = pixel > mean.
- ``dhash``: 9×8 downscale, bit = horizontal gradient sign.
- ``phash``: 32×32 downscale → 2D DCT-II → top-left 8×8 low-frequency
  block (DC excluded), bit = coefficient > median.

The hash is a BIGINT column at scale: banding its nibbles (the SimHash
LSH idiom, ``operators/dedup.simhash_*``) buckets candidates without
all-pairs — pair generation stays bucket-bounded exactly like the text
path.  Hamming distance is ``bit_count(a ^ b)`` — JVM-side
``F.bit_count`` — so verify stages never leave the JVM.
"""

from __future__ import annotations

import numpy as np


def _luma(pixels: bytes, w: int, h: int, ch: int) -> np.ndarray:
    a = np.frombuffer(pixels, np.uint8).reshape(h, w, ch).astype(np.float64)
    if ch == 1:
        return a[:, :, 0]
    if ch == 2:  # gray+alpha
        return a[:, :, 0]
    # BT.601 luma; alpha (ch=4) ignored
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def _downscale(img: np.ndarray, dw: int, dh: int) -> np.ndarray:
    """Exact area-average downscale (the resize_image_real weights)."""
    from .multimodal import _box_weights

    wy = _box_weights(dh, img.shape[0])
    wx = _box_weights(dw, img.shape[1])
    return wy @ img @ wx.T


def _bits_to_int(bits: np.ndarray) -> int:
    v = 0
    for b in bits.reshape(-1):
        v = (v << 1) | int(bool(b))
    return v


def ahash(pixels: bytes, w: int, h: int, ch: int) -> int:
    """64-bit average hash: 8×8 luma, bit = cell > mean."""
    small = _downscale(_luma(pixels, w, h, ch), 8, 8)
    return _bits_to_int(small > small.mean())


def dhash(pixels: bytes, w: int, h: int, ch: int) -> int:
    """64-bit difference hash: 9×8 luma, bit = left < right neighbor."""
    small = _downscale(_luma(pixels, w, h, ch), 9, 8)
    return _bits_to_int(small[:, 1:] > small[:, :-1])


def _dct2(block: np.ndarray) -> np.ndarray:
    n = block.shape[0]
    x = np.arange(n, dtype=np.float64)
    c = np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / (2.0 * n))
    return c @ block @ c.T


def phash(pixels: bytes, w: int, h: int, ch: int) -> int:
    """64-bit DCT hash: 32×32 luma → 2D DCT-II → 8×8 low-frequency
    corner, DC replaced by the block median comparison (the standard
    pHash recipe: bit = coefficient > median of the 64)."""
    small = _downscale(_luma(pixels, w, h, ch), 32, 32)
    low = _dct2(small)[:8, :8].copy()
    low[0, 0] = 0.0  # DC carries overall brightness, not structure
    med = np.median(low)
    return _bits_to_int(low > med)


def image_phash64(payload: bytes, kind: str = "phash") -> int:
    """Decode (any stdlib-supported format) → 64-bit perceptual hash.
    ``kind`` in {ahash, dhash, phash}.  Returned as a SIGNED 64-bit int
    (two's complement) so it round-trips a Spark/parquet BIGINT column
    exactly."""
    from .multimodal import decode_image

    fns = {"ahash": ahash, "dhash": dhash, "phash": phash}
    if kind not in fns:
        raise ValueError(f"kind must be one of {sorted(fns)}, got {kind!r}")
    d = decode_image(payload)
    v = fns[kind](d["pixels"], d["width"], d["height"], d["channels"])
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two signed-64 perceptual hashes (the
    python-side twin of ``F.bit_count(F.col(a).bitwiseXOR(b))``)."""
    return int(bin(((a ^ b) & ((1 << 64) - 1))).count("1"))


# --- Spark-side near-dup pipeline (the SimHash pigeonhole idiom) --------------


def phash_pairs(
    hashes,
    id_col: str = "asset_id",
    hash_col: str = "phash64",
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    log_capped: bool = False,
):
    """Near-dup image pairs with perceptual-hash Hamming distance ≤
    ``max_hamming`` — the image twin of ``dedup.simhash_pairs``.

    Candidates come from the pigeonhole trick: split the 64-bit hash
    into ``max_hamming + 1`` chunks; any pair within distance k shares
    at least one exact chunk — bucket equi-join on (chunk_idx,
    chunk_value), then verify the FULL distance with JVM-side
    ``bit_count(xor)``.  Never an all-pairs product.  The guarantee is
    exact only for the configured radius: chasing pHash's ~10-bit
    near-dup radius directly would need 11 chunks of 5 bits (32 buckets
    per position — quadratic at corpus scale), so production runs the
    exact radius-3 pass and treats anything farther as a second-pass /
    embedding problem, same trade the text SimHash path documents.

    Delegates to the shared pigeonhole generator
    (``dedup.hamming_pairs`` — also behind ``simhash_pairs``), which
    uses ``shiftrightunsigned`` so the signed-64 hash column's sign bit
    can't smear into high chunks and collapse buckets, collapses
    identical-hash cohorts to star edges (a constant-pHash crawl
    segment stays linear), and caps hot buckets at ``max_bucket``."""
    from .dedup import hamming_pairs

    return hamming_pairs(
        hashes, id_col, hash_col, max_hamming, bits=64,
        out_a="img_a", out_b="img_b",
        max_bucket=max_bucket, log_capped=log_capped,
    )


def image_neardup_clusters(
    assets,
    kind: str = "phash",
    max_hamming: int = 3,
    log_capped: bool = False,
):
    """End-to-end image near-dup grouping: hash column (one map pass) →
    pigeonhole pair generation → the shared connected-components
    machinery (``dedup.cluster_duplicates`` — pointer jumping with
    checkpoint lineage cuts).  Returns (asset_id, cluster_id) for every
    hashed image, singletons included."""
    from pyspark.sql import functions as F

    from .dedup import cluster_duplicates
    from .skew import pin

    # materialize the decode+hash map pass ONCE: it feeds the pair
    # self-join and the final label join, and without the barrier each
    # consumer re-decodes every image (the dominant cost) — the same
    # rationale cluster_duplicates documents for its edges
    hashes = (
        image_hashes_df(assets, kind)
        .where(F.col("phash64").isNotNull())
        .select("asset_id", "phash64")
    )
    hashes = pin(hashes, eager=True)
    pairs = phash_pairs(
        hashes, max_hamming=max_hamming, log_capped=log_capped
    )
    clustered = cluster_duplicates(pairs, id_a="img_a", id_b="img_b")
    return hashes.join(
        clustered, hashes.asset_id == clustered.doc_id, "left"
    ).select(
        "asset_id",
        F.coalesce(F.col("cluster_id"), F.col("asset_id")).alias(
            "cluster_id"
        ),
    )


def image_hashes_df(assets, kind: str = "phash"):
    """Late import wrapper so this module stays importable without the
    multimodal module's pandas dependency at import time."""
    from .multimodal import image_hashes

    return image_hashes(assets, kind)
