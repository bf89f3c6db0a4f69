"""Video near-dup keys and clustering — the third media lane (round 12).

Images key on one 64-bit perceptual hash (``imagehash``), audio on a
log-mel fingerprint (``audio_dsp``); a video's near-dup key is the
SEQUENCE of perceptual hashes of evenly-sampled REAL frames.  Two cuts
of the same footage (re-encode, container swap, prepended intro) share
many frame hashes within a small Hamming radius even when no byte is
equal, while unrelated footage shares none.

Scale shape, end to end:

- ``video_hashes``: one Arrow map pass per asset — container demux
  (AVI/MP4 MJPEG, animated GIF — the stdlib-verified surfaces) →
  ``n_frames`` evenly-sampled frames → 64-bit pHash each →
  ``array<long> frame_hashes``.  Payload bytes never leave the
  executor; undecodable/inter-coded containers quarantine to NULL (the
  span-slicing fake ``sample_frames`` falls back to is fine for
  PLUMBING tests but its bytes are not pixels, so hashing it would
  manufacture false near-dups — quarantine is the honest key here).
- ``video_neardup_clusters``: explode to (frame_key, hash) and reuse
  the shared pigeonhole generator ``dedup.hamming_pairs`` — collapse,
  hot-bucket cap and all — then aggregate frame-pair matches to video
  pairs, threshold at ``min_matches``, and label components with the
  shared ``cluster_duplicates``.  Every stage is a bucket-bounded
  equi-join or a hash aggregate; nothing is all-pairs.

Threshold semantics: ``min_matches`` counts DISTINCT unordered
matched hash-value pairs per DIRECT video pair (freeze-frame repeats
count once; no third video can perturb a pair's count — see
``video_pairs``); clusters are the connected components OVER those
pairs, so two videos can share a cluster through a third even if
their direct match count is below threshold.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .skew import pin

log = logging.getLogger(__name__)


def real_video_frames(payload: bytes) -> list[bytes] | None:
    """Container demux for the stdlib-verified video surfaces: a list
    of standalone image payloads (JPEG for MJPEG tracks, PNG for GIF
    frames), or None when the container is unsupported or the walk
    fails — per-row quarantine, never a job abort (the
    ``extract_features`` convention ``multimodal.sample_frames``
    documents)."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from .multimodal import _avi_mjpeg_frames

            return _avi_mjpeg_frames(payload) or None
        if payload[4:8] == b"ftyp":  # ISO BMFF (MP4/MOV)
            from .mp4 import mp4_mjpeg_frames

            return mp4_mjpeg_frames(payload) or None
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import gif_frames
            from .multimodal import _png_encode

            return [
                _png_encode(
                    fr["width"], fr["height"], fr["channels"], fr["pixels"]
                )
                for fr in gif_frames(payload)
            ]
    except Exception:
        return None
    return None


def video_hashes(
    assets: DataFrame,
    kind: str = "phash",
    n_frames: int = 5,
    strict: bool = False,
) -> DataFrame:
    """Per-video frame-hash key: asset columns plus ``frame_hashes``
    (array<long>, length ``n_frames``, evenly sampled — frame i is
    ``real[i * len(real) // n_frames]``, the ``sample_frames`` pick).
    Non-video / NULL-payload rows and containers without a real decode
    path get NULL (``strict=True`` restores loud failure)."""
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    import pandas as pd

    from pyspark.sql import types as T

    from .imagehash import image_phash64

    def one(b) -> list | None:
        if b is None:
            return None
        try:
            frames = real_video_frames(bytes(b))
            if not frames:
                raise ValueError("no real frame decode path")
            return [
                image_phash64(frames[i * len(frames) // n_frames], kind)
                for i in range(n_frames)
            ]
        except Exception:
            if strict:
                raise
            return None

    def batches(it):
        for pdf in it:
            out = pdf.copy()
            is_video = out["media_type"] == "video"
            out["frame_hashes"] = pd.Series(
                [
                    one(p) if ok else None
                    for ok, p in zip(is_video, out["payload"])
                ],
                index=out.index,
                dtype="object",
            )
            yield out

    schema = T.StructType(
        [
            *assets.schema.fields,
            T.StructField(
                "frame_hashes", T.ArrayType(T.LongType()), True
            ),
        ]
    )
    return assets.mapInPandas(batches, schema=schema)


def video_pairs(
    hashes: DataFrame,
    id_col: str = "asset_id",
    hashes_col: str = "frame_hashes",
    max_hamming: int = 3,
    min_matches: int = 2,
    max_bucket: int | None = 10_000,
    max_value_df: int | None = 10_000,
    log_capped: bool = False,
) -> DataFrame:
    """Video near-dup pairs: ``n_matches`` = the number of DISTINCT
    unordered frame-hash-VALUE pairs within ``max_hamming`` between the
    two videos' distinct hash sets, thresholded at ``min_matches``.
    Returns (vid_a, vid_b, n_matches) with vid_a < vid_b.

    Matching runs at HASH-VALUE level (round-12 review fix): the
    generator's exact-hash collapse routes identical hashes through a
    global min-id representative, so counting its edges per video pair
    both undercounts (a third video owning the rep steals a legit
    match) and inflates (star fan-out from one repeated freeze-frame).
    Instead the pigeonhole generator pairs the DISTINCT hash values
    (id == the value, so no two rows share a hash and no star edges
    exist), identical shared values match through an identity term,
    and per-video-pair counting is countDistinct over the canonical
    value pair — freeze-frame repeats count once, and no third video
    can perturb a pair's count.  Every stage stays bucket-bounded; no
    frame-key packing, so asset ids have no range restriction.

    ``max_value_df`` is the identity-term guard the pigeonhole's own
    bucket cap cannot provide: a frame value present in more than this
    many VIDEOS (black frames, title cards, network idents — present
    in a large fraction of any real crawl) would fan the identity join
    out quadratically (V videos sharing one value → V² match rows).
    Ubiquitous frames carry no discriminative signal, so they drop
    from matching entirely — the ``ngram_jaccard_pairs`` ``max_df``
    stop-shingle trade: only pairs whose EVERY shared frame is
    ubiquitous are missed.  ``None`` disables; ``log_capped=True``
    logs what was dropped (INFO on this module's logger)."""
    from .dedup import hamming_pairs

    frames = (
        hashes.where(F.col(hashes_col).isNotNull())
        .select(
            F.col(id_col).alias("vid"),
            F.explode(hashes_col).alias("fhash"),
        )
        .distinct()  # per-video distinct hash values
    )
    if max_value_df is not None:
        vw = Window.partitionBy("fhash")
        frames = frames.withColumn("vdf", F.count("*").over(vw))
        if log_capped and not hashes.isStreaming:
            frames = pin(frames)
            hot = (
                frames.where(F.col("vdf") > max_value_df)
                .agg(
                    F.countDistinct("fhash").alias("n_values"),
                    F.max("vdf").alias("largest"),
                )
                .collect()[0]
            )
            if hot["n_values"]:
                log.warning(
                    "video_pairs: dropped %s ubiquitous frame value(s) "
                    "in over %s videos (largest %s) — black frames/"
                    "title cards carry no matching signal",
                    hot["n_values"], max_value_df, hot["largest"],
                )
        frames = frames.where(F.col("vdf") <= max_value_df).drop("vdf")
    # frames feeds THREE consumers (both match-join sides + the value
    # set) whose differing pruning defeats ReuseExchange — pin it once
    # (the hamming_pairs tagged-frame lesson; lazy, so plan build stays
    # job-free)
    frames = pin(frames)
    vals = frames.select(F.col("fhash").alias("hv")).distinct()
    vpairs = hamming_pairs(
        vals.select(F.col("hv").alias("h_id"), "hv"),
        "h_id", "hv", max_hamming, 64,
        out_a="v_a", out_b="v_b",
        max_bucket=max_bucket, log_capped=log_capped,
    ).select("v_a", "v_b")
    # symmetric closure + the identity term (identical values shared
    # across videos ARE distance-0 matches)
    sym = (
        vpairs.unionByName(
            vpairs.select(
                F.col("v_b").alias("v_a"), F.col("v_a").alias("v_b")
            )
        )
        .unionByName(
            vals.select(F.col("hv").alias("v_a"), F.col("hv").alias("v_b"))
        )
    )
    fa = frames.select(F.col("vid").alias("vida"), F.col("fhash").alias("v_a"))
    fb = frames.select(F.col("vid").alias("vidb"), F.col("fhash").alias("v_b"))
    m = (
        fa.join(sym, "v_a")
        .join(fb, "v_b")
        .where(F.col("vida") != F.col("vidb"))
    )
    return (
        m.select(
            F.least("vida", "vidb").alias("vid_a"),
            F.greatest("vida", "vidb").alias("vid_b"),
            F.least("v_a", "v_b").alias("pv_a"),
            F.greatest("v_a", "v_b").alias("pv_b"),
        )
        .groupBy("vid_a", "vid_b")
        .agg(F.count_distinct("pv_a", "pv_b").alias("n_matches"))
        .where(F.col("n_matches") >= min_matches)
    )


def video_neardup_clusters(
    assets: DataFrame,
    kind: str = "phash",
    n_frames: int = 5,
    max_hamming: int = 3,
    min_matches: int = 2,
    log_capped: bool = False,
) -> DataFrame:
    """End-to-end video near-dup grouping — the video twin of
    ``imagehash.image_neardup_clusters`` / ``multimodal.
    audio_neardup_clusters``: hash column (one map pass, materialized
    ONCE — the demux+decode is the dominant cost) → frame-level
    pigeonhole pairs → video-pair threshold → shared connected
    components.  Returns (asset_id, cluster_id) for every hashed
    video, singletons included."""
    from .dedup import cluster_duplicates

    vh = (
        video_hashes(assets, kind, n_frames)
        .where(F.col("frame_hashes").isNotNull())
        .select("asset_id", "frame_hashes")
    )
    vh = pin(vh, eager=True)
    vp = video_pairs(
        vh, max_hamming=max_hamming,
        min_matches=min_matches, log_capped=log_capped,
    )
    clustered = cluster_duplicates(vp, id_a="vid_a", id_b="vid_b")
    return vh.join(
        clustered, vh.asset_id == clustered.doc_id, "left"
    ).select(
        "asset_id",
        F.coalesce(F.col("cluster_id"), F.col("asset_id")).alias(
            "cluster_id"
        ),
    )
