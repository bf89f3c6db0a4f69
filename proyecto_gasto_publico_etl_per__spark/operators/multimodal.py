"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — the one place this engine crosses into
Python, because byte-level media decoding is genuinely inexpressible in
Spark SQL.  The Spark-side plumbing (schemas, batch iteration, partition
parallelism) is real and tested; the actual codec calls are STUBBED — the
image/audio libraries are not in this container — behind
``NotImplementedError`` plus a deterministic fake used by tests and the
correctness oracle.

Scale notes: media bytes never pass through the driver; each Arrow batch
is decoded inside its executor task.  Keep batches small via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when rows carry megabyte
blobs, and store blobs in their own column family (parquet column) so
metadata-only queries never read them (column pruning).
"""

from __future__ import annotations

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


def decode_image(payload: bytes) -> Any:
    """Real decode — requires an image codec (PIL/cv2), absent here."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "container; use fake_features() for the deterministic test path"
    )


def fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a feature extractor: ``dim`` doubles
    derived from the md5 of the payload (same formula the DuckDB oracle
    can reproduce: byte i of md5 / 255)."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(assets: DataFrame, dim: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps whole partitions streaming through Python in
    Arrow batches — no per-row serialization, no driver collection.
    """

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
                    "features": payloads.map(
                        lambda b: fake_features(b, dim)
                        if b is not None
                        else None
                    ),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


def decode_audio(payload: bytes) -> Any:
    """Real decode — requires an audio codec (soundfile/librosa), absent here."""
    raise NotImplementedError(
        "audio decoding requires a codec library not present in this "
        "container; the plumbing operators use deterministic fakes"
    )


def _fake_resized(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: a payload
    derived from (md5(payload), target dims).  Real impl decodes with a
    codec and re-encodes; only these bytes change, not the plumbing."""
    seed = hashlib.md5(
        payload + f":{width}x{height}".encode()
    ).digest()
    return seed * (width * height // len(seed) + 1)


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Resize every image payload to (width, height) — asset schema in,
    asset schema out, so resizes compose with any other asset operator.

    Plumbing is real (Arrow batches, meta updated with the new dims,
    non-image rows pass through untouched); the codec call is the
    deterministic fake above.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            is_img = (out["media_type"] == "image") & out["payload"].notna()
            out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(
                lambda b: _fake_resized(bytes(b), width, height)
            )
            out.loc[is_img, "meta"] = out.loc[is_img, "meta"].map(
                lambda m: {
                    **(dict(m) if m is not None else {}),
                    "width": str(width),
                    "height": str(height),
                }
            )
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


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames from each video payload —
    a row-expanding mapInPandas (one input row → n output rows), the shape
    a real video pipeline needs.  Non-video rows produce no frames.

    The fake 'decoder' slices the payload into n_frames spans; a real one
    would seek the container. The expansion factor is bounded per batch,
    so executor memory stays O(batch × n_frames).  Asset meta passes
    through unchanged on every frame row (row repetition keeps the Arrow
    column backing — freshly built map columns don't round-trip).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            video = pdf[
                (pdf["media_type"] == "video") & pdf["payload"].notna()
            ]
            if video.empty:
                continue
            rep = video.loc[video.index.repeat(n_frames)]
            idx = list(range(n_frames)) * len(video)
            frames = [
                bytes(p)[
                    i * max(1, len(bytes(p)) // n_frames) : (i + 1)
                    * max(1, len(bytes(p)) // n_frames)
                ]
                for p, i in zip(rep["payload"], idx)
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
