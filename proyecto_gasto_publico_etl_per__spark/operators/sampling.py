"""Deterministic sampling for training-data pipelines.

``df.sample(seed=...)`` is only reproducible for a fixed partitioning —
repartition the input and the sample changes.  Hash-based sampling is the
scale-correct alternative: membership depends only on the row's key, so
the sample is stable across runs, partitionings, engines, and incremental
loads (a document keeps its in/out status forever — critical when a
corpus is resampled after appends).

Both operators are pure column expressions (md5 → bucket in [0, 10000)),
mirrored exactly by the DuckDB oracles of the declared queries.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket resolution: fractions are exact multiples of 0.01%
BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str = "sample") -> Column:
    """Stable bucket in [0, BUCKETS) from the md5 of (salt, key)."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % BUCKETS
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (deterministic).

    Rows with a NULL key hash to NULL and are always excluded — sample
    on a non-null key (or coalesce first) if NULL rows must be eligible.
    """
    return df.filter(hash_bucket(key_col, salt) < int(fraction * BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. keep 100% of rare
    languages and 5% of English.  Strata not listed keep ``default``."""
    threshold: Column = F.lit(int(default * BUCKETS))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * BUCKETS))
        ).otherwise(threshold)
    return df.filter(hash_bucket(key_col, salt) < threshold)


def dataset_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.01,
    test_fraction: float = 0.01,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash.

    The same key lands in the same split forever — across runs,
    partitionings, engines, and incremental corpus appends (the property
    that prevents eval-set contamination when a corpus is re-split after
    new data lands).  Buckets: [0, val) → val, [val, val+test) → test,
    rest → train.
    """
    val_t = int(val_fraction * BUCKETS)
    test_t = val_t + int(test_fraction * BUCKETS)
    b = hash_bucket(key_col, salt)
    return df.withColumn(
        "split",
        F.when(b < val_t, F.lit("val"))
        .when(b < test_t, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def cluster_split(
    df: DataFrame,
    cluster_labels: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.01,
    test_fraction: float = 0.01,
    salt: str = "split",
) -> DataFrame:
    """Leakage-free train/val/test split: near-duplicate documents land
    in the SAME split.

    Splitting on the document id puts two near-identical documents on
    opposite sides of the train/eval fence — the eval set then "tests"
    memorized training text (the classic contamination path a plain
    ``dataset_split`` cannot see).  The split key is the document's
    duplicate-CLUSTER id (``cluster_labels`` = the
    ``cluster_duplicates`` output, (doc_id, cluster_id)); unpaired
    documents fall back to their own id, preserving the 98/1/1
    proportions.  Same deterministic hash-bucket mechanics as
    ``dataset_split``, so assignments survive re-splits and appends.

    Scale: one left join against the (pairs-sized, far smaller than the
    corpus) label table, then the map-only bucket expression.
    """
    labels = cluster_labels.select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    keyed = df.join(labels, id_col, "left").withColumn(
        "split_key",
        F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("long"),
    )
    out = dataset_split(
        keyed, "split_key", val_fraction, test_fraction, salt
    )
    return out.drop("cluster_id")
