"""Warehouse maintenance: small-file compaction.

Incremental and streaming loads append a few files per micro-batch; at
scale the accumulated small files dominate scan overhead (one task +
one open per file).  ``compact_parquet`` rewrites a table (or only
selected partitions of it) into ~``target_mb`` files while leaving the
data byte-identical — the Spark-side stand-in for the reference's
"rebuild indexes after load" guidance (README.md:270-277).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*.parquet"))


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    partitions: list | None = None,
    target_mb: int = 128,
) -> int:
    """Rewrite a parquet table into ~target_mb files; returns the file
    count written.

    With ``partition_col`` the rewrite uses dynamic partition overwrite,
    so ``partitions`` (e.g. the years a streaming load just touched) can
    be compacted without rewriting the rest of the table.
    """
    df = spark.read.parquet(path)
    src = Path(path)
    if partition_col and partitions is not None:
        df = df.filter(F.col(partition_col).isin(partitions))
        size = sum(
            _dir_bytes(src / f"{partition_col}={p}") for p in partitions
        )
    else:
        size = _dir_bytes(src)
    n_files = max(1, size // (target_mb * 1024 * 1024))

    writer = (
        df.repartition(int(n_files), partition_col)
        if partition_col
        else df.repartition(int(n_files))
    )
    # localCheckpoint: fully materialize before overwriting the source
    out = writer.localCheckpoint(eager=True).write.mode("overwrite")
    if partition_col:
        out = out.option("partitionOverwriteMode", "dynamic").partitionBy(
            partition_col
        )
    out.parquet(path)
    return int(n_files)


def cluster_by(
    spark: SparkSession,
    path: str,
    cols: list[str],
    n_files: int | None = None,
) -> None:
    """Range-cluster a parquet table on ``cols``: repartitionByRange +
    sortWithinPartitions, so each output file covers a narrow, disjoint
    range of the leading column and parquet row-group min/max stats can
    skip whole files for range predicates — the open-source stand-in for
    Z-ordering, and the right layout for an IVF corpus (cluster by
    centroid id) or a time-keyed fact.
    """
    df = spark.read.parquet(path)
    parts = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    clustered = parts.sortWithinPartitions(*cols)
    clustered.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
