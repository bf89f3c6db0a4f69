"""Warehouse maintenance: small-file compaction and range clustering.

Incremental and streaming loads append a few files per micro-batch; at
scale the accumulated small files dominate scan overhead (one task +
one open per file).  ``compact_parquet`` rewrites a table (or only
selected partitions of it) into ~``target_mb`` files while leaving the
data byte-identical — the Spark-side stand-in for the reference's
"rebuild indexes after load" guidance (README.md:270-277).

Crash-safety contract (both entry points): the rewrite lands in a
sibling temp directory first, is verified by row count against the
source, and only then replaces the source via directory renames.  At no
point does the data exist only in executor memory — a killed job leaves
either the intact source (temp discarded) or, in the narrow window
between the two renames, the complete old copy under ``<name>.gc``.
This replaces the earlier localCheckpoint-then-overwrite-in-place shape,
which could lose the table if an executor died mid-overwrite (checkpoint
blocks are unrecoverable once lineage is truncated and source files are
deleted).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*.parquet"))


def _tmp_dir(src: Path) -> Path:
    tmp = src.parent / f"{src.name}.compacting"
    if tmp.exists():
        shutil.rmtree(tmp)
    return tmp


def _swap_dir(src: Path, new: Path) -> None:
    """Replace ``src`` with ``new`` by two renames (same filesystem —
    ``new`` is always a sibling).  The old copy survives as ``.gc``
    until the new one is in place."""
    trash = src.parent / f"{src.name}.gc"
    if trash.exists():
        shutil.rmtree(trash)
    if src.exists():
        src.rename(trash)
    new.rename(src)
    if trash.exists():
        shutil.rmtree(trash)


def _write_verified(
    spark: SparkSession, df: DataFrame, tmp: Path, partition_col: str | None
) -> None:
    """Write ``df`` to ``tmp`` and verify the landed row count matches
    the plan's count before any swap touches the source."""
    expected = df.count()
    out = df.write.mode("overwrite")
    if partition_col:
        out = out.partitionBy(partition_col)
    out.parquet(str(tmp))
    actual = spark.read.parquet(str(tmp)).count()
    if actual != expected:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction verification failed for {tmp}: wrote {actual} rows, "
            f"expected {expected}; source left untouched"
        )


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    partitions: list | None = None,
    target_mb: int = 128,
) -> int:
    """Rewrite a parquet table into ~target_mb files; returns the file
    count written.

    With ``partition_col`` + ``partitions`` (e.g. the years a streaming
    load just touched) only those partition directories are rewritten and
    swapped; the rest of the table keeps its files byte-for-byte.
    """
    src = Path(path)
    df = spark.read.parquet(path)
    scoped = partition_col is not None and partitions is not None
    if scoped:
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
    tmp = _tmp_dir(src)
    _write_verified(spark, writer, tmp, partition_col)
    if scoped:
        for p in partitions:
            sub = f"{partition_col}={p}"
            landed = tmp / sub
            if landed.exists():
                _swap_dir(src / sub, landed)
        shutil.rmtree(tmp)
    else:
        _swap_dir(src, tmp)
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
    src = Path(path)
    df = spark.read.parquet(path)
    parts = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    clustered = parts.sortWithinPartitions(*cols)
    tmp = _tmp_dir(src)
    _write_verified(spark, clustered, tmp, None)
    _swap_dir(src, tmp)


def zorder_key(x, y, x_min, x_max, y_min, y_max, bits: int = 12):
    """Morton (Z-order) key for two numeric columns: each value scales
    to a ``bits``-bit grid cell, and the cell coordinates bit-interleave
    into one long.  Nearby (x, y) points get nearby keys, so range
    clustering ON THE KEY gives locality in BOTH dimensions at once —
    what plain lexicographic ``cluster_by(x, y)`` cannot (its second
    column only matters within ties of the first).

    The min/max bounds are plan literals (pass a metadata-sized driver
    agg's results); layout keys never affect query results, so the
    double scaling here needs no exact-arithmetic discipline.
    """
    def cell(c, lo, hi):
        span = (hi - lo) or 1
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
        return F.least(
            F.floor(scaled * ((1 << bits) - 1) + F.lit(0.5)).cast("long"),
            F.lit((1 << bits) - 1),
        )

    cx, cy = cell(x, x_min, x_max), cell(y, y_min, y_max)
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(cx, b).bitwiseAND(1), 2 * b)
            + F.shiftleft(F.shiftright(cy, b).bitwiseAND(1), 2 * b + 1)
        )
    return z


def cluster_by_zorder(
    spark: SparkSession,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 12,
    n_files: int | None = None,
) -> None:
    """Z-order-cluster a parquet table on two columns: every output file
    covers a small rectangle of the (x, y) plane, so parquet min/max
    stats prune files for predicates on EITHER column (or both) — the
    open-source equivalent of Delta/Iceberg OPTIMIZE ZORDER BY, and the
    layout for two-dimensional access patterns (year × entity, time ×
    user, centroid × shard).  Same crash-safe write-verify-swap contract
    as ``compact_parquet``; the key is derived and dropped, never
    persisted.
    """
    src = Path(path)
    df = spark.read.parquet(path)
    bounds = df.agg(
        F.min(col_x).alias("xl"), F.max(col_x).alias("xh"),
        F.min(col_y).alias("yl"), F.max(col_y).alias("yh"),
    ).collect()[0]
    z = zorder_key(
        F.col(col_x), F.col(col_y),
        bounds.xl, bounds.xh, bounds.yl, bounds.yh, bits,
    )
    keyed = df.withColumn("__z", z)
    parts = (
        keyed.repartitionByRange(n_files, "__z")
        if n_files
        else keyed.repartitionByRange("__z")
    )
    clustered = parts.sortWithinPartitions("__z").drop("__z")
    tmp = _tmp_dir(src)
    _write_verified(spark, clustered, tmp, None)
    _swap_dir(src, tmp)
