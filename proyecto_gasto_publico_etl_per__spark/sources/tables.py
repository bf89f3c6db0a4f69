"""Loader for the driver's synthetic star-schema testdata (TESTDATA.md)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_engine_confs(spark: SparkSession) -> None:
    """Apply the two session-level settings engine results depend on.

    Both are deliberately session-scoped (neither has a per-read reader
    option) and are part of the engine's documented session contract:

    - ``nanosAsLong``: Spark 4 refuses unadjusted TIMESTAMP(NANOS)
      parquet (``events.ts``) otherwise.  Side effect: OTHER nanos
      parquet columns read in this session also come back as longs.
    - session timeZone = UTC: timestamp rendering must agree with the
      (timezone-naive) DuckDB oracle; queries keep running after the
      read, so save-and-restore would change results mid-plan.

    An explicitly different user timezone is overridden LOUDLY, never
    silently clobbered.
    """
    if (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        != "true"
    ):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # no fallback value here: Spark 4 VALIDATES the fallback string before
    # checking whether the key is set, and timeZone always has a resolved
    # session value anyway — conf.get(key, "") raises INVALID_CONF_VALUE
    # on an otherwise-healthy session.
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        if tz not in ("Etc/UTC", "Z"):
            import warnings

            warnings.warn(
                f"overriding spark.sql.session.timeZone={tz!r} with UTC: "
                "engine results are defined in UTC rendering",
                stacklevel=3,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def fan_out(df: DataFrame, floor_fraction: float = 0.5) -> DataFrame:
    """Widen an under-parallel input before a CPU-dense derivation.

    A parquet ROW GROUP is the unsplittable scan unit: a small
    single-row-group file scans as 1-2 partitions no matter how
    ``maxPartitionBytes``/``minPartitionNum`` are tuned, which serializes
    every expensive expression chain that follows (shingle explodes,
    per-token md5, vector dot products) onto 1-2 cores.  When the plan's
    current partitioning is below ``floor_fraction ×`` the session's
    default parallelism, round-robin repartition up to the default — the
    rows are tiny relative to the compute they feed, so the extra narrow
    shuffle is noise.  At warehouse scale row groups vastly outnumber
    cores, the guard never fires, and this is a structural no-op —
    downstream results must therefore never depend on partitioning, which
    the engine's exact/quantized arithmetic already guarantees.

    Batch-only (``df.rdd`` is illegal on streaming frames).
    """
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(target * floor_fraction)):
        return df
    return df.repartition(target)


#: below this footer-reported size a table is dim-or-broadcast-sized: the
#: scan task is trivial and downstream ops either broadcast it (an extra
#: exchange before a BroadcastExchange is two wasted AQE stages) or
#: `fan_out` it at the operator head — an upfront exchange would be pure
#: overhead.  Only genuinely fact-sized single-row-group files benefit.
_FANOUT_MIN_BYTES = 8 * 1024 * 1024


def _scan_units(path: str, cap: int = 64) -> tuple[int, int]:
    """(total row groups, total bytes) from parquet footers, driver-side.

    The ROW GROUP is the real scan-split unit: Spark happily plans 21
    byte-range splits over a single-row-group file, but 20 of them read
    nothing — ``rdd.getNumPartitions()`` reports fake parallelism, so
    any honest under-parallelism check must come from the footers.
    Stops counting at ``cap`` row groups (beyond that the scan is
    parallel enough and the exact number is irrelevant).
    """
    import pyarrow.parquet as pq

    p = Path(path)
    files = [p] if p.is_file() else sorted(p.rglob("*.parquet"))
    rgs = nbytes = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rgs += md.num_row_groups
        nbytes += sum(
            md.row_group(i).total_byte_size
            for i in range(md.num_row_groups)
        )
        if rgs >= cap:
            break
    return rgs, nbytes


def load_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool = False
) -> DataFrame:
    """Read one testdata table.

    The driver's parquet stores TIMESTAMP(NANOS); Spark 4 reads the
    UTC-adjusted ones as TIMESTAMP_NTZ natively but refuses unadjusted
    NANOS (``events.ts``) unless ``nanosAsLong`` is on — so we enable it
    (via the documented session contract, ``ensure_engine_confs``) and
    rebuild the timestamp from the nanos long (micros precision, same
    truncation DuckDB applies).

    ``widen=True`` — for consumers that MATERIALIZE the whole table
    (full-star denormalization, corpus-wide aggregates): when the
    footers show fewer real row groups than half the session's cores,
    round-robin repartition at the source so the downstream join/metric
    pipeline doesn't run on the scan's 1-2 real tasks (see
    ``_scan_units``; byte-range split counts are fake on few-row-group
    files).  Selective consumers (year-slice analytics) must NOT widen:
    the exchange writes the full table from the one real scan task,
    which costs more than their filtered remainder.  Predicate pushdown
    and column pruning survive (Catalyst pushes both through
    Repartition).  At warehouse scale row groups vastly outnumber cores
    and this is a structural no-op; results never depend on partitioning
    (exact/quantized arithmetic discipline).
    """
    ensure_engine_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    if widen:
        target = spark.sparkContext.defaultParallelism
        try:
            rgs, nbytes = _scan_units(path)
        except OSError:
            return df
        if nbytes >= _FANOUT_MIN_BYTES and rgs < max(1, target // 2):
            df = df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
