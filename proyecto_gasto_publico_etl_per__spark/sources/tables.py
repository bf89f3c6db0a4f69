"""Loader for the driver's synthetic star-schema testdata (TESTDATA.md)."""

from __future__ import annotations

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
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz != "UTC":
        if tz not in ("", "Etc/UTC", "Z"):
            import warnings

            warnings.warn(
                f"overriding spark.sql.session.timeZone={tz!r} with UTC: "
                "engine results are defined in UTC rendering",
                stacklevel=3,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    The driver's parquet stores TIMESTAMP(NANOS); Spark 4 reads the
    UTC-adjusted ones as TIMESTAMP_NTZ natively but refuses unadjusted
    NANOS (``events.ts``) unless ``nanosAsLong`` is on — so we enable it
    (via the documented session contract, ``ensure_engine_confs``) and
    rebuild the timestamp from the nanos long (micros precision, same
    truncation DuckDB applies).
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
