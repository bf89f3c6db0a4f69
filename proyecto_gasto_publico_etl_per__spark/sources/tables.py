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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    The driver's parquet stores TIMESTAMP(NANOS); Spark 4 reads the
    UTC-adjusted ones as TIMESTAMP_NTZ natively but refuses unadjusted
    NANOS (``events.ts``) unless ``nanosAsLong`` is on — so we enable it
    and rebuild the timestamp from the nanos long (micros precision, same
    truncation DuckDB applies).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver may hand us a session without our defaults: timestamp
    # rendering must be UTC to agree with the (timezone-naive) oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
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
