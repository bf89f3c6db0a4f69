"""Bucketed catalog tables: pre-shuffled storage for co-located joins.

The reference leans on PostgreSQL B-tree indexes for join locality
(``ETL Gasto publico Perú/sql/CreacionDeDataWareHouse.sql:141-145``); the
Spark substitute at scale is bucketing: write a table hash-partitioned by
its join/grain key once, and every later equi-join or aggregation on that
key skips its shuffle entirely (SortMergeJoin over pre-bucketed scans).

In this engine the natural bucketed tables are:

- the fact on its consolidation grain — repeated idempotent appends
  anti-join on the grain (operators/star.append_fact) and re-consolidate;
  bucketing makes both shuffle-free;
- any big-big pairing like lineitem⋈orders on the orderkey.

Bucketing requires catalog tables (``saveAsTable``) — plain
``.parquet(path)`` files carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally sorted)
    by the given columns.

    Both sides of a future join must use the same ``n_buckets`` and key
    for the shuffle to be elided.  ``path`` makes it an external table.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a (bucketed) catalog table; bucket metadata rides along so
    Catalyst can elide shuffles on the bucket key."""
    return spark.table(table)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the optimized physical plan — the
    engine's own regression metric for 'did bucketing remove the shuffle'."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
