"""Bucketed-table join locality (sources/bucketing.py): a join between
two tables bucketed on the join key must plan zero shuffle exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.sources import bucketing


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    bucketing.write_bucketed(
        left, "t_bucket_left", ["k"], n_buckets=8,
        sort_cols=["k"], path=str(tmp_path / "left"),
    )
    bucketing.write_bucketed(
        right, "t_bucket_right", ["k"], n_buckets=8,
        sort_cols=["k"], path=str(tmp_path / "right"),
    )
    yield "t_bucket_left", "t_bucket_right"
    spark.sql("DROP TABLE IF EXISTS t_bucket_left")
    spark.sql("DROP TABLE IF EXISTS t_bucket_right")


def test_bucketed_join_elides_both_shuffles(spark, bucketed_pair):
    lt, rt = bucketed_pair
    left, right = bucketing.read_table(spark, lt), bucketing.read_table(spark, rt)
    # suppress broadcast so the join must be sort-merge — the case
    # bucketing exists for (both sides too big to broadcast at scale)
    joined = left.join(right.hint("merge"), "k")
    assert bucketing.shuffle_count(joined) == 0
    assert joined.count() == 1_000

    # same key, unbucketed parquet → the join shuffles both sides
    plain = left.join(
        spark.range(0, 1_000)
        .select(F.col("id").alias("k"), F.lit(1).alias("b"))
        .hint("merge"),
        "k",
    )
    assert bucketing.shuffle_count(plain) > 0


def test_bucketed_groupby_on_bucket_key_elides_shuffle(spark, bucketed_pair):
    lt, _ = bucketed_pair
    left = bucketing.read_table(spark, lt)
    agg = left.groupBy("k").agg(F.sum("a").alias("s"))
    assert bucketing.shuffle_count(agg) == 0
    assert agg.count() == 10_000
