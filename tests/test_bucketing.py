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


def test_compact_parquet_reduces_files_preserves_data(spark, tmp_path):
    from proyecto_gasto_publico_etl_per__spark.sources.maintenance import (
        compact_parquet,
    )

    p = str(tmp_path / "frag")
    # simulate many tiny micro-batch appends across two partitions
    for i in range(8):
        spark.createDataFrame(
            [(i * 10 + j, 2023 + (j % 2)) for j in range(10)],
            "v INT, anio INT",
        ).write.mode("append").partitionBy("anio").parquet(p)

    def nfiles(year):
        return len(list((tmp_path / "frag" / f"anio={year}").glob("*.parquet")))

    before = spark.read.parquet(p).collect()
    assert nfiles(2023) >= 8  # fragmented

    compact_parquet(spark, p, partition_col="anio", partitions=[2023])
    assert nfiles(2023) == 1  # tiny data → one file
    assert nfiles(2024) >= 8  # untouched partition stays as-is
    after = spark.read.parquet(p).collect()
    assert sorted((r.v, r.anio) for r in after) == sorted(
        (r.v, r.anio) for r in before
    )


def test_cluster_by_produces_disjoint_file_ranges(spark, tmp_path):
    from proyecto_gasto_publico_etl_per__spark.sources.maintenance import (
        cluster_by,
    )

    p = str(tmp_path / "clustered")
    # write interleaved values so every file initially spans the full range
    spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
    ).repartition(4).write.parquet(p)

    before = spark.read.parquet(p)
    spans = before.groupBy(F.input_file_name().alias("f")).agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()
    assert all(r.hi - r.lo > 5_000 for r in spans)  # full-range files

    cluster_by(spark, p, ["k"], n_files=4)
    after = spark.read.parquet(p)
    assert after.count() == 10_000
    spans2 = sorted(
        (r.lo, r.hi)
        for r in after.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    # narrow, non-overlapping ranges → min/max stats can skip files
    for (lo1, hi1), (lo2, _hi2) in zip(spans2, spans2[1:]):
        assert hi1 < lo2
    assert all(hi - lo < 5_000 for lo, hi in spans2)


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout: every output file covers a small RECTANGLE of the
    (x, y) plane — both dimensions prune, which lexicographic
    cluster_by(x, y) cannot give (y only narrows within ties of x)."""
    from proyecto_gasto_publico_etl_per__spark.sources.maintenance import (
        cluster_by_zorder,
    )

    p = str(tmp_path / "zordered")
    # 64x64 grid in scrambled order: unclustered files span everything
    spark.range(0, 4096).select(
        ((F.col("id") * 2654435761) % 64).alias("x"),
        ((F.col("id") * 7919) % 64).alias("y"),
        F.col("id").alias("v"),
    ).repartition(8).write.parquet(p)

    def spans(df):
        return df.groupBy(F.input_file_name().alias("f")).agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).collect()

    before = spans(spark.read.parquet(p))
    assert all(r.sx > 55 and r.sy > 55 for r in before)  # full-plane files

    cluster_by_zorder(spark, p, "x", "y", bits=6, n_files=16)
    after = spark.read.parquet(p)
    assert after.count() == 4096
    sp = spans(after)
    assert len(sp) >= 8
    # mean covered area per file must be a small fraction of the plane;
    # a perfect 16-file Z-layout covers 1/16 each (0.0625) — allow slack
    # for boundary files that straddle Z-curve seams
    areas = [((r.sx + 1) * (r.sy + 1)) / (64.0 * 64.0) for r in sp]
    assert sum(areas) / len(areas) < 0.35
    # and BOTH dimensions narrowed on most files (not just the leading one)
    narrow_both = sum(1 for r in sp if r.sx <= 32 and r.sy <= 32)
    assert narrow_both >= len(sp) // 2
