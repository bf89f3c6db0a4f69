"""Schema evolution (sources/evolution.py, SURVEY §2.13): an
old-schema partition living next to a new-schema one must round-trip —
added columns read as NULL, widened columns rewrite only the stale
partitions, and the conform-read contract pins one stable schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.sources import evolution


@pytest.fixture()
def evolved_table(spark, tmp_path):
    """anio=2020 written in the OLD era (amount int, no note);
    anio=2021 written after an add-column + widen evolution."""
    table = tmp_path / "fact"
    old = spark.createDataFrame(
        [(1, 10), (2, 20)], "id INT, amount INT"
    ).withColumn("anio", F.lit(2020))
    old.write.partitionBy("anio").parquet(str(table))
    new = spark.createDataFrame(
        [(3, 3_000_000_000, "late")], "id INT, amount BIGINT, note STRING"
    ).withColumn("anio", F.lit(2021))
    new.write.mode("append").partitionBy("anio").parquet(str(table))
    return table


def test_added_column_is_metadata_only(spark, tmp_path):
    """Adding a column rewrites nothing: old files read it as NULL under
    the conform-read contract."""
    table = tmp_path / "t"
    spark.createDataFrame([(1, 10)], "id INT, amount INT").withColumn(
        "anio", F.lit(2020)
    ).write.partitionBy("anio").parquet(str(table))
    spark.createDataFrame(
        [(2, 20, "x")], "id INT, amount INT, note STRING"
    ).withColumn("anio", F.lit(2021)).write.mode("append").partitionBy(
        "anio"
    ).parquet(str(table))

    out = evolution.conform_read(
        spark,
        str(table),
        {"id": "int", "amount": "int", "note": "string"},
        partition_col="anio",
    )
    rows = {r.id: (r.amount, r.note, r.anio) for r in out.collect()}
    assert rows == {1: (10, None, 2020), 2: (20, "x", 2021)}
    assert [f.dataType.simpleString() for f in out.schema.fields[:3]] == [
        "int",
        "int",
        "string",
    ]


def test_widen_rewrites_only_stale_partitions(spark, evolved_table):
    table = evolved_table
    new_files_before = sorted(
        f.name for f in (table / "anio=2021").glob("*.parquet")
    )

    migrated = evolution.widen_column(
        spark, str(table), "amount", "bigint", partition_col="anio"
    )
    assert migrated == ["anio=2020"]
    # the already-bigint partition kept its files byte-for-byte
    new_files_after = sorted(
        f.name for f in (table / "anio=2021").glob("*.parquet")
    )
    assert new_files_after == new_files_before

    # a PLAIN read (no mergeSchema) now succeeds with the widened type
    out = spark.read.parquet(str(table))
    assert dict(out.dtypes)["amount"] == "bigint"
    got = {r.id: r.amount for r in out.collect()}
    assert got == {1: 10, 2: 20, 3: 3_000_000_000}

    # idempotent: a second run finds nothing stale
    assert (
        evolution.widen_column(
            spark, str(table), "amount", "bigint", partition_col="anio"
        )
        == []
    )


def test_full_roundtrip_old_next_to_new(spark, evolved_table):
    """The verdict's round-trip: widen + conform over a mixed-era table
    yields every row under one contract."""
    evolution.widen_column(
        spark, str(evolved_table), "amount", "bigint", partition_col="anio"
    )
    out = evolution.conform_read(
        spark,
        str(evolved_table),
        {"id": "int", "amount": "bigint", "note": "string"},
        partition_col="anio",
    )
    rows = {r.id: (r.amount, r.note, r.anio) for r in out.collect()}
    assert rows == {
        1: (10, None, 2020),
        2: (20, None, 2020),
        3: (3_000_000_000, "late", 2021),
    }


def test_lossy_widening_refused_before_touching_files(spark, evolved_table):
    mtimes = {
        f: f.stat().st_mtime for f in evolved_table.rglob("*.parquet")
    }
    with pytest.raises(ValueError, match="lossy"):
        evolution.widen_column(
            spark, str(evolved_table), "amount", "int", partition_col="anio"
        )
    assert {
        f: f.stat().st_mtime for f in evolved_table.rglob("*.parquet")
    } == mtimes
