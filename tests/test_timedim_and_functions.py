"""Time dimension + column-function tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.functions.cleaning import (
    clean_text,
    label_or_placeholder,
    region_map_label,
)
from proyecto_gasto_publico_etl_per__spark.functions.hashing import hex_hash32
from proyecto_gasto_publico_etl_per__spark.functions.money import dsum
from proyecto_gasto_publico_etl_per__spark.operators.timedim import build_time_dim


def test_time_dim_shape(spark):
    td = build_time_dim(spark)
    rows = td.collect()
    assert len(rows) == 252  # 2010-01 .. 2030-12 (CreacionDeDataWareHouse.sql:18-24)
    first, last = rows[0], rows[-1]
    assert (first.anio, first.mes, first.trimestre) == (2010, 1, 1)
    assert (last.anio, last.mes, last.trimestre) == (2030, 12, 4)
    assert first.tiempo_id == 201001 and last.tiempo_id == 203012
    assert td.select("tiempo_id").distinct().count() == 252


def test_label_or_placeholder(spark):
    df = spark.createDataFrame(
        [("SALUD",), ("   ",), ("",), (None,)], ["s"]
    )
    out = [r.x for r in df.select(label_or_placeholder("s", "SIN SECTOR").alias("x")).collect()]
    assert out == ["SALUD", "SIN SECTOR", "SIN SECTOR", "SIN SECTOR"]


def test_region_map_label(spark):
    df = spark.createDataFrame([("LIMA",), (None,)], ["dep"])
    out = [r.x for r in df.select(region_map_label("dep").alias("x")).collect()]
    assert out == [
        "Departamento de LIMA, Perú",
        "Departamento de SIN DEPARTAMENTO, Perú",
    ]


def test_dsum_exact_decimal(spark):
    # 0.1 + 0.2 style float traps must not leak into money sums
    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)], ["m"])
    out = df.agg(dsum("m", "s")).collect()[0].s
    assert out == 0.6


def test_hex_hash32_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([("abc",), ("hello world",)], ["s"])
    got = {r.s: r.h for r in df.select("s", hex_hash32("s").alias("h")).collect()}
    con = duckdb.connect()
    for s, h in got.items():
        duck = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,8)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert duck == h, s


def test_fold_accents_and_match_key(spark):
    from proyecto_gasto_publico_etl_per__spark.functions.cleaning import (
        fold_accents,
        match_key,
    )

    df = spark.createDataFrame(
        [
            (1, "EDUCACIÓN"),
            (2, "educacion"),
            (3, "  Año   Fiscal\t"),
            (4, "GOBIERNO REGIONAL DEL DEPARTAMENTO DE APURÍMAC"),
        ],
        "id INT, label STRING",
    )
    out = {
        r.id: (r.folded, r.key)
        for r in df.select(
            "id",
            fold_accents("label").alias("folded"),
            match_key("label").alias("key"),
        ).collect()
    }
    assert out[1][0] == "EDUCACION"
    assert out[1][1] == out[2][1] == "educacion"
    assert out[3][1] == "ano fiscal"
    assert out[4][1].endswith("apurimac")


def test_reconcile_on_match_key(spark):
    from proyecto_gasto_publico_etl_per__spark.functions.cleaning import (
        reconcile_on_match_key,
    )

    a = spark.createDataFrame(
        [(1, "EDUCACIÓN"), (2, "SALUD"), (3, "TRANSPORTE")],
        "id INT, sector STRING",
    )
    b = spark.createDataFrame(
        [("educacion", 100), ("Salud ", 200), ("AGRICULTURA", 300)],
        "sector STRING, monto INT",
    )
    out = reconcile_on_match_key(a, b, "sector")
    rows = {r.id: (r.sector, r.sector_right, r.monto) for r in out.collect()}
    assert rows == {
        1: ("EDUCACIÓN", "educacion", 100),
        2: ("SALUD", "Salud ", 200),
    }


def test_reconcile_on_match_key_rejects_collisions(spark):
    """Column collisions fail loudly instead of corrupting the join:
    a pre-existing <label>_right would duplicate the name, and a
    pre-existing key_col would be silently overwritten."""
    import pytest

    from proyecto_gasto_publico_etl_per__spark.functions.cleaning import (
        reconcile_on_match_key,
    )

    a = spark.createDataFrame([(1, "SALUD")], "id INT, sector STRING")
    b_dup = spark.createDataFrame(
        [("salud", "x")], "sector STRING, sector_right STRING"
    )
    with pytest.raises(ValueError, match="sector_right"):
        reconcile_on_match_key(a, b_dup, "sector")
    a_left_dup = spark.createDataFrame(
        [(1, "SALUD", "x")], "id INT, sector STRING, sector_right STRING"
    )
    with pytest.raises(ValueError, match="left frame"):
        reconcile_on_match_key(a_left_dup, b_dup.drop("sector_right"), "sector")
    a_mk = spark.createDataFrame(
        [(1, "SALUD", "boom")], "id INT, sector STRING, __mk STRING"
    )
    b = spark.createDataFrame([("salud", 1)], "sector STRING, monto INT")
    with pytest.raises(ValueError, match="__mk"):
        reconcile_on_match_key(a_mk, b, "sector")
    # a caller-chosen key_col sidesteps the collision
    out = reconcile_on_match_key(a_mk, b, "sector", key_col="__mk2")
    assert out.collect()[0].monto == 1
