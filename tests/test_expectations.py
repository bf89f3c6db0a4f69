"""Data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.operators import expectations as X


def test_check_counts_violations_in_one_pass(spark):
    df = spark.createDataFrame(
        [(2024, 1, 10.0), (2024, 13, -5.0), (1890, 2, None)],
        "ANO_EJE INT, MES_EJE INT, MONTO_PIA DOUBLE",
    )
    row = X.check(
        df,
        {
            "valid_year": F.col("ANO_EJE").between(2000, 2100),
            "valid_month": F.col("MES_EJE").between(1, 12),
            "pia_non_negative": F.col("MONTO_PIA").isNull()
            | (F.col("MONTO_PIA") >= 0),
        },
    )
    assert row.n_rows == 3
    assert row.valid_year_violations == 1      # 1890
    assert row.valid_month_violations == 1     # month 13
    assert row.pia_non_negative_violations == 1  # -5.0 (NULL passes)


def test_assert_ok_raises_with_summary(spark):
    df = spark.createDataFrame([(0,)], "x INT")
    with pytest.raises(ValueError, match="positive_x"):
        X.assert_ok(df, {"positive_x": F.col("x") > 0})
    # and passes silently when clean
    X.assert_ok(
        spark.createDataFrame([(1,)], "x INT"), {"positive_x": F.col("x") > 0}
    )


def test_standard_checks_pass_on_normalized_output(spark, tmp_path):
    import csv

    from proyecto_gasto_publico_etl_per__spark.operators import normalize
    from proyecto_gasto_publico_etl_per__spark.sources.csv_source import (
        read_monthly_csv,
    )

    p = tmp_path / "2024-Gasto-Mensual.csv"
    with open(p, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["ANO_EJE", "MES_EJE", "MONTO_PIA", "MONTO_DEVENGADO"])
        w.writerows([["2024", "1", "10.5", "9"], ["bad", "2", "1", "1"]])
    norm = normalize.normalize_monthly(read_monthly_csv(spark, str(p)))
    row = X.assert_ok(norm, X.standard_monthly_checks())
    assert row.n_rows == 1  # the junk row was filtered upstream


def test_cli_load_validate_flag(spark, tmp_path, capsys):
    import csv

    from proyecto_gasto_publico_etl_per__spark import cli

    p = tmp_path / "2024-Gasto-Mensual.csv"
    with open(p, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["ANO_EJE", "MES_EJE", "MONTO_PIA", "MONTO_DEVENGADO"])
        w.writerow(["2024", "1", "10.5", "9"])
    norm, wh = str(tmp_path / "n"), str(tmp_path / "w")
    cli.main(["transform", str(p), norm])
    cli.main(["load", norm, wh, "--validate"])
    assert "all checks pass" in capsys.readouterr().out
