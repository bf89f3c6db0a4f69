"""Structured Streaming incremental-load tests (streaming/incremental.py)."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from proyecto_gasto_publico_etl_per__spark.streaming.incremental import (
    incremental_load,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_incremental_load_exactly_once_per_file(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = Path(tmp, "src")
        out = str(Path(tmp, "out"))
        ckpt = str(Path(tmp, "ckpt"))
        spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).write.parquet(
            str(src / "batch1")
        )

        incremental_load(
            spark, f"{src}/*", out, ckpt, SCHEMA,
            transform=lambda df: df.withColumn("v", F.upper("v")),
        )
        assert sorted(
            (r.k, r.v) for r in spark.read.parquet(out).collect()
        ) == [(1, "A"), (2, "B")]

        # re-run with no new files: nothing reprocessed (idempotent resume,
        # the engine form of skip-if-exists + ON CONFLICT DO NOTHING)
        incremental_load(spark, f"{src}/*", out, ckpt, SCHEMA,
                         transform=lambda df: df.withColumn("v", F.upper("v")))
        assert spark.read.parquet(out).count() == 2

        # a new file arrives: only it is processed
        spark.createDataFrame([(3, "c")], SCHEMA).write.parquet(
            str(src / "batch2")
        )
        incremental_load(spark, f"{src}/*", out, ckpt, SCHEMA,
                         transform=lambda df: df.withColumn("v", F.upper("v")))
        assert sorted(
            (r.k, r.v) for r in spark.read.parquet(out).collect()
        ) == [(1, "A"), (2, "B"), (3, "C")]


def test_windowed_event_counts_matches_batch_groupby(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from proyecto_gasto_publico_etl_per__spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    windowed = windowed_event_counts(ev)
    direct = ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = {
        (str(r.window_start), r.event_type): r.n_events
        for r in windowed.collect()
    }
    d = {
        (str(r.window_start), r.event_type): r.n_events
        for r in direct.collect()
    }
    assert w == d
