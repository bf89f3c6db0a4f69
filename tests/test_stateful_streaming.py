"""Stateful streaming operators (streaming/stateful.py): watermarked
dedup and applyInPandasWithState sessionization, driven through real
micro-batches (file source, one file per trigger, AvailableNow)."""

from __future__ import annotations

from datetime import datetime, timedelta
from pathlib import Path

from pyspark.sql import types as T

from proyecto_gasto_publico_etl_per__spark.streaming.stateful import (
    stateful_sessionize,
    streaming_dedup,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _mins(m: float) -> datetime:
    return T0 + timedelta(minutes=m)


def _write_batches(spark, src: Path, batches: list[list[tuple]]) -> None:
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"batch{i}")
        )


def _run(spark, src: Path, build) -> list:
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    name = f"t_{abs(hash(str(src))) % 10**8}"
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(
        spark,
        src,
        [
            [(1, 100, _mins(0)), (1, 101, _mins(1))],
            # 100 re-arrives a batch later, inside the watermark window
            [(1, 100, _mins(2)), (2, 200, _mins(3))],
        ],
    )
    rows = _run(
        spark,
        src,
        lambda s: streaming_dedup(s, ["event_id"], delay="1 hour"),
    )
    assert sorted(r.event_id for r in rows) == [100, 101, 200]


def test_stateful_sessionize_inline_and_timeout_close(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(
        spark,
        src,
        [
            # user 1: two events 5 min apart → one session
            [(1, 1, _mins(0)), (1, 2, _mins(5))],
            # 2 h later: closes session 1 inline, opens session 2
            # (state carried across micro-batches)
            [(1, 3, _mins(120))],
            # far-future sentinel for another user pushes the event-time
            # watermark past session 2's timeout → emitted by timeout
            [(99, 9, _mins(600))],
        ],
    )
    rows = _run(
        spark,
        src,
        lambda s: stateful_sessionize(s, gap_minutes=30, watermark="0 seconds"),
    )
    sessions = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in rows
        if r.user_id == 1
    )
    assert sessions == [
        (1, "2024-01-01 08:00:00", "2024-01-01 08:05:00", 2),
        (1, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1),
    ]


def test_dedup_ingest_two_layers(spark, tmp_path):
    """dedup_ingest: an arriving corpus drop collapses in-stream
    duplicates (same content, different ids, different micro-batches)
    AND drops anything already in the static corpus — novel docs pass."""
    from pyspark.sql import types as T2

    from proyecto_gasto_publico_etl_per__spark.streaming.incremental import (
        dedup_ingest,
    )

    doc_schema = T2.StructType(
        [
            T2.StructField("doc_id", T2.LongType()),
            T2.StructField("text", T2.StringType()),
            T2.StructField("ingest_ts", T2.TimestampType()),
        ]
    )
    existing = spark.createDataFrame(
        [(1, "already in the corpus")], "doc_id LONG, text STRING"
    )
    src = tmp_path / "drops"
    batches = [
        [
            (100, "brand new document", _mins(0)),
            (101, "already in the corpus", _mins(1)),  # dup of history
        ],
        [
            (102, "brand  new   document", _mins(2)),  # in-stream dup
            #      (whitespace-normalized to batch-0's text)
            (103, "another novel one", _mins(3)),
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    name = f"ingest_{abs(hash(str(src))) % 10**8}"
    q = (
        dedup_ingest(stream, existing)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = {
        r.doc_id for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert 100 in kept and 103 in kept  # novel docs pass
    assert 101 not in kept  # duplicate of the static corpus
    assert 102 not in kept  # in-stream duplicate within the watermark


def _protobuf_usable() -> bool:
    """transformWithState's state-server protocol needs a working
    protobuf; this container ships NO protobuf at all (`import google`
    raises ModuleNotFoundError; pip install is out of scope — env note
    2026-08-14, round 5).  Gate, don't fake — same honesty rule as the PIL/cv2
    multimodal stubs."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(
    not _protobuf_usable(),
    reason="transformWithState needs protobuf; container has none (external env blocker, round-5 note)",
)
def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): per-user
    running totals accumulate across micro-batches in typed ValueState;
    exact integer micros, replay-deterministic."""
    from pyspark.sql import types as T3

    from proyecto_gasto_publico_etl_per__spark.streaming.stateful import (
        streaming_running_totals,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        schema = T3.StructType(
            [
                T3.StructField("user_id", T3.LongType()),
                T3.StructField("value", T3.DoubleType()),
            ]
        )
        src = tmp_path / "vals"
        batches = [
            [(1, 1.5), (1, 2.0), (2, 10.0)],
            [(1, 0.5), (2, 0.25), (3, 7.0)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(src / f"b{i}")
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        name = f"totals_{abs(hash(str(src))) % 10**8}"
        q = (
            streaming_running_totals(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        # update mode: take the LAST emission per user
        final = {}
        for r in rows:
            final[r.user_id] = (r.n_events, r.value_mic)
        assert final[1] == (3, 40_000)   # 1.5 + 2.0 + 0.5 = 4.0
        assert final[2] == (2, 102_500)  # 10.0 + 0.25
        assert final[3] == (1, 70_000)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )

def test_grid_micros_matches_batch_gmicros_for_either_sign(spark):
    """Streaming micros must replay bit-identically to the batch money
    grid, including negative amounts (refunds/reversals): int() truncation
    toward zero yields -2499 for -0.2499... cases where floor gives -2500."""
    from pyspark.sql import functions as F

    from proyecto_gasto_publico_etl_per__spark.functions.money import gmicros
    from proyecto_gasto_publico_etl_per__spark.streaming.stateful import (
        grid_micros,
    )

    vals = [0.0, 0.25, -0.25, 1.00005, -1.00005, -0.00005, 123.4567,
            -123.4567, -0.24995]
    df = spark.createDataFrame([(v,) for v in vals], "value DOUBLE")
    batch = [
        r.m for r in df.select(gmicros(F.col("value")).alias("m")).collect()
    ]
    streamed = [grid_micros(v, 10_000) for v in vals]
    assert streamed == batch
