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
