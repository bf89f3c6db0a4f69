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
