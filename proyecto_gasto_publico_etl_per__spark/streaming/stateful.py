"""Custom stateful streaming operators.

The reference is batch-with-incremental-flavor only (SURVEY.md §2.11); these
are the scale extensions a continuously-arriving feed needs:

- ``streaming_dedup`` — exactly-once semantics per natural key across
  micro-batches: the streaming form of the engine's idempotent anti-join
  append (the reference's ``ON CONFLICT DO NOTHING``,
  ``ETL Gasto publico Perú/etl/cargar_postgres.py:135,248``).  State is
  bounded by the watermark: a key older than the delay is evicted, so
  memory stays O(keys-per-window) at any input volume.
- ``stateful_sessionize`` — gap-based sessionization as an
  ``applyInPandasWithState`` operator.  The batch twin (the ``sessionize``
  declared query, plans/driver_queries.py) is two window functions; in
  streaming the session boundary crosses micro-batches, so it is genuinely
  state-store work: per-user open-session state, closed either by a
  later-than-gap event or by the event-time watermark passing the
  session's timeout.

Both run per-key in parallel across executors; state lives in the state
store (RocksDB at scale), not the driver.
"""

from __future__ import annotations

import math

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT"
)
#: open-session state: epoch-microsecond bounds + event count
SESSION_STATE_SCHEMA = "start_us LONG, end_us LONG, n LONG"

_US_PER_MS = 1_000


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark window.

    A duplicate can arrive any number of micro-batches after the original
    as long as it is no later than ``delay``; beyond that the key's state
    has been evicted (the deliberate at-scale trade: bounded state for a
    bounded dedup horizon).
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


def _emit(user_id: Any, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
        }
    )


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization: one output row per closed session.

    A session closes when a later event for the same user arrives more
    than ``gap_minutes`` after it (emitted inline), or when the event-time
    watermark passes session_end + gap (emitted by state timeout) — so
    every session is eventually emitted exactly once even for users that
    simply stop sending events.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield _emit(user_id, start_us, end_us, n)
            return

        raw: list[int] = []
        for pdf in pdfs:
            raw.extend(int(t) for t in pdf[ts_col].astype("int64"))
        # pandas int64 of datetime64[us] is microseconds; of [ns] it is
        # nanoseconds — normalize by magnitude (us since 1970 < 1e17)
        ts_us = sorted(t if t < 10**17 else t // 1000 for t in raw)
        if not ts_us:
            return

        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = ts_us[0], ts_us[0], 0

        for t in ts_us:
            if n > 0 and t - end_us > gap_us:
                yield _emit(user_id, start_us, end_us, n)
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1

        state.update((start_us, end_us, n))
        # timeout is epoch MILLISECONDS; fires once the event-time
        # watermark passes session_end + gap
        state.setTimeoutTimestamp((end_us + gap_us) // _US_PER_MS)
        return

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def grid_micros(v: float, scale: int) -> int:
    """Python twin of ``functions.money.gmicros``: floor(x*scale+0.5).
    Used by the stateful processors so streaming totals replay
    bit-identically to batch for either sign (int() truncates toward
    zero and would diverge on negative amounts at half-grid points)."""
    return math.floor(float(v) * scale + 0.5)


class _RunningTotalsProcessor(StatefulProcessor):
    """StatefulProcessor for ``streaming_running_totals``: typed
    ValueState (n, mic) per key, optional TTL; module-level class so the
    worker can unpickle it by reference."""

    def __init__(self, value_scale: int, ttl_ms: int | None):
        self._scale = value_scale
        self._ttl = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n LONG, mic LONG", self._ttl
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = 0
        mic = 0
        for pdf in rows:
            n += len(pdf)
            # exact integer micros, same grid discipline as functions/
            # money: floor(x*scale+0.5), NOT int() — int() truncates
            # toward zero, so negative amounts (refunds/reversals) would
            # diverge from batch gmicros replays by one micro at half-grid
            mic += sum(grid_micros(v, self._scale) for v in pdf["value"])
        prev = self._state.get()
        if prev is not None:
            n += int(prev[0])
            mic += int(prev[1])
        self._state.update((n, mic))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_mic": [mic]}
        )

    def close(self) -> None:
        pass


def streaming_running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    value_scale: int = 10_000,
    ttl_ms: int | None = None,
):
    """Per-key running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (successor to applyInPandasWithState):
    typed ValueState with optional TTL, per-key timers available, state
    in the state store (requires the RocksDB provider,
    ``spark.sql.streaming.stateStore.providerClass``).

    Emits one updated (key, running count, running value-micros) row per
    key per micro-batch (update mode).  Values accumulate as exact
    integer micros — the engine's money-grid discipline carried into
    streaming state, so totals are replay-deterministic.

    ``ttl_ms`` bounds state lifetime per key — the idle-key eviction
    policy a 100 TB keyspace needs (without it, state is O(all keys
    ever seen)).

    Environment note: the transformWithState protocol runs a protobuf
    state server; this container's protobuf install is broken
    (``from google.protobuf import descriptor`` fails), so the e2e test
    is skip-gated on protobuf availability — the operator itself is
    plain public Spark 4 API and runs anywhere protobuf works.
    """
    out_schema = "user_id BIGINT, n_events BIGINT, value_mic BIGINT"
    return (
        stream.select(key_col, F.col(value_col).alias("value"))
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(value_scale, ttl_ms),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
