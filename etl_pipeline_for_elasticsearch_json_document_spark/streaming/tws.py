"""Gap-based sessionization on the ``transformWithState`` API (Spark 4).

Same semantics as ``stateful.sessionize_stream`` (applyInPandasWithState),
re-expressed on the newer arbitrary-state API: typed ``ValueState`` plus
explicit event-time timers instead of a single opaque state tuple with a
GroupState timeout. The two implementations are parity-tested against each
other and against the batch ``session_window`` oracle.

Why both exist: ``applyInPandasWithState`` is the stable workhorse;
``transformWithState`` adds composable state variables (value/list/map),
multiple timers per key, TTL, and initial-state bootstrap — the API a
long-lived 100 TB session store would use (state shards by key across
executors; per-key state here is three scalars, O(keys) total).

Environment gate: transformWithState's Python↔JVM state protocol needs
``protobuf``; :func:`sessionize_tws` raises a clear error when it is
missing (this container ships without it — the parity test skips there).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUT_SCHEMA = "user_id bigint, session_start_us bigint, session_end_us bigint, n_events bigint"
_COLS = ["user_id", "session_start_us", "session_end_us", "n_events"]


class SessionProcessor(StatefulProcessor):
    """Fold events into gap-separated sessions; emit closed sessions, keep
    the open one in a ValueState and flush it via an event-time timer."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.session = handle.getValueState(
            "session", "start_us bigint, last_us bigint, n bigint"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        ts_us: list[int] = []
        for pdf in rows:
            ts_us.extend((pdf["ts"].astype("int64") // 1_000).tolist())
        # interval gap-merge with the open session (same late-event
        # semantics as stateful._session_fold: an in-watermark event older
        # than the open session extends it backwards when within gap,
        # else closes as its own session)
        items = [(t, t, 1) for t in ts_us]
        prev_expiry_ms: int | None = None
        if self.session.exists():
            prev = tuple(self.session.get())
            items.append(prev)
            prev_expiry_ms = (prev[1] + self.gap_us) // 1_000
        if not items:
            return iter([])
        items.sort()
        merged: list[list[int]] = []
        for s, e, c in items:
            if merged and s - merged[-1][1] <= self.gap_us:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += c
            else:
                merged.append([s, e, c])
        closed = [(uid, s, e, c) for s, e, c in merged[:-1]]
        start_us, last_us, n = merged[-1]
        self.session.update((start_us, last_us, n))
        # One live timer per key: extending a session would otherwise leave
        # the old (earlier) timer registered, and when the watermark passed
        # it, handleExpiredTimer would close the still-open session early.
        new_expiry_ms = (last_us + self.gap_us) // 1_000
        if prev_expiry_ms is not None and prev_expiry_ms != new_expiry_ms:
            self.handle.deleteTimer(prev_expiry_ms)
        self.handle.registerTimer(new_expiry_ms)
        if closed:
            yield pd.DataFrame(closed, columns=_COLS)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if self.session.exists():
            start_us, last_us, n = self.session.get()
            # Belt-and-braces vs the deleteTimer in handleInputRows: a timer
            # older than the open session's true expiry is stale — emitting
            # on it would split the session.
            if expiredTimerInfo.getExpiryTimeInMs() < (last_us + self.gap_us) // 1_000:
                return
            self.session.clear()
            yield pd.DataFrame([(uid, start_us, last_us, n)], columns=_COLS)

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionizer on transformWithStateInPandas (event-time
    timers). Output: user_id, session_start_us, session_end_us, n_events."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package for its "
            "Python<->JVM state protocol; install protobuf or use "
            "stateful.sessionize_stream (applyInPandasWithState), which has "
            "identical session semantics."
        ) from e
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.select(key_col, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            SessionProcessor(gap_us),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
