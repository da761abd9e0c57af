"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

``F.session_window`` (streaming/windows.py) already covers windowed session
*aggregation*; this operator is the escape hatch the survey reserves for
semantics the built-ins can't express — arbitrary per-key state with
event-time timeouts (SURVEY.md §2.2 UDF/streaming rows; the reference's
only stateful construct is the hand-rolled keyset cursor loop,
`ElasticSearch ETL.py:220-267`, which Structured Streaming replaces with
managed state + checkpoints).

Semantics: per key, events are folded in event-time order into an open
session; a gap > ``gap_minutes`` closes the current session and starts a
new one. Closed sessions are emitted immediately; the still-open session is
held in state and flushed when the event-time timeout (watermark passing
last_ts + gap) fires. State per key is three scalars — O(keys), not
O(events) — so a 100 TB stream shards by key across executors with
bounded memory.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, session_start_us bigint, session_end_us bigint, n_events bigint"
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"

_US_PER_MS = 1_000


def _session_fold(
    gap_us: int,
) -> Any:
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((uid, start_us, last_us, n))
                state.remove()
            return iter(
                [pd.DataFrame(closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"])]
            )

        ts_us: list[int] = []
        for pdf in pdfs:
            # datetime64[ns] → micros
            ts_us.extend((pdf["ts"].astype("int64") // 1_000).tolist())

        # Gap-merge the batch events WITH the open session as intervals, so
        # late events (admitted by the watermark) that precede the open
        # session's start extend it backwards (start_us = min) when within
        # gap, and form their own — immediately closed — session when more
        # than gap older, instead of being silently absorbed.
        items = [(t, t, 1) for t in ts_us]
        if state.exists:
            items.append(tuple(state.get))
        if not items:
            return iter(
                [pd.DataFrame(closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"])]
            )
        items.sort()
        merged: list[list[int]] = []
        for s, e, c in items:
            if merged and s - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += c
            else:
                merged.append([s, e, c])

        for s, e, c in merged[:-1]:
            closed.append((uid, s, e, c))
        start_us, last_us, n = merged[-1]

        state.update((start_us, last_us, n))
        # flush the open session when the watermark passes last + gap
        state.setTimeoutTimestamp((last_us + gap_us) // _US_PER_MS)
        return iter(
            [pd.DataFrame(closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"])]
        )

    return fn


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-sessionization with explicit per-key state.

    ``events`` must be a streaming DataFrame with an event-time column
    ``ts_col``. Returns closed sessions (append mode): one row per session
    with start/end in epoch-micros and the event count.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fold(gap_us),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
