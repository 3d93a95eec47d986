"""Stateful streaming sessionization: the custom-stateful-operator tier
(SURVEY.md section 2.10 -- the reference has no streaming; this is the
engine's Structured-Streaming-native analogue of operators/sessionize).

``applyInPandasWithState`` keys state by user_id; per micro-batch the
handler folds new events into an open-session accumulator and emits a
session row whenever the gap closes one (or the state times out, which
flushes the final session -- the streaming replacement for "end of
input").  State per key is three scalars -- bounded regardless of
stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MS = 30 * 60 * 1000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts: list[int] = []
    for pdf in batches:
        ts.extend(int(v) for v in pdf["ts_ms"])
    if not ts:
        if state.hasTimedOut and state.exists:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, end, n)],
                columns=["user_id", "session_start_ms", "session_end_ms", "n_events"],
            )
        # no data, no flushable state (e.g. an empty batch invocation):
        # nothing to do -- must not fall through to ts[0]
        return
    ts.sort()
    if state.exists:
        start, end, n = state.get
    else:
        start, end, n = ts[0], ts[0], 0
    closed = []
    for t in ts:
        if n > 0 and t - end > GAP_MS:
            closed.append((user_id, start, end, n))
            start, n = t, 0
        end = max(end, t)
        n += 1
    state.update((start, end, n))
    state.setTimeoutDuration(GAP_MS)
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_ms", "session_end_ms", "n_events"],
        )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events stream (with ts timestamp column) -> closed-session rows.
    Gap is the module-level GAP_MS (the handler must be self-contained
    for executor pickling)."""
    prepared = events_stream.select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
