"""Per-user running statistics as a custom stateful streaming operator,
targeting the Spark 4 ``transformWithState`` API (SPARK-46815, "State
API v2": named state variables, per-state TTL, timers) with an
``applyInPandasWithState`` fallback of IDENTICAL semantics.

The v2 path needs the ``protobuf`` package (the Python processor talks
to the JVM state server over a protobuf protocol); this container does
not ship it, so the operator auto-selects: ``transformWithStateInPandas``
when ``google.protobuf`` imports, else the GroupState implementation.
Both paths run the SAME pure fold (``_fold_events``) over the same
state tuple, and a pytest pins the fallback against the batch window
oracle while a skipif-gated twin covers the v2 path where available.

Semantics: for every event, emit the per-user cumulative event count
and running max value AS OF that event in (ts, event_id) order -- the
streaming twin of the batch cumulative window (its DuckDB oracle).
One output row per input row (append mode), so replay across any
micro-batch split is duplicate-free; state per user is two scalars,
bounded for any stream length.

Scale: state is per-key-constant (16 bytes + key), the handler sorts
only the CURRENT batch's rows for one key (never history), and keys
process in parallel across state-store partitions.  Cross-batch
ordering needs the source to deliver a key's rows in event-time order
across files (true here: single-file replay = one micro-batch; a real
deployment keys file boundaries to time windows).
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("n_events_so_far", T.LongType()),
        T.StructField("running_max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)

_OUT_COLS = [
    "event_id",
    "user_id",
    "ts_ms",
    "n_events_so_far",
    "running_max_value",
]


def transform_with_state_available() -> bool:
    """True when the State API v2 Python protocol can run (protobuf
    importable).  The operator falls back to GroupState otherwise."""
    try:  # find_spec raises (not returns None) when even the parent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _fold_events(
    user_id: int,
    batches: Iterator[pd.DataFrame],
    prior: tuple | None,
) -> tuple[list[tuple], tuple]:
    """The shared per-key fold: sort the batch's events by
    (ts, event_id), thread (count, max) through them, return
    (output rows, new state).  Both API paths call exactly this."""
    evs: list[tuple[int, int, float]] = []
    for pdf in batches:
        evs.extend(
            (int(t), int(e), float(v))
            for t, e, v in zip(pdf["ts_ms"], pdf["event_id"], pdf["value"])
        )
    evs.sort()
    n, mx = (prior[0], prior[1]) if prior is not None else (0, None)
    out = []
    for ts_ms, eid, val in evs:
        n += 1
        if mx is None or val > mx:
            mx = val
        out.append((eid, user_id, ts_ms, n, mx))
    return out, (n, mx)


def _stats_group_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out, new_state = _fold_events(
        user_id, batches, state.get if state.exists else None
    )
    if out:
        state.update(new_state)
        yield pd.DataFrame(out, columns=_OUT_COLS)


def _make_v2_processor():
    """Class built lazily: the stateful_processor import itself is
    cheap, but keeping the v2 path out of module import keeps the
    fallback path importable in any environment."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStatsProcessor(StatefulProcessor):
        """Named-ValueState cumulative (count, max) per user."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows, timer_values
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            prior = self._agg.get() if self._agg.exists() else None
            out, new_state = _fold_events(user_id, rows, prior)
            if out:
                self._agg.update(new_state)
                yield pd.DataFrame(out, columns=_OUT_COLS)

        def close(self) -> None:
            pass

    return RunningStatsProcessor()


def running_stats_stream(events_stream: DataFrame, api: str = "auto") -> DataFrame:
    """events stream (ts timestamp, value double) -> one row per event
    with the per-user running (count, max).  NULL values are dropped
    up front (a NULL neither counts nor competes for the max -- the
    batch window oracle's semantics over ``WHERE value IS NOT NULL``).

    ``api``: "v2" forces transformWithStateInPandas, "v1" forces
    applyInPandasWithState, "auto" picks v2 iff its protobuf protocol
    dependency is importable."""
    if api == "auto":
        api = "v2" if transform_with_state_available() else "v1"
    prepared = events_stream.filter(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.col("value").cast("double").alias("value"),
    )
    if api == "v2":
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_v2_processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _stats_group_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
