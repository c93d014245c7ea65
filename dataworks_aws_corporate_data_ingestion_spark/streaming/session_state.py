"""Streaming sessionization with EVENT-TIME TIMEOUT finalisation.

The built-in session_window aggregate (streaming/windows.py::
session_window_counts) emits a session only when the watermark closes its
window -- but it is an aggregate: it cannot carry arbitrary per-session
state or run side-effecting finalisation logic.  This operator is the
custom-state version: applyInPandasWithState keyed by user, one open
session per key in the state store, and GroupStateTimeout.EventTimeTimeout
to FINALISE sessions for keys that simply stop sending events -- the case
a NoTimeout operator can never close out (its state would grow forever,
one open session per ever-seen user).

Mechanics per micro-batch:

* timed-out key (watermark passed last_event + gap): the open session is
  emitted and the state removed -- Spark invokes the function with an
  EMPTY chunk iterator and state.hasTimedOut set.
* events for a key: events are concat-sorted (arrival-ordered arrow
  chunks, same discipline as stateful.py), merged into the open session;
  a gap >= `gap` closes the current session (emitted immediately) and
  opens a new one.  The state's timeout timestamp is re-armed to
  last_event + gap, so the session closes exactly when the watermark
  proves no in-order event can extend it.

State stays bounded: one (start, last, n) triple per ACTIVE key; idle
keys are reaped by their timeout.  At production scale this is the
difference between state ~ active users and state ~ all users ever.

Reference: the engine's batch sessionize (operators/sessions.py) is the
offline twin; events_session_window_builtin pins the built-in aggregate.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _row(user_id: int, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [int(user_id)],
            "session_start": [pd.to_datetime(start_us, unit="us")],
            "session_end": [pd.to_datetime(last_us, unit="us")],
            "n_events": [int(n)],
        }
    )


def _session_fn(gap_us: int):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle key: watermark passed last_event + gap -- finalise
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield _row(user_id, start_us, last_us, n)
            return
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            if chunks
            else pd.DataFrame(columns=["ts", "event_id"])
        )
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        for ts in pdf["ts"]:
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us < gap_us:
                last_us, n = max(last_us, ts_us), n + 1
            else:
                yield _row(user_id, start_us, last_us, n)
                start_us, last_us, n = ts_us, ts_us, 1
        if start_us is not None:
            state.update((start_us, last_us, n))
            # re-arm: close exactly when the watermark proves no in-order
            # event can still extend this session (timeout API takes ms)
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)

    return fn


def session_finalizer_query(
    spark: SparkSession,
    delta_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
    available_now: bool = True,
):
    """Stream event parquet deltas; append one row per CLOSED session
    (closed by an over-gap successor event or by event-time timeout)."""
    events = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double"
        )
        .parquet(delta_dir)
        .withWatermark("ts", watermark_delay)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60_000_000),
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
