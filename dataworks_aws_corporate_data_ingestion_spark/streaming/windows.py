"""Event-time streaming aggregations and stateful operators.

The reference is batch-only (SURVEY.md section 2.9); these are the
engine's streaming extensions: watermarked tumbling/sliding windows over
an event stream, and an applyInPandasWithState running dedup/counter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time window aggregate: counts + value sum per
    (window, event_type).  Late rows beyond the watermark are dropped and
    window state is reclaimed -- the property that keeps state bounded on
    an unbounded stream.

    Works identically over a batch DataFrame (watermark is a no-op there),
    so batch tests validate the streaming semantics."""
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    src = events
    ntz = dict(events.dtypes).get("ts") == "timestamp_ntz"
    if events.isStreaming:
        # watermarks require TIMESTAMP (LTZ); convert and undo after --
        # with hour-aligned windows the bucket boundaries are unchanged
        if ntz:
            src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    out_ts = (lambda c: c.cast("timestamp_ntz")) if ntz else (lambda c: c)
    return src.groupBy(win.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    ).select(
        out_ts(F.col("win.start")).alias("window_start"),
        out_ts(F.col("win.end")).alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native streaming session windows: per-user sessions close after
    `gap` of inactivity, window state merges as events arrive and is
    emitted/reclaimed once the watermark passes the session end.  The
    batch twin is operators/sessions.sessionize (lag + running sum);
    this is the streaming path where per-key sort windows don't exist.
    """
    src = events
    ntz = dict(events.dtypes).get("ts") == "timestamp_ntz"
    if events.isStreaming:
        if ntz:
            src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    out_ts = (lambda c: c.cast("timestamp_ntz")) if ntz else (lambda c: c)
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            out_ts(F.col("win.start")).alias("session_start"),
            out_ts(F.col("win.end")).alias("session_end"),
            "n_events",
        )
    )


_DEDUP_STATE = StructType([StructField("max_seen", LongType())])
_DEDUP_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    max_seen = state.get[0] if state.exists else -1
    for pdf in pdfs:
        fresh = pdf[pdf["event_id"] > max_seen]
        if len(fresh):
            max_seen = int(fresh["event_id"].max())
            yield pd.DataFrame(
                {
                    "user_id": fresh["user_id"].astype("int64"),
                    "event_id": fresh["event_id"].astype("int64"),
                    "event_type": fresh["event_type"],
                }
            )
    state.update((max_seen,))


def apply_stateful_dedup(events: DataFrame) -> DataFrame:
    """Per-user monotonic-id dedup as a custom stateful streaming operator
    (applyInPandasWithState).  Emits each (user_id, event_id) at most once
    across micro-batches; state is one bigint per user."""
    return (
        events.select("user_id", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_DEDUP_OUT,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def apply_watermark_dedup(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id", "event_id"),
    delay: str = "10 minutes",
) -> DataFrame:
    """Built-in twin of apply_stateful_dedup: exactly-once admission of
    `keys` across micro-batches via dropDuplicatesWithinWatermark --
    state per key is managed AND EVICTED by the engine once the
    watermark passes, which is the property the custom
    applyInPandasWithState form lacks (its per-user high-water mark
    lives forever).  Use this form when keys are time-scoped (at-least-
    once replays arrive within a bounded delay); the custom form when
    admission needs a domain rule (monotonic ids) rather than a time
    horizon."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
