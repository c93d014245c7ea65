"""Custom stateful streaming operator: per-key online anomaly detection.

Built-in streaming ops cover windows, sessions, and latest-per-key; a
running PER-EVENT statistic against each key's own history (emit an
alert the moment a value deviates from that user's running mean) is not
expressible with them -- it needs arbitrary state carried across
micro-batches.  This is the engine's canonical applyInPandasWithState
shape: state = Welford (count, mean, M2) per user, updated in event-time
order, alerts appended as they occur.

Scale notes: state is 3 numbers per key (a billion users ~ 24 GB across
the cluster, partitioned by the groupBy hash); each micro-batch touches
only the keys present in it.  The same job shape runs unchanged under a
real source + checkpoint; tests drive it with availableNow over parquet
deltas, replaying batches to show state survives restarts via the
checkpoint.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("mean_before", DoubleType()),
        StructField("std_before", DoubleType()),
        StructField("n_before", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _zscore_fn(k: float, min_n: int):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        rows = []
        # a group's micro-batch arrives as MULTIPLE arrow chunks when it
        # exceeds maxRecordsPerBatch, and chunk boundaries follow shuffle
        # arrival, not time -- concatenate BEFORE the sort or cross-chunk
        # events process out of event-time order.  A timed-out key (any
        # future GroupStateTimeout config) is invoked with an EMPTY chunk
        # iterator, where bare pd.concat raises.
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            if chunks
            else pd.DataFrame(columns=["ts", "event_id", "value"])
        )
        if len(pdf):
            for event_id, value in zip(pdf["event_id"], pdf["value"]):
                value = float(value)
                if n >= min_n:
                    std = (m2 / (n - 1)) ** 0.5 if n > 1 else 0.0
                    if std > 0.0 and abs(value - mean) > k * std:
                        rows.append(
                            (int(user_id), int(event_id), value, mean, std, n)
                        )
                # Welford update AFTER the test: an outlier is judged
                # against history, then becomes part of it
                n += 1
                delta = value - mean
                mean += delta / n
                m2 += delta * (value - mean)
        state.update((n, mean, m2))
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in ALERT_SCHEMA.fields])

    return fn


def zscore_alert_query(
    spark: SparkSession,
    delta_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: float = 3.0,
    min_n: int = 10,
    available_now: bool = True,
):
    """Stream event parquet deltas; append one alert row per event whose
    value is > k running standard deviations from that user's mean."""
    events = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double"
    ).parquet(delta_dir)
    alerts = events.groupBy("user_id").applyInPandasWithState(
        _zscore_fn(k, min_n),
        ALERT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        alerts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SEQ_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_matches", LongType()),
        StructField("pending_stage", LongType()),
    ]
)

SEQ_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType()),
        StructField("cnt", LongType()),
    ]
)


def _sequence_fn(terminal: int):
    """Automaton advance identical to the batch Catalyst fold
    (workloads/analytic.py::user_sequence_match_counts): greedy
    non-overlapping subsequence matching, state = (stage, count)."""

    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        stage, cnt = state.get if state.exists else (0, 0)
        # concat-then-sort: chunk boundaries are arrival-ordered, and a
        # chunk-local sort would feed the automaton out of time order
        # for groups spanning multiple arrow chunks; guard the empty
        # iterator a timed-out key would deliver
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            if chunks
            else pd.DataFrame(columns=["ts", "event_id", "code"])
        )
        if len(pdf):
            for c in pdf["code"]:
                if int(c) == stage + 1:
                    if stage + 1 == terminal:
                        cnt += 1
                        stage = 0
                    else:
                        stage += 1
        state.update((stage, cnt))
        yield pd.DataFrame(
            [(int(user_id), cnt, stage)],
            columns=[f.name for f in SEQ_OUT_SCHEMA.fields],
        )

    return fn


def sequence_match_query(
    spark: SparkSession,
    delta_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Unbounded-stream twin of user_sequence_match_counts: the batch
    form folds each user's WHOLE history into an array, which an
    endless stream can never materialise; here the (stage, count)
    automaton state lives in the state store and each micro-batch
    advances it with only its own events (in event-time order within
    the batch; cross-batch order is arrival order, the streaming
    contract).  Emits one running-total row per touched user per batch
    -- the LAST row per user in the sink is the current total, and the
    batch fold over the same prefix is the equivalence test.

    Scale notes: state is two longs per user; a batch touches only the
    keys it contains.  Restart-safe via the checkpoint exactly like
    zscore_alert_query."""
    from pyspark.sql import functions as F

    events = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double"
    ).parquet(delta_dir)
    coded = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 3)
        .otherwise(0)
        .cast("bigint")
        .alias("code"),
    )
    totals = coded.groupBy("user_id").applyInPandasWithState(
        _sequence_fn(3),
        SEQ_OUT_SCHEMA,
        SEQ_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        totals.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
