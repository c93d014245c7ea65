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
    StringType,
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
        for pdf in pdfs:
            # event-time order makes the online statistic deterministic
            pdf = pdf.sort_values(["ts", "event_id"])
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
