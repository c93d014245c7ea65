"""transformWithStateInPandas (Spark 4 arbitrary-state API) operator.

applyInPandasWithState (stateful.py, session_state.py) carries ONE tuple
of state per key.  The transformWithState API generalises that: named
state variables (value/list/map), per-state TTL, timers, and an initial-
state hookup -- the API Spark is standardising stateful pipelines on.
This module ports the engine's running-aggregate shape to it: a per-user
lifetime value total + event count that survives across micro-batches in
a ValueState, emitting each user's updated totals once per batch touched.

Requires the RocksDB state store provider (bundled with Spark); the
query builder below sets it on the session conf -- the HDFS-backed
default store does not implement the multi-variable state API.

Scale notes: state is one (sum, count) pair per user in RocksDB --
memory-bounded with changelog checkpointing, the store built for state
larger than executor heap.  The optional `ttl_minutes` demonstrates the
API's state-expiry: idle users' state is dropped by TTL instead of
accumulating forever (the same state-boundedness discipline as the
EventTimeTimeout sessionizer, but declarative)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TOTALS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("total", DoubleType()), StructField("n", LongType())]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user lifetime (sum(value), count) in a named ValueState."""

    def __init__(self, ttl_minutes: int | None = None):
        self._ttl_ms = ttl_minutes * 60_000 if ttl_minutes else None

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", _STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        total, n = self._totals.get() if self._totals.exists() else (0.0, 0)
        for pdf in rows:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
        self._totals.update((total, n))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "total_value": [total],
                "n_events": [n],
            }
        )

    def close(self) -> None:
        pass


def running_totals_query(
    spark: SparkSession,
    delta_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    ttl_minutes: int | None = None,
    available_now: bool = True,
):
    """Stream event parquet deltas; append each touched user's updated
    lifetime totals per micro-batch (latest row per user = current
    totals).

    transformWithStateInPandas requires the RocksDB provider; the
    session conf is switched only for the duration of query START and
    restored afterwards (a started query keeps the provider it was
    planned with), so later streaming queries restarting from
    HDFS-provider checkpoints in the same session are unaffected."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double"
        ).parquet(delta_dir)
        totals = events.groupBy("user_id").transformWithStateInPandas(
            RunningTotalsProcessor(ttl_minutes),
            TOTALS_OUT_SCHEMA,
            "Append",
            "None",
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
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
