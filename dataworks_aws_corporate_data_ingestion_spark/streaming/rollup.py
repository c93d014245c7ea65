"""Continuous aggregate: an hourly rollup maintained incrementally.

Recomputing a windowed aggregate over all history each day is O(history);
maintaining it is O(delta): aggregate each micro-batch to partial rows,
then ADD them into the stored rollup (sum-merge on the group keys).
Works for any commutative-associative aggregate (counts, sums, min/max,
sketches); averages are stored as (sum, count) and finalised at read.

Same foreachBatch + atomic-swap skeleton as streaming/merge.py -- the
difference is the merge operator: additive combine instead of
latest-per-key.  Exactly-once per input file via the checkpoint; replay
safety comes from the checkpoint (an additive merge is NOT idempotent,
so the swap must stay atomic and the checkpoint authoritative).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ("window_start", "event_type")


def _batch_partials(batch_df: DataFrame, window: str) -> DataFrame:
    return (
        batch_df.groupBy(
            F.window("ts", window).start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value"),
        )
    )


def merge_rollup(current: DataFrame | None, partials: DataFrame) -> DataFrame:
    """Additive combine of stored rollup rows and new partials."""
    unioned = (
        current.unionByName(partials) if current is not None else partials
    )
    return unioned.groupBy(*ROLLUP_KEYS).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
    )


def continuous_rollup_query(
    spark: SparkSession,
    delta_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    available_now: bool = True,
):
    """Maintain the (window, event_type) rollup from a stream of event
    parquet files.  Read side finalises averages as sum/count."""
    events = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double"
    ).parquet(delta_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partials = _batch_partials(batch_df, window)
        current = (
            spark.read.parquet(rollup_dir)
            if os.path.exists(rollup_dir)
            else None
        )
        merged = merge_rollup(current, partials)
        staging = f"{rollup_dir}.staging-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(staging)
        old = f"{rollup_dir}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(rollup_dir):
            os.rename(rollup_dir, old)
        os.rename(staging, rollup_dir)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
