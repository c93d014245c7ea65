"""Streaming snapshot maintenance: the weekly batch merge as a
foreachBatch upsert.

The reference rebuilds its 10 TB snapshot weekly (union + window dedup,
steps/ingesters.py:429-457).  The streaming twin applies the SAME merge
operator incrementally: each micro-batch of deltas merges into the
current snapshot and atomically replaces it.  foreachBatch is the right
primitive because the merge needs a full-snapshot read per batch --
not expressible as a stateful streaming aggregate without holding the
snapshot in state store memory.

Scale notes: per-batch cost is |snapshot| + |batch| through one range
exchange -- identical to the batch merge; trigger cadence therefore sets
the cost/freshness trade (the reference chose weekly; availableNow here
gives catch-up-then-stop semantics).  The swap is write-new -> atomic
rename, so readers never see a half-written snapshot.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_snapshot

SNAPSHOT_COLUMNS = ("id", "db_type", "val", "id_part")


def upsert_batch(
    spark: SparkSession, batch_df: DataFrame, snapshot_dir: str
) -> None:
    """Merge one micro-batch of delta rows into the parquet snapshot at
    `snapshot_dir` (created if absent), atomically."""
    cols = list(SNAPSHOT_COLUMNS)
    if os.path.exists(snapshot_dir):
        current = spark.read.parquet(snapshot_dir).select(*cols)
        merged = merge_snapshot(current, batch_df.select(*cols))
    else:
        merged = merge_snapshot(
            batch_df.sparkSession.createDataFrame([], batch_df.select(*cols).schema),
            batch_df.select(*cols),
        )
    staging = f"{snapshot_dir}.staging-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    old = f"{snapshot_dir}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(snapshot_dir):
        os.rename(snapshot_dir, old)
    os.rename(staging, snapshot_dir)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)


def streaming_merge_query(
    spark: SparkSession,
    delta_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain a deduplicated snapshot from a stream of delta parquet
    files: readStream -> foreachBatch(upsert).  Exactly-once per file via
    the checkpoint; the merge itself is idempotent (latest-per-key), so
    a replayed batch converges to the same snapshot."""
    deltas = spark.readStream.schema(
        "id string, db_type string, val string, id_part string"
    ).parquet(delta_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_batch(spark, batch_df, snapshot_dir)

    writer = (
        deltas.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
