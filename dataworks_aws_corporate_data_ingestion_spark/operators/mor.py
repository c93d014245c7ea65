"""Merge-on-read snapshot layout: base + delta batches, deduplicated at
read time, compacted explicitly.

The reference rewrites its full 10 TB snapshot weekly to apply ~1% of
deltas (copy-on-write).  Merge-on-read defers that: daily deltas append
cheaply, readers union base + deltas through the same latest-per-key
window the batch merge uses, and compaction (the old full merge) runs
only when the delta fraction makes read amplification hurt.  Weekly
write cost drops ~10x; read cost grows with len(deltas) until compact.

Layout (filesystem-atomic on local/HDFS; object stores want a manifest
file instead of directory listing -- noted, not implemented):

    table_dir/base/            range-clustered snapshot (id_part buckets)
    table_dir/deltas/<batch>/  append-only delta batches

Delete semantics follow the reference: DELETE rows win over INSERT for
the same key (db_type ascending), so deletions tombstone at read time
and physically vanish at compaction.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import merge_snapshot

COLUMNS = ("id", "db_type", "val", "id_part")


def _base_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "base")


def _deltas_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "deltas")


def write_delta(df: DataFrame, table_dir: str) -> str:
    """Append one delta batch; returns its directory.  Cheap: no read of
    existing state, no shuffle beyond the caller's.

    Batch names carry a monotonic nanosecond prefix: read_merged derives
    generation order from the SORTED names, so names must sort in
    arrival order (a bare uuid would randomise who wins a key)."""
    batch_dir = os.path.join(
        _deltas_dir(table_dir),
        f"batch-{time.time_ns():020d}-{uuid.uuid4().hex[:6]}",
    )
    df.select(*COLUMNS).write.mode("errorifexists").parquet(batch_dir)
    return batch_dir


def read_merged(spark: SparkSession, table_dir: str) -> DataFrame:
    """The current logical snapshot: base + all deltas through the
    latest-per-key merge.  Later delta batches beat earlier ones and all
    deltas beat base; within a batch, DELETE beats INSERT (reference
    rule).  Ordering uses a generation stamp per source."""
    frames = []
    base = _base_dir(table_dir)
    if os.path.exists(base):
        frames.append(
            spark.read.parquet(base).select(*COLUMNS).withColumn("__gen", F.lit(0))
        )
    deltas = _deltas_dir(table_dir)
    if os.path.exists(deltas):
        for gen, batch in enumerate(sorted(os.listdir(deltas)), start=1):
            frames.append(
                spark.read.parquet(os.path.join(deltas, batch))
                .select(*COLUMNS)
                .withColumn("__gen", F.lit(gen))
            )
    if not frames:
        raise FileNotFoundError(f"no base or deltas under {table_dir}")
    unioned = frames[0]
    for f in frames[1:]:
        unioned = unioned.unionByName(f)
    from pyspark.sql import Window

    w = Window.partitionBy("id_part", "id").orderBy(
        F.col("__gen").desc(), F.col("db_type").asc(), F.col("val").desc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("db_type") != "DELETE")  # tombstones resolve at read
        .select(*COLUMNS)
    )


def delta_fraction(spark: SparkSession, table_dir: str) -> float:
    """Deltas-to-base row ratio -- the compaction trigger metric."""
    deltas = _deltas_dir(table_dir)
    base = _base_dir(table_dir)
    n_delta = (
        spark.read.parquet(os.path.join(deltas, "*")).count()
        if os.path.exists(deltas) and os.listdir(deltas)
        else 0
    )
    n_base = spark.read.parquet(base).count() if os.path.exists(base) else 0
    return n_delta / max(n_base, 1)


def compact(spark: SparkSession, table_dir: str) -> None:
    """Fold all deltas into a new range-clustered base and clear them --
    the reference's weekly merge, now run on-demand.  Tombstoned keys
    physically disappear here."""
    merged = read_merged(spark, table_dir)
    staging = os.path.join(table_dir, f"base.staging-{uuid.uuid4().hex[:8]}")
    (
        merged.repartitionByRange("id_part", "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .parquet(staging)
    )
    base = _base_dir(table_dir)
    old = os.path.join(table_dir, f"base.old-{uuid.uuid4().hex[:8]}")
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(staging, base)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(_deltas_dir(table_dir), ignore_errors=True)
