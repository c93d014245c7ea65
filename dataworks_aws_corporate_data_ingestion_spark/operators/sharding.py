"""Deterministic global shuffle into numbered training shards.

The last step of every training-data pipeline: emit the curated corpus as
N shard files in a pseudo-random document order that is (a) stable across
runs and cluster layouts, (b) reproducible by any engine that can compute
md5, and (c) produced WITHOUT a global sort.  `df.orderBy(rand())` fails
all three: rand() is layout-dependent and a global order is a single
range-sort of the world.  Hashing row identity fixes determinism, and
partitioning BY SHARD makes the order per-shard-local: shard membership
and within-shard position are both pure functions of (salt, key), and
each shard sorts independently -- N parallel sorts of corpus/N rows, the
same discipline as the daily writer's range clustering, never one
global sort.

Consumers read shards in filename order and get the same document
sequence every time; a training run that dies mid-epoch can seek to
(shard, pos) and resume.

Scale notes: one hash exchange on `shard` (N reducers), then a per-shard
local sort that spills if a shard outgrows memory.  Size n_shards so
corpus/N lands near the target shard file size (e.g. 100 TB / 4 GB
targets ~25k shards); the md5 bucket space keeps shard sizes balanced
within sampling noise regardless of key skew, because the hash, not the
key distribution, decides membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_hash(key: Column, salt: str) -> Column:
    """Full md5 hex of (salt || key): the per-row shuffle key.  Its first
    4 hex chars decide the shard; the full digest orders rows within the
    shard, so shard membership and position derive from one hash."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))


def assign_shards(
    df: DataFrame,
    key: str | Column,
    n_shards: int,
    salt: str = "shard",
    shard_col: str = "shard",
) -> DataFrame:
    """Add a deterministic shard id in [0, n_shards): the md5 16-bit
    prefix bucket mod n_shards.  Pure per-row projection -- no shuffle;
    any engine recomputes the identical assignment (the hex prefix
    parses the same everywhere; only hex-to-int CONVERSION syntax
    differs per dialect, not the value)."""
    if not 1 <= n_shards <= 65536:
        # the shard id derives from a 16-bit hash bucket; more shards
        # than buckets would leave shards permanently empty.  Widen the
        # prefix before widening this limit.
        raise ValueError(f"n_shards must be in [1, 65536], got {n_shards}")
    key_col = F.col(key) if isinstance(key, str) else key
    h = _order_hash(key_col, salt)
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
    return df.withColumn(shard_col, bucket % n_shards)


def shuffle_shards(
    df: DataFrame,
    key: str | Column,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Assign every row (shard, pos): shard as in assign_shards, pos the
    1-based rank of the row's full order-hash within its shard.  The
    window partitions by shard, so Spark plans ONE hash exchange on
    shard followed by per-shard sorts -- no global ordering anywhere,
    yet concatenating shards 0..N-1 yields a total pseudo-random order
    any auditor can recompute."""
    key_col = F.col(key) if isinstance(key, str) else key
    with_shard = assign_shards(df, key_col, n_shards, salt=salt)
    h = _order_hash(key_col, salt)
    w = Window.partitionBy("shard").orderBy(h.asc(), key_col.asc())
    return with_shard.withColumn("pos", F.row_number().over(w).cast("bigint"))


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str | Column,
    n_shards: int,
    salt: str = "shard",
    fmt: str = "parquet",
    compression: str = "snappy",
) -> None:
    """Materialise the shuffled corpus as shard=K directories, rows in
    order-hash order within each shard.  repartition(n_shards, shard)
    gives every shard its own reducer (one task == one shard directory),
    sortWithinPartitions fixes the in-file row order, and the dynamic
    partition overwrite keeps re-runs idempotent per shard."""
    key_col = F.col(key) if isinstance(key, str) else key
    clustered = (
        assign_shards(df, key_col, n_shards, salt=salt)
        .withColumn("__h", _order_hash(key_col, salt))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__h")
        .drop("__h")
    )
    (
        clustered.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .format(fmt)
        .option("compression", compression)
        .mode("overwrite")
        .save(path)
    )
