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

Scale notes: one hash exchange on `shard` (see write_training_shards for
the task-count choice), then a per-shard local sort that spills if a
shard outgrows memory.  Size n_shards so corpus/N lands near the target
shard file size (e.g. 100 TB / 4 GB targets ~25k shards).  The shard id
derives from a 32-bit hash bucket, so `bucket % n_shards` is uniform to
within n_shards/2^32 (< 0.001% at 25k shards) under ANY key
distribution -- the hash, not the key skew, decides membership.  (A
16-bit bucket would NOT be enough: 65536 % 25000 != 0 leaves a
deterministic 3:2 size imbalance between low and high residues.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_hash(key: Column, salt: str) -> Column:
    """Full md5 hex of (salt || key): the per-row shuffle key.  Its first
    8 hex chars give a 32-bit shard bucket; the full digest orders rows
    within the shard, so membership and position derive from one hash."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))


def _shard_of(h: Column, n_shards: int) -> Column:
    """Shard id in [0, n_shards) from an order-hash column: 32-bit prefix
    bucket mod n_shards (non-negative, so % == pmod)."""
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards).cast(
        "int"
    )


def _check_n_shards(n_shards: int) -> None:
    if not 1 <= n_shards <= 1 << 22:
        # the 32-bit bucket keeps mod-bias below n_shards/2^32; past ~4M
        # shards the bias (and the per-task overhead) says widen the
        # prefix instead.
        raise ValueError(f"n_shards must be in [1, {1 << 22}], got {n_shards}")


def assign_shards(
    df: DataFrame,
    key: str | Column,
    n_shards: int,
    salt: str = "shard",
    shard_col: str = "shard",
) -> DataFrame:
    """Add a deterministic shard id in [0, n_shards): the md5 32-bit
    prefix bucket mod n_shards.  Pure per-row projection -- no shuffle;
    any engine recomputes the identical assignment (the hex prefix
    parses the same everywhere; only hex-to-int CONVERSION syntax
    differs per dialect, not the value)."""
    _check_n_shards(n_shards)
    key_col = F.col(key) if isinstance(key, str) else key
    h = _order_hash(key_col, salt)
    return df.withColumn(shard_col, _shard_of(h, n_shards))


def shuffle_shards(
    df: DataFrame,
    key: str | Column,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Assign every row (shard, pos): shard as in assign_shards, pos the
    1-based rank of the row's full order-hash within its shard.  The
    hash is materialised ONCE as a column -- shard derivation and the
    window order key both read it -- and the window partitions by
    shard, so Spark plans one hash exchange followed by per-shard
    sorts: no global ordering anywhere, yet concatenating shards
    0..N-1 yields a total pseudo-random order any auditor can
    recompute."""
    _check_n_shards(n_shards)
    key_col = F.col(key) if isinstance(key, str) else key
    hashed = df.withColumn("__h", _order_hash(key_col, salt)).withColumn(
        "shard", _shard_of(F.col("__h"), n_shards)
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), key_col.asc())
    return hashed.withColumn("pos", F.row_number().over(w).cast("bigint")).drop(
        "__h"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str | Column,
    n_shards: int,
    salt: str = "shard",
    tasks_per_shard: int = 4,
    fmt: str = "parquet",
    compression: str = "snappy",
) -> None:
    """Materialise the shuffled corpus as shard=K directories, rows in
    order-hash order within each shard.

    Routing: repartition(M, shard) assigns each shard's rows to exactly
    ONE task (hash routing is deterministic per value), which is what
    keeps every shard a single file with a totally ordered row sequence.
    But murmur3(shard) % M collides: with M == n_shards a large
    fraction of tasks would carry 2-3 whole shards (and others none),
    so M defaults to tasks_per_shard * n_shards -- collisions drop to
    ~1/tasks_per_shard per pair and the empty slots cost only task
    bookkeeping.  A task carrying two shards still writes each to its
    own directory (partitionBy), so the layout contract is unaffected;
    only tail parallelism is.  The dynamic partition overwrite keeps
    re-runs idempotent per shard."""
    _check_n_shards(n_shards)
    if tasks_per_shard < 1:
        raise ValueError(f"tasks_per_shard must be >= 1, got {tasks_per_shard}")
    key_col = F.col(key) if isinstance(key, str) else key
    clustered = (
        df.withColumn("__h", _order_hash(key_col, salt))
        .withColumn("shard", _shard_of(F.col("__h"), n_shards))
        .repartition(tasks_per_shard * n_shards, "shard")
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
