"""Small-file compaction for partitioned datasets.

Daily partitioned writes accumulate files; a year of dailies at 256
id_part buckets is ~100k files per collection, and file-count -- not
byte-count -- drives scan planning cost and S3 listing latency.
Compaction rewrites each partition's files into size-targeted outputs,
preserving the engine's layout contract (sorted by id within files).

This is maintenance, not a query: run it out-of-band (the reference's
weekly merge implicitly compacts its snapshot; dailies between merges
are what this targets).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def plan_compaction(
    spark: SparkSession,
    path: str,
    fmt: str = "orc",
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int = 16 << 20,
):
    """Inventory a dataset's files per partition directory and report the
    partitions worth rewriting: those with 2+ files below the small-file
    threshold.  Returns a list of (partition_dir, n_files, total_bytes).
    Driver-side listing only -- no data read."""
    import os

    results = []
    for dirpath, _dirnames, filenames in os.walk(path):
        data_files = [
            os.path.join(dirpath, f)
            for f in filenames
            if not f.startswith(("_", "."))
        ]
        if not data_files:
            continue
        sizes = [os.path.getsize(f) for f in data_files]
        n_small = sum(1 for s in sizes if s < small_file_bytes)
        if n_small >= 2:
            results.append((dirpath, len(data_files), sum(sizes)))
    return results


def compact_partition(
    spark: SparkSession,
    partition_dir: str,
    fmt: str = "orc",
    compression: str = "zlib",
    target_file_bytes: int = 128 << 20,
    sort_col: str = "id",
) -> int:
    """Rewrite one partition directory into ceil(bytes/target) files,
    re-sorted by `sort_col` to preserve stripe pruning.  Returns the new
    file count.  Atomic via staging-directory rename."""
    import math
    import os
    import shutil
    import uuid

    df = spark.read.format(fmt).load(partition_dir)
    total = sum(
        os.path.getsize(os.path.join(partition_dir, f))
        for f in os.listdir(partition_dir)
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    staging = f"{partition_dir}.compact-{uuid.uuid4().hex[:8]}"
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.format(fmt)
        .option("compression", compression)
        .mode("overwrite")
        .save(staging)
    )
    old = f"{partition_dir}.old-{uuid.uuid4().hex[:8]}"
    os.rename(partition_dir, old)
    os.rename(staging, partition_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n_files
