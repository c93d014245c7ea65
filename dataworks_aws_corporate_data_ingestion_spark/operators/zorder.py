"""Z-order (Morton-curve) clustering for multi-dimensional pruning.

The engine's write discipline clusters one key chain (range partition by
(id_part, id) -- reference docs/data-storage.md:101-103).  That layout
prunes ONE dimension; a table queried by several independent range
predicates (user x time, key x bucket) wants files whose bounding boxes
are small in ALL of them.  Interleaving the bits of the dimensions into
one scalar (the Morton/Z curve) and range-clustering on it gives exactly
that: each output file covers a compact hyper-rectangle, so min/max
stats skip files/row-groups for predicates on ANY of the interleaved
columns -- the technique Delta/Iceberg expose as OPTIMIZE ZORDER BY,
built here from public bit arithmetic.

Everything is JVM columnar (shift/and/or chains inside
WholeStageCodegen) and the z-value formula is plain integer bit math, so
it carries a cross-engine SQL oracle like any other operator.

Scale notes: the z-value is a per-row projection (no shuffle of its
own); the clustering cost is the same single range exchange any
clustered write pays.  Bits per dimension bound the curve resolution --
16 bits x 2-4 dims fits comfortably in one BIGINT; clamp, don't wrap,
out-of-range values so the curve stays monotone at the edges.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of `cols` (each clamped to [0, 2^bits)): bit b
    of column i lands at position b*len(cols)+i of the result."""
    n = len(cols)
    assert n * bits <= 63, "z-value must fit a signed 64-bit integer"
    hi = (1 << bits) - 1
    clamped = [
        F.greatest(F.lit(0).cast("long"), F.least(c.cast("long"), F.lit(hi).cast("long")))
        for c in cols
    ]
    terms = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
        )
        for b in range(bits)
        for i, c in enumerate(clamped)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    fmt: str = "parquet",
    compression: str = "snappy",
) -> None:
    """Write `df` range-clustered and sorted along the Z curve of `cols`.
    Files then carry tight min/max ranges on EVERY interleaved column,
    so later scans with range predicates on any of them skip files and
    row-groups instead of reading the world."""
    z = zvalue([F.col(c) for c in cols], bits)
    clustered = df.withColumn("__z", z)
    clustered = (
        clustered.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else clustered.repartitionByRange("__z")
    )
    (
        clustered.sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .option("compression", compression)
        .mode("overwrite")
        .save(path)
    )


def file_clustering_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file bounding boxes over `cols` for a written dataset -- the
    direct measure of how prunable a layout is (a range predicate skips
    every file whose box misses it).  One scan, one aggregate keyed by
    file name."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), *[F.col(c) for c in cols]
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file").agg(*aggs)
