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


def zvalue(cols: list[Column], bits: int | list[int] = 16) -> Column:
    """Morton interleave of `cols` (each clamped to [0, 2^bits_i)).

    `bits` may be per-column: the interleave is round-robin over columns
    that still have bits left, low bits first, so with equal widths bit b
    of column i lands at position b*len(cols)+i (the classic layout).
    Per-column widths matter because the curve only balances dimensions
    of comparable RANGE -- interleaving a 4-bit day counter against a
    16-bit id rank at equal width leaves the id's high bits on top and
    the layout degenerates to an id sort (Delta/Iceberg OPTIMIZE ZORDER
    solve this by rank-normalising every column; fixed per-dim widths
    over pre-scaled values get the same balance without the extra
    window pass)."""
    n = len(cols)
    widths = [bits] * n if isinstance(bits, int) else list(bits)
    assert len(widths) == n and sum(widths) <= 63, "z-value must fit 64-bit signed"
    clamped = [
        F.greatest(
            F.lit(0).cast("long"),
            F.least(c.cast("long"), F.lit((1 << w) - 1).cast("long")),
        )
        for c, w in zip(cols, widths)
    ]
    terms, pos = [], 0
    for b in range(max(widths)):
        for i, c in enumerate(clamped):
            if b < widths[i]:
                terms.append(
                    F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), pos)
                )
                pos += 1
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


def lexical_rank(col: Column, n_chars: int = 2) -> Column:
    """Order-preserving numeric projection of a string's first `n_chars`
    ASCII bytes (base-256 positional).  Order preservation matters: the
    z-curve dimension must sort like the string itself, or per-file
    min/max stats on the STRING column go wide and stats-based pruning of
    id predicates dies.  (A hash would balance better but is useless for
    range pruning.)"""
    padded = F.rpad(col, n_chars, "\x00")
    terms = [
        F.ascii(F.substring(padded, i + 1, 1)).cast("long") * (256 ** (n_chars - 1 - i))
        for i in range(n_chars)
    ]
    return reduce(lambda a, b: a + b, terms)


def write_daily_flat_zordered(
    df: DataFrame,
    path: str,
    base_date: str = "1970-01-01",
    day_bits: int = 12,
    id_bits: int = 12,
    num_partitions: int | None = None,
    fmt: str = "parquet",
    compression: str = "snappy",
) -> None:
    """FLAT alternative to the directory-partitioned daily sink: one
    dataset z-ordered by (days-since-base, id prefix rank) instead of
    .../export_year=Y/export_month=M/export_day=D/id_part=P/ directories.

    When to prefer which (measured in tests/test_zorder.py, recorded in
    SCALE.md): directory partitioning prunes day predicates EXACTLY and
    feeds the merge's (id_part, id) range exchange nearly-sorted runs --
    it stays the default.  But at thousands of days x modest daily volume
    the per-day-per-id_part leaf directories each hold a sliver file
    (file count ~ days x id_parts); the flat z-layout sizes files by DATA
    volume, with day ranges AND id ranges still skippable via min/max
    stats -- the small-files regime is where it wins.

    `base_date` anchors the day dimension: set it near the table's first
    day so the day counter actually VARIES within its day_bits window
    (12 bits ~ 11 years); a far-away epoch base leaves the varying bits
    in the counter's low end, which the clamp would not fix but a huge
    constant offset above 2^day_bits would (everything clamps to the
    max and day pruning dies).  Expects the usual daily columns
    (export_year/month/day, id)."""
    (
        daily_flat_zorder_plan(df, base_date, day_bits, id_bits, num_partitions)
        .write.format(fmt)
        .option("compression", compression)
        .mode("overwrite")
        .save(path)
    )


def daily_flat_zorder_plan(
    df: DataFrame,
    base_date: str = "1970-01-01",
    day_bits: int = 12,
    id_bits: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """The layout transform write_daily_flat_zordered feeds its sink:
    exposed separately so bench.py can fingerprint the plan (plan_sha)
    without touching the filesystem."""
    day_no = F.datediff(
        F.make_date("export_year", "export_month", "export_day"),
        F.lit(base_date).cast("date"),
    )
    # id rank is 16 bits of prefix; scale to id_bits so the interleave
    # weights dimensions by their configured resolution
    id_rank = F.shiftright(lexical_rank(F.col("id")), max(0, 16 - id_bits))
    z = zvalue([day_no, id_rank], [day_bits, id_bits])
    clustered = df.withColumn("__z", z)
    clustered = (
        clustered.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else clustered.repartitionByRange("__z")
    )
    return clustered.sortWithinPartitions("__z").drop("__z")


def files_opened_by(
    stats: list[dict], predicates: dict[str, tuple]
) -> int:
    """How many files a stats-pruned scan must open: count files whose
    [min_c, max_c] box intersects every predicate interval.  `stats` is
    file_clustering_stats().collect() rows (as dicts); `predicates` maps
    column -> (lo, hi) inclusive.  Driver-side on file-count-sized data
    (file metadata, not rows) -- the same arithmetic the parquet reader's
    row-group filter runs."""
    n = 0
    for row in stats:
        ok = True
        for c, (lo, hi) in predicates.items():
            if row[f"max_{c}"] < lo or row[f"min_{c}"] > hi:
                ok = False
                break
        n += ok
    return n


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
