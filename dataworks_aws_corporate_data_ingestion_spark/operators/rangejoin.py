"""Interval-point range join via time-bucket equi-join.

A pure range predicate (``p.ts BETWEEN i.start AND i.end``) has no equi
key, so naive Spark plans it as BroadcastNestedLoopJoin / cartesian --
O(|intervals| x |points|), dead at scale.  The standard fix (bin
bucketing, as in Databricks' range-join optimization and kdb's window
joins) quantizes time into fixed-width buckets:

* each interval explodes to the buckets it overlaps
  (``len/width + 1`` rows for bounded interval length),
* each point maps to exactly ONE bucket,
* equi-join on the bucket id (hash shuffle, AQE-skew-splittable),
* exact range filter re-checks containment inside the matched bucket.

Because a point lives in a single bucket and an interval emits each
covered bucket once, a qualifying (interval, point) pair matches exactly
once -- no post-join dedup.  Pick ``bucket_width_s`` near the typical
interval length: much smaller multiplies interval fan-out, much larger
multiplies false candidates for the exact filter.

Timestamps are TIMESTAMP_NTZ from parquet; epoch seconds come from
``timestampdiff(SECOND, '1970-01-01', ts)`` which is session-timezone
independent (never unix_timestamp on NTZ -- see verify notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH_SECS = "timestampdiff(SECOND, TIMESTAMP'1970-01-01 00:00:00', {col})"


def _bucket(col: str, width_s: int) -> F.Column:
    return (F.expr(_EPOCH_SECS.format(col=col)) / F.lit(width_s)).cast(
        "bigint"
    )


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str = "start",
    end: str = "end",
    ts: str = "ts",
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Inner join of points into half-open intervals [start, end):
    returns every (interval-row, point-row) pair with the point's ts
    contained.  Column sets must be disjoint apart from the join
    mechanics (callers project before joining, as everywhere else in the
    engine)."""
    i_bucketed = intervals.withColumn(
        "__buckets",
        F.sequence(_bucket(start, bucket_width_s), _bucket(end, bucket_width_s)),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    p_bucketed = points.withColumn("__bucket", _bucket(ts, bucket_width_s))
    return (
        i_bucketed.join(p_bucketed, "__bucket")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__bucket")
    )
