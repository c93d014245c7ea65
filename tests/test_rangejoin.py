"""Bucketed interval-point join: boundary semantics, bucket spanning,
exactly-once pair emission."""

from __future__ import annotations

from dataworks_aws_corporate_data_ingestion_spark.operators.rangejoin import (
    interval_point_join,
)


def _frames(spark, intervals, points):
    i = spark.createDataFrame(intervals, "iid bigint, start string, end string")
    i = i.select("iid", i.start.cast("timestamp").alias("start"), i.end.cast("timestamp").alias("end"))
    p = spark.createDataFrame(points, "pid bigint, ts string")
    p = p.select("pid", p.ts.cast("timestamp").alias("ts"))
    return i, p


def test_half_open_boundaries_and_spanning(spark):
    i, p = _frames(
        spark,
        [(1, "2024-01-01 10:30:00", "2024-01-01 11:30:00")],
        [
            (1, "2024-01-01 10:30:00"),  # == start: in
            (2, "2024-01-01 11:29:59"),  # inside, second bucket
            (3, "2024-01-01 11:30:00"),  # == end: out (half-open)
            (4, "2024-01-01 10:29:59"),  # before start, same bucket: out
            (5, "2024-01-01 12:00:00"),  # past every covered bucket
        ],
    )
    got = sorted(
        r["pid"]
        for r in interval_point_join(i, p, bucket_width_s=3600).collect()
    )
    assert got == [1, 2]


def test_pairs_emitted_exactly_once(spark):
    """An interval spanning 3 buckets must not duplicate matches."""
    i, p = _frames(
        spark,
        [(1, "2024-01-01 10:00:00", "2024-01-01 12:59:00")],
        [(1, "2024-01-01 10:30:00"), (2, "2024-01-01 12:30:00")],
    )
    rows = interval_point_join(i, p, bucket_width_s=3600).collect()
    assert sorted(r["pid"] for r in rows) == [1, 2]


def test_overlapping_intervals_each_match(spark):
    i, p = _frames(
        spark,
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            (2, "2024-01-01 10:45:00", "2024-01-01 11:45:00"),
        ],
        [(7, "2024-01-01 10:50:00")],
    )
    rows = interval_point_join(i, p).collect()
    assert sorted((r["iid"], r["pid"]) for r in rows) == [(1, 7), (2, 7)]
