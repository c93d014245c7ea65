"""Gap-fill: dense spine, forward-filled values, gap flags."""

from __future__ import annotations

import datetime

from dataworks_aws_corporate_data_ingestion_spark.operators.timeseries import (
    daily_rollup,
    gap_fill_forward,
)


def test_gap_fill_forward(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 5.0),
        (1, "2024-01-01 11:00:00", 2.5),
        (1, "2024-01-04 09:00:00", 1.0),   # 2-day gap before this
        (2, "2024-01-02 00:00:00", 7.0),   # single-day key: no spine rows
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = gap_fill_forward(daily_rollup(df, "user_id", "ts", "value"), "user_id")
    got = {
        (r["user_id"], str(r["day"])): (r["filled_value"], r["is_gap"])
        for r in out.collect()
    }
    assert got == {
        (1, "2024-01-01"): (7.5, False),
        (1, "2024-01-02"): (7.5, True),
        (1, "2024-01-03"): (7.5, True),
        (1, "2024-01-04"): (1.0, False),
        (2, "2024-01-02"): (7.0, False),
    }
    # spine covers each key's span exactly: no rows outside [min, max]
    days = [d for (u, d) in got if u == 1]
    assert min(days) == "2024-01-01" and max(days) == "2024-01-04"


def test_filled_value_is_copy_not_recompute(spark):
    """The filled double must be bit-identical to its source day."""
    rows = [(1, "2024-01-01 00:00:00", 0.1), (1, "2024-01-03 00:00:00", 0.3)]
    df = spark.createDataFrame(rows, "user_id bigint, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = gap_fill_forward(daily_rollup(df, "user_id", "ts", "value"), "user_id")
    by_day = {str(r["day"]): r["filled_value"] for r in out.collect()}
    assert by_day["2024-01-02"] == by_day["2024-01-01"]
