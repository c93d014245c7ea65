"""Time-series workload: resample + gap-fill over the events stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.timeseries import daily_rollup, gap_fill_forward
from ..sources.tables import load_table
from ..workload import register


@register(
    "events_gap_filled_daily",
    tags=("timeseries", "gap-fill", "window", "spine-join"),
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                       AS day_value
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ), spans AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
            FROM daily GROUP BY user_id
        ), spine AS (
            SELECT user_id,
                   CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                               CAST(d1 AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM spans
        )
        SELECT s.user_id AS user_id, s.day AS day,
               last_value(d.day_value IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value,
               d.day_value IS NULL AS is_gap
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def events_gap_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily value series regularised onto a dense calendar
    spine with gaps forward-filled -- resample + ffill, the standard
    feature-engineering pre-step for irregular event streams.

    Scale notes: see operators/timeseries.py -- spine rows are generated
    key-local from each user's own span (no calendar cross join), the
    spine->daily join and the forward-fill window share one hash
    partitioning on user_id, and the fill copies doubles rather than
    recomputing, which is also what makes it oracle-exact."""
    events = load_table(spark, "events", sf_dir)
    daily = daily_rollup(events, key="user_id", ts="ts", value="value")
    return gap_fill_forward(daily, key="user_id")
