"""Time-series regularisation: dense calendar spine + forward fill.

Event streams are irregular; downstream consumers (rate-of-change
features, charting, SCD-style joins) want one row per (key, period) with
gaps carried forward.  The scale-correct shape is:

1. per-key daily aggregate (one hash shuffle, map-side combined),
2. per-key min/max span (tiny aggregate on the daily frame),
3. spine = explode(sequence(d0, d1)) -- rows proportional to the span,
   generated key-local, never a cross join against a calendar table,
4. left join spine->daily on (key, day): both sides hash-partition on
   the same key so AQE plans a co-located join,
5. forward fill = last(value, ignorenulls) over (key ORDER BY day ROWS
   UNBOUNDED PRECEDING..CURRENT) -- same partitioning as the join, so
   the window reuses the exchange instead of adding one.

A 100 TB event table with bounded per-key spans stays linear: no stage
materialises more than (keys x span-days) rows, and nothing funnels
through a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_rollup(
    df: DataFrame, key: str, ts: str, value: str
) -> DataFrame:
    """(key, day, day_value): per-key daily sums.  The sum runs in exact
    DECIMAL and converts to DOUBLE once, per the engine's cross-engine
    float convention."""
    return (
        df.groupBy(
            F.col(key), F.col(ts).cast("date").alias("day")
        )
        .agg(
            F.sum(F.col(value).cast("decimal(12,2)"))
            .cast("double")
            .alias("day_value")
        )
    )


def gap_fill_forward(
    daily: DataFrame, key: str, day: str = "day", value: str = "day_value"
) -> DataFrame:
    """Dense per-key daily series with gaps forward-filled.

    Output: (key, day, filled_value, is_gap) -- one row per calendar day
    between each key's first and last observation.  Forward fill COPIES
    the previous observed double (no arithmetic), so filled values are
    bit-identical to their source rows in any engine."""
    spans = daily.groupBy(key).agg(
        F.min(day).alias("__d0"), F.max(day).alias("__d1")
    )
    spine = spans.select(
        key,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias(day),
    )
    dense = spine.join(daily, [key, day], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key,
        day,
        F.last(value, ignorenulls=True).over(w).alias("filled_value"),
        F.col(value).isNull().alias("is_gap"),
    )
