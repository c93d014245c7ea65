"""Gap-based sessionization over an event stream (batch form).

Assigns a per-key session number that increments whenever the gap to the
previous event exceeds the threshold: lag + conditional flag + running
sum, all in one window partition -- a single shuffle on the key, no
self-join.  The streaming twin of this operator is
streaming.windows.session_window (Spark's native session window); this
batch form exists because historical backfills run over static tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
    out_col: str = "session_no",
) -> DataFrame:
    """Add `out_col`: 1-based session number per key, new session when the
    inter-event gap exceeds `gap_minutes`.  `tiebreak` makes the event
    order (and therefore session boundaries between equal timestamps)
    deterministic."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_new).over(running))
