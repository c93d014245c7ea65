"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key.

Spark has no native as-of join.  The scalable formulation here is the
union trick: tag both sides, union them into one frame, and run a single
`last(value, ignorenulls=True)` window ordered by (ts, side, tiebreak).
One shuffle on the key, no join at all -- the naive alternative (range
join + groupBy max) materialises every candidate pair, which is quadratic
per key and unusable on skewed keys at 100 TB scale.  This is the same
join-avoiding shape the reference uses for its snapshot merge
(union + window instead of a join, reference steps/ingesters.py:448-457,
docs/data-engineering-summary.md:196-218).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach `value_cols` from the latest right row with
    right_ts <= left_ts, matching on `on` keys (backward as-of, inclusive).

    `tiebreak`: a right-side column ordered ascending after the timestamp;
    among right rows sharing a timestamp the largest tiebreak wins, making
    the result deterministic (window `last` among ties is otherwise
    partition-order dependent).

    Returns all left columns plus one `<col><suffix>` per value column
    (null when no right row precedes the left row).
    """
    out_names = [f"{c}{suffix}" for c in value_cols]
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(value_cols, out_names)],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0)).alias("__tb"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_names)],
    ).select(l_tagged.columns)  # positional union safety: same order

    order: list[Column] = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    for o in out_names:
        unioned = unioned.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return unioned.filter(F.col("__side") == 1).select(*left.columns, *out_names)
