"""Stream-stream interval join with watermark-bounded state.

The remaining Structured Streaming join surface (the engine's other
streaming ops are windows/stateful/foreachBatch): joining two live
streams needs BOTH a key equality and a time-range constraint, because
the constraint is what lets Spark expire buffered rows -- without it
each side's state grows forever waiting for arbitrarily-late partners.

The same function runs over batch DataFrames unchanged (watermarks
no-op), so the registered batch query and its DuckDB oracle certify the
join semantics the stream executes (tests prove stream == batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_attribution(
    views: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Attribute each purchase to every view by the same user within the
    preceding `horizon_minutes`: the classic clicks->conversions
    stream-stream join.  Output: one row per (view, purchase) pair in
    the window.

    In streaming mode both sides are watermarked and the join carries
    the time-range predicate, so Spark buffers each side only for
    watermark + horizon and then drops state -- bounded memory on
    unbounded streams.  `how='leftOuter'` additionally emits
    unattributed views (NULL purchase columns) once the watermark
    passes their horizon, which is only decidable AFTER the wait --
    exactly the semantics the outer stream-stream join implements.

    Scale notes: the equality key (user_id) drives one hash exchange
    per side; the range predicate is evaluated within the co-located
    state store, never as a cross product.  Batch mode plans the same
    shape: an equi-join on user_id with the range as a post-join
    filter -- NOT a pure theta join (see operators/rangejoin.py for
    the bucketed form when there is no equality key at all)."""
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").cast("decimal(12,2)").alias("purchase_value"),
    )
    if views.isStreaming or purchases.isStreaming:
        # watermarked joins require LTZ event time; each side checks ITS
        # OWN dtype (mixed LTZ/NTZ inputs would otherwise half-cast) and
        # casts through (bucketless here, so no boundary effects).  Both
        # sides get the cast so the join compares one type; watermarks
        # only attach to streaming sides (a batch side needs none).
        if dict(v.dtypes).get("view_ts") == "timestamp_ntz":
            v = v.withColumn("view_ts", F.col("view_ts").cast("timestamp"))
        if dict(p.dtypes).get("purchase_ts") == "timestamp_ntz":
            p = p.withColumn("purchase_ts", F.col("purchase_ts").cast("timestamp"))
        if views.isStreaming:
            v = v.withWatermark("view_ts", watermark)
        if purchases.isStreaming:
            p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    joined = v.join(p, cond, how)
    return joined.select(
        F.col("v_user_id").alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        F.col("purchase_value").cast("double").alias("purchase_value"),
    )
