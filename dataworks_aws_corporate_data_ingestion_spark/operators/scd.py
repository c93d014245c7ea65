"""Slowly-changing-dimension (type 2) history from a change stream.

The reference's snapshot merge keeps only the LATEST record per key;
warehouse consumers often need the full validity history instead --
"what was this entity's attribute between t1 and t2".  scd2_history
collapses a change stream into interval rows: consecutive identical
attribute values merge into one row, each carrying
[valid_from, valid_to) and an is_current flag.

Gaps-and-islands via two windows, both over the SAME (key, ts) ordering
so Spark plans ONE hash exchange + one partition-local sort reused by
both: lag() marks change points, a running sum of change flags numbers
the islands, and a group-by collapses each island to its interval.
lead() over the collapsed rows then supplies valid_to.  No joins, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    version_col: str | None = None,
) -> DataFrame:
    """Interval rows (key, attr, valid_from, valid_to, is_current) from
    per-event updates.  `tiebreak` makes the ordering total so island
    numbering is deterministic under equal timestamps.

    `version_col`: optionally expose the per-key island ordinal (1-based
    version number).  Consumers ordering versions MUST use it rather
    than valid_from: two versions can share a valid_from when updates
    land on the same timestamp (the earlier interval is then empty),
    and only the ordinal breaks that tie deterministically."""
    order = [F.col(ts).asc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    changed = F.when(
        F.lag(attr).over(w).isNull()
        | (F.lag(attr).over(w) != F.col(attr)),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = df.select(
        F.col(key),
        F.col(attr),
        F.col(ts),
        F.col(tiebreak),
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__island"),
    )
    collapsed = islands.groupBy(key, "__island").agg(
        F.first(attr).alias(attr),
        F.min(ts).alias("valid_from"),
    )
    w2 = Window.partitionBy(key).orderBy(F.col("__island").asc())
    out = collapsed.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("__island").alias("__v"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    if version_col is not None:
        return out.withColumnRenamed("__v", version_col)
    return out.drop("__v")
