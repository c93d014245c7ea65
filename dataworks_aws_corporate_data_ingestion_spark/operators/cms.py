"""Count-Min Sketch: mergeable point-frequency estimation.

Completes the classical sketch matrix next to HLL (distinct), the
fixed-bin histogram (quantile), Misra-Gries (heavy hitters), bloom
(membership) and KMV (intersection): CMS answers "how often did THIS
key occur" for ANY key with d*w integers of state, where MG only
retains the top-k candidates.  est(key) = min over d rows of
counter[row][h_row(key)]; the estimate NEVER undercounts (every
occurrence of the key lands in all d of its cells) and overcounts only
by colliding mass (expected <= N/w per row, min over d rows whp within
2N/w) -- Cormode & Muthukrishnan, "An Improved Data Stream Summary:
The Count-Min Sketch and its Applications", J. Algorithms 2005.

Spark-first, oracle-EXACT design: the row hashes are the engine-
portable md5 parse (Spark `conv(substr(md5('i:'||key),1,15),16,10)` ==
DuckDB `('0x'||substr(md5('i:'||key),1,15))::BIGINT`, the simhash
discipline -- dedup.py:746), so the ENTIRE sketch and every point
estimate hash-match a plain-SQL oracle bit for bit: unlike the
HLL/KLL certificates, no error-envelope indirection is needed.  The
sketch build is one map-side-combined groupBy of (row, col) cells --
the shuffle carries at most d*w rows per partition no matter the
corpus; estimates are a broadcast-join of probe cells against the d*w
sketch rows.

Counter addition is an ALGEBRA (like histogram bins, bloom OR, KMV
MIN): per-day partial sketches stored as rows merge by SUM, so a
month's estimate reads <= 31*d*w stored integers and the corpus is
never rescanned -- the same mergeable-daily-state contract as the
HLL/histogram rollups, certified by `cms_daily_rollup_indexed`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "cms_sketch",
    "cms_daily_sketch",
    "merge_cms",
    "cms_point_estimates",
    "materialize_cms_daily",
    "append_to_cms_daily",
    "load_cms_daily",
]


def _row_col(key: F.Column, row: int, w: int) -> F.Column:
    """Engine-portable column index for one hash row: 60-bit md5 parse
    of 'row:key', mod w.  Non-negative, so % == pmod in both engines."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 15), 16, 10
    ).cast("bigint")
    return h % F.lit(w)


def _cells(key: F.Column, w: int, d: int) -> F.Column:
    """Array of (row, col) structs -- the d cells a key touches."""
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                _row_col(key, i, w).alias("col"),
            )
            for i in range(d)
        ]
    )


def cms_sketch(
    df: DataFrame, key_col: str, w: int, d: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch over every row of `df`: (row int, col bigint,
    c bigint), at most d*w rows total.  One explode (d cells per input
    row, all codegen exprs) into a map-side-combined count -- the only
    data shuffle is the bounded cell table.  The input is projected to
    the key column and fanned out first (single-file parquet arrives as
    ONE partition; the d-way explode + md5 work must not serialise on
    one task -- the engine-wide fan_out rule for amplifying maps).

    With `weight_col` (non-negative integer weights) the counters
    accumulate WEIGHT MASS instead of row counts -- the weighted CMS
    (Cormode & Muthukrishnan section 4: updates of arbitrary positive
    increments), mirroring heavy_hitters_exact(weight_col=): estimates
    answer "how much value did THIS key carry" and still never
    undercount."""
    from ..partitioning import fan_out

    sel = [F.col(key_col).alias("__k")] + (
        [F.col(weight_col).cast("bigint").alias("__w")] if weight_col else []
    )
    keyed = fan_out(df.select(*sel))
    measure = (
        F.sum("__w") if weight_col else F.count(F.lit(1))
    ).cast("bigint").alias("c")
    cols = ["cell.row", "cell.col"] + (["__w"] if weight_col else [])
    return (
        keyed.select(
            *(["__w"] if weight_col else []),
            F.explode(_cells(F.col("__k"), w, d)).alias("cell"),
        )
        .select(*cols)
        .groupBy("row", "col")
        .agg(measure)
    )


def cms_daily_sketch(
    df: DataFrame, ts_col: str, key_col: str, w: int, d: int
) -> DataFrame:
    """Per-day partial sketches -- the stored daily state: (day, row,
    col, c), at most d*w rows per day.  Projected + fanned out like
    cms_sketch."""
    from ..partitioning import fan_out

    keyed = fan_out(
        df.select(
            F.col(ts_col).cast("date").alias("day"),
            F.col(key_col).alias("__k"),
        )
    )
    return (
        keyed.select(
            "day", F.explode(_cells(F.col("__k"), w, d)).alias("cell")
        )
        .select("day", "cell.row", "cell.col")
        .groupBy("day", "row", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def merge_cms(daily: DataFrame) -> DataFrame:
    """Roll stored per-day partials up to one sketch: integer addition
    per cell (the mergeability), any date-window filter upstream."""
    return daily.groupBy("row", "col").agg(
        F.sum("c").cast("bigint").alias("c")
    )


def cms_point_estimates(
    sketch: DataFrame, probes: DataFrame, key_col: str, w: int, d: int
) -> DataFrame:
    """Point-frequency estimates for every probe key: explode each
    probe into its d cells, LEFT-join the (broadcast, <= d*w row)
    sketch, min over rows with empty cells counting as 0.  Returns
    (key, est bigint); est >= true frequency always."""
    pcells = probes.select(
        F.col(key_col).alias("key"),
        F.explode(_cells(F.col(key_col), w, d)).alias("cell"),
    ).select("key", "cell.row", "cell.col")
    return (
        pcells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("est"))
    )


def materialize_cms_daily(
    spark: SparkSession,
    df: DataFrame,
    ts_col: str,
    key_col: str,
    name: str,
    w: int,
    d: int,
) -> None:
    """Persist per-day partial sketches as a catalog table (day, row,
    col, c) with the sketch params pinned as table properties so
    appends cannot silently mix geometries."""
    from ..sinks.bucketing import _clear_orphan_location

    _clear_orphan_location(spark, name)
    cms_daily_sketch(df, ts_col, key_col, w, d).write.format(
        "parquet"
    ).saveAsTable(name)
    spark.sql(
        f"ALTER TABLE {name} SET TBLPROPERTIES ('cms.w'='{w}', 'cms.d'='{d}')"
    )


def _cms_params(spark: SparkSession, name: str) -> tuple[int, int]:
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    }
    return int(props["cms.w"]), int(props["cms.d"])


def append_to_cms_daily(
    spark: SparkSession,
    df: DataFrame,
    ts_col: str,
    key_col: str,
    name: str,
) -> None:
    """Fold new rows into the stored daily state: append their partial
    cells under the table's pinned (w, d).  Counter addition is
    associative/commutative, so the LOGICAL state (sum per day/cell)
    after any append sequence equals a full rebuild -- the
    append==rebuild contract `cms_daily_rollup_indexed` asserts."""
    w, d = _cms_params(spark, name)
    cms_daily_sketch(df, ts_col, key_col, w, d).write.mode(
        "append"
    ).format("parquet").saveAsTable(name)
    spark.catalog.refreshTable(name)


def load_cms_daily(spark: SparkSession, name: str) -> tuple[DataFrame, int, int]:
    """(logical daily state, w, d): partial rows folded to one row per
    (day, cell) -- the canonical form a rebuild produces."""
    w, d = _cms_params(spark, name)
    spark.catalog.refreshTable(name)
    daily = (
        spark.table(name)
        .groupBy("day", "row", "col")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    return daily, w, d
