"""Data-audit statistics over the events stream: first-digit profile
and per-user lifetime-value quantiles.

Two numeric-integrity checks an ingestion audit runs: the leading-digit
distribution of amounts (a fabricated or truncated feed skews it -- the
Benford's-law screen, reported as observed shares so the audit applies
whatever expected curve it wants downstream without transcendentals in
the oracle-matched output), and the shape of per-user total value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..workload import register


@register(
    "value_first_digit_profile",
    tags=("audit", "benford", "statistics", "events"),
    oracle="""
        WITH cents AS (
            SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c
            FROM events WHERE value > 0
        ),
        digits AS (
            SELECT substr(CAST(c AS VARCHAR), 1, 1) AS digit FROM cents
        ),
        counts AS (
            SELECT digit, count(*) AS n FROM digits GROUP BY digit
        )
        SELECT digit, CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE) / (SELECT SUM(n) FROM counts) AS share
        FROM counts
        ORDER BY digit
    """,
)
def value_first_digit_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leading-digit distribution of positive event values (in integer
    cents: FLOOR-then-CAST, the portable quantisation).  One map-side-
    combined aggregate + a broadcast scalar total; the share division
    happens once per digit, not per row."""
    events = load_table(spark, "events", sf_dir)
    cents = events.filter(F.col("value") > 0).select(
        F.floor(F.col("value") * 100).cast("bigint").alias("c")
    )
    counts = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n").cast("double") / F.col("t")).alias("share"),
        )
        .orderBy("digit")
    )


@register(
    "user_ltv_quantiles",
    tags=("audit", "percentile", "statistics", "events"),
    oracle="""
        WITH ltv AS (
            SELECT user_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       AS total
            FROM events GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               quantile_cont(total, 0.25) AS p25,
               quantile_cont(total, 0.50) AS p50,
               quantile_cont(total, 0.75) AS p75,
               quantile_cont(total, 0.90) AS p90
        FROM ltv
    """,
)
def user_ltv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + p90 of per-user lifetime value.  Exact-decimal user
    totals cast to double ONCE, then Spark's interpolated percentile()
    == DuckDB quantile_cont bit-for-bit (the repo's established
    percentile parity)."""
    events = load_table(spark, "events", sf_dir)
    ltv = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total")
    )
    return ltv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.percentile(F.col("total"), F.lit(0.25)).alias("p25"),
        F.percentile(F.col("total"), F.lit(0.50)).alias("p50"),
        F.percentile(F.col("total"), F.lit(0.75)).alias("p75"),
        F.percentile(F.col("total"), F.lit(0.90)).alias("p90"),
    )
