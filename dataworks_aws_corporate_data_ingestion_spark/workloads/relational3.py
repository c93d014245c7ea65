"""Third relational batch: lateral explode, pivot, decorrelated scalar
subquery, and distribution windows (ntile)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.tables import load_table
from ..workload import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "top_terms_by_source",
    tags=("text", "explode", "lateral", "top-k"),
    oracle="""
        SELECT source, term, n FROM (
            SELECT source, term, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY n DESC, term ASC
                   ) AS rn
            FROM (
                SELECT source, term, COUNT(*) AS n
                FROM (
                    SELECT source,
                           unnest(string_split(lower(text), ' ')) AS term
                    FROM documents
                )
                GROUP BY source, term
            )
        ) WHERE rn <= 10
    """,
)
def top_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical lateral shape: explode tokens -> count -> top-10 per
    source.  (Word count, the distributed-computing hello-world, as a
    grouped top-k.)

    Scale notes: explode multiplies rows ~n_tokens-fold BEFORE the
    aggregate, but map-side partial aggregation collapses (source, term)
    pairs within each task, so the shuffle carries the distinct-term
    cardinality, not the token stream."""
    d = load_table(spark, "documents", sf_dir).select(
        "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    counts = d.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "event_value_pivot",
    tags=("pivot", "aggregation"),
    oracle="""
        SELECT user_id % 100 AS user_bucket,
            CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
            CAST(SUM(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS error,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase,
            CAST(SUM(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS signup,
            CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS view
        FROM events
        GROUP BY user_id % 100
    """,
)
def event_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type, summed value per user bucket.

    Scale notes: the pivot values are declared explicitly -- an
    undeclared pivot costs an extra distinct-scan job to discover them,
    and a runaway category column becomes a runaway column count.
    Declared pivots compile to the same single hash aggregate as the
    CASE-WHEN form the oracle spells out."""
    e = load_table(spark, "events", sf_dir).select(
        (F.col("user_id") % 100).alias("user_bucket"),
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    return (
        e.groupBy("user_bucket")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum("v").cast("double"))
    )


@register(
    "customers_above_nation_avg",
    tags=("correlated-subquery", "window", "aggregation"),
    oracle="""
        SELECT c_custkey, c_acctbal, n_name
        FROM customer c
        JOIN nation ON c.c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DECIMAL(12,2))
              * (SELECT COUNT(*) FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
                 FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each customer above their nation's
    average balance), decorrelated into window aggregates -- one shuffle
    on nationkey instead of a per-row subquery or a groupBy+rejoin.

    The 'above average' test is cross-multiplied into exact decimal space
    (bal * n > sum): a double AVG is summation-order dependent, and a
    threshold comparison is exactly where a last-ulp difference becomes a
    row-count difference between engines."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    w = Window.partitionBy("c_nationkey")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    return (
        c.withColumn("__sum", F.sum(bal).over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(w))
        .filter(bal * F.col("__cnt") > F.col("__sum"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_acctbal", "n_name")
    )


@register(
    "event_surplus_except_all",
    tags=("set-ops", "except-all", "multiset"),
    oracle="""
        SELECT event_type, COUNT(*) AS surplus
        FROM (
            SELECT event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
            EXCEPT ALL
            SELECT event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-06' AND ts < TIMESTAMP '2024-01-07'
        )
        GROUP BY event_type
    """,
)
def event_surplus_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): per event type, how many MORE
    firings day A had than day B -- duplicate-preserving set semantics,
    distinct from the EXCEPT DISTINCT of lapsed_buyers_except.

    Scale notes: Spark plans exceptAll as a counted anti-pattern (tag
    sides +1/-1, sum per row value, generate surplus rows) -- one
    shuffle on the row value; for low-cardinality rows like these the
    map-side combine reduces it to group counts."""
    e = load_table(spark, "events", sf_dir)
    day = lambda d0, d1: e.filter(  # noqa: E731
        (F.col("ts") >= F.lit(d0).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(d1).cast("timestamp_ntz"))
    ).select("event_type")
    a = day("2024-01-05", "2024-01-06")
    b = day("2024-01-06", "2024-01-07")
    return a.exceptAll(b).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("surplus")
    )


_DECILE_PCTS = [i / 10 for i in range(1, 10)]


@register(
    "customer_balance_deciles",
    tags=("percentile", "range-bucketing", "aggregation"),
    oracle=f"""
        WITH bounds AS (
            SELECT quantile_cont(CAST(c_acctbal AS DOUBLE),
                                 [{", ".join(str(p) for p in _DECILE_PCTS)}]) AS bs
            FROM customer
        )
        SELECT decile,
               COUNT(*) AS n_customers,
               MIN(CAST(c_acctbal AS DOUBLE)) AS min_bal,
               MAX(CAST(c_acctbal AS DOUBLE)) AS max_bal
        FROM (
            SELECT c_acctbal,
                   CAST(1 + len(list_filter(bs, b -> b <= CAST(c_acctbal AS DOUBLE)))
                        AS INT) AS decile
            FROM customer, bounds
        )
        GROUP BY decile
    """,
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-bucketed balance deciles: exact decile boundaries from one
    percentile aggregate, then a broadcast of 9 doubles buckets every row
    map-side.  decile(v) = 1 + #{boundaries <= v} -- ties share a bucket
    (value-range semantics, not rank semantics).

    Scale notes: this is the scale path that replaces the global-ntile
    window (a single-task sort of the whole table, kept as a test twin in
    customer_balance_deciles_ntile).  Here nothing global ever sorts:
    the boundary aggregate is the only wide step and at 100 TB it swaps
    for approx_percentile's mergeable sketch (identical plan shape, the
    boundaries just carry the sketch's bounded error); bucketing is a
    per-row expression against 9 broadcast doubles and the final
    per-decile aggregate is an ordinary map-side-combined groupBy.

    Exactness: Spark percentile(col, array) == DuckDB quantile_cont
    bit-for-bit (both p*(n-1) linear interpolation over doubles), so the
    bucket comparison b <= v sees identical doubles in both engines."""
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey"), F.col("c_acctbal").cast("double").alias("bal")
    )
    bounds = c.agg(
        F.percentile("bal", F.array(*[F.lit(p) for p in _DECILE_PCTS])).alias("bs")
    )
    return (
        c.join(F.broadcast(bounds))
        .withColumn(
            "decile",
            (
                F.lit(1)
                + F.aggregate(
                    "bs",
                    F.lit(0),
                    lambda acc, b: acc + F.when(b <= F.col("bal"), 1).otherwise(0),
                )
            ).cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("bal").alias("min_bal"),
            F.max("bal").alias("max_bal"),
        )
    )


def customer_balance_deciles_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-ntile twin of customer_balance_deciles -- rank semantics via
    an un-partitioned window (single-task sort; deliberately NOT the
    registered query: a one-executor sort of every customer is the
    anti-pattern at scale).  Kept for small-SF comparison tests."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return (
        c.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )
