"""Relational query surface beyond the reference's operators: semi/anti
joins, outer joins, rollup, set operations, lag windows, global top-k.

The reference deliberately had no joins or aggregates (SURVEY.md sections
2.3-2.4); these exercise the engine's full Catalyst-planned surface on the
synthetic tables, each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..workload import money, one, rate, register


@register(
    "q3_top_unshipped_orders",
    bench=True,
    tags=("join", "aggregation", "topk"),
    oracle="""
        SELECT
            l_orderkey,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                AS revenue,
            o_orderdate,
            o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dimension filter -> join -> agg -> global
    top-k.  l_orderkey tiebreaks the sort so LIMIT is deterministic.

    Scale notes: Spark plans LIMIT over ORDER BY as TakeOrderedAndProject
    -- per-partition top-10 heaps then a driver-side merge of 10xP rows;
    no global sort materialises."""
    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lineitem = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    revenue = money("l_extendedprice") * (one() - rate("l_discount"))
    return (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(
            # customer scales with SF: no broadcast hint, AQE picks the
            # strategy from runtime size of the segment-filtered side
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q4_order_priority_semijoin",
    tags=("semijoin", "aggregation"),
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS as a left-semi join.

    Scale notes: left-semi short-circuits on first match and ships only the
    semi side's join keys through the shuffle."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lineitem = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    filtered = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    return (
        filtered.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "customers_without_orders",
    tags=("antijoin",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01'
        )
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (customers with no 2001+ orders)."""
    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    return customer.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )


@register(
    "q13_customer_order_distribution",
    bench=True,
    tags=("outer-join", "aggregation"),
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: outer join with a residual predicate, then a
    two-level aggregate (count per customer, histogram of counts).

    Scale notes: the first agg reuses the join's hash partitioning on
    c_custkey (no extra shuffle); the histogram shuffle carries only
    (c_count, partial count) pairs."""
    customer = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderkey", "o_orderpriority")
    per_customer = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "revenue_rollup_nation_year",
    tags=("rollup", "grouping-sets", "join"),
    oracle="""
        SELECT
            n_name,
            CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders, customer, nation
        WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT))
    """,
)
def revenue_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: per (nation, year), per nation, and grand total in
    one pass (Spark expands grouping sets inside a single hash aggregate)."""
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate", "o_totalprice")
    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    joined = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        joined.withColumn("order_year", F.year("o_orderdate").cast("bigint"))
        .rollup("n_name", "order_year")
        .agg(F.sum(money("o_totalprice")).cast("double").alias("total_price"))
    )


@register(
    "repeat_buyer_segments_intersect",
    tags=("set-op",),
    oracle="""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def repeat_buyer_segments_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers active in both years."""
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")

    def active(y0: str, y1: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(y0).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(y1).cast("timestamp_ntz"))
        ).select("o_custkey")

    return active("1996-01-01", "1997-01-01").intersect(
        active("1997-01-01", "1998-01-01")
    )


@register(
    "lapsed_buyers_except",
    tags=("set-op",),
    oracle="""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def lapsed_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): active in 1996 but not 1997."""
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")

    def active(y0: str, y1: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(y0).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(y1).cast("timestamp_ntz"))
        ).select("o_custkey")

    # subtract == EXCEPT DISTINCT; exceptAll-then-distinct would be wrong
    # (a key on both sides with higher left multiplicity would survive)
    return active("1996-01-01", "1997-01-01").subtract(
        active("1997-01-01", "1998-01-01")
    )


@register(
    "event_interarrival_lag",
    tags=("window", "lag"),
    oracle="""
        SELECT event_id, user_id, ts,
               DATE_DIFF('microsecond', prev_ts, ts) AS gap_micros
        FROM (
            SELECT event_id, user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
            FROM events
        )
        WHERE prev_ts IS NOT NULL
    """,
)
def event_interarrival_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: per-user inter-arrival gaps.

    Microsecond granularity is exact in both engines (SECOND would differ:
    Spark truncates the interval, DuckDB counts boundary crossings).

    Scale notes: same single shuffle as any per-user window; the subsequent
    filter/projection pipeline into the window stage."""
    e = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias("gap_micros"),
        )
    )


@register(
    "event_type_daily_counts",
    tags=("aggregation", "date-functions"),
    oracle="""
        SELECT CAST(ts AS DATE) AS event_date, event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY CAST(ts AS DATE), event_type
    """,
)
def event_type_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type rollup with a distinct aggregate.

    Scale notes: COUNT(DISTINCT) expands to a two-phase aggregate; the
    first phase dedups (date,type,user) map-side so the wide shuffle
    carries unique triples only."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(
            F.col("ts").cast("date").alias("event_date"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )
