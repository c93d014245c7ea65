"""Second relational batch: supplier/part-table coverage, conditional
aggregation, disjunctive predicate pushdown, ratio aggregates, and
semi-structured JSON extraction (events.props).

All beyond-parity shapes (the reference has no joins or aggregates,
SURVEY.md sections 2.3-2.4); decimal-then-double convention per
workload.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..workload import money, one, rate, register


@register(
    "q7_supplier_nation_volume",
    tags=("join", "aggregation"),
    oracle="""
        SELECT n_name AS supp_nation,
               CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS volume,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, YEAR(l_shipdate)
    """,
)
def q7_supplier_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-flavoured shipping volume by supplier nation and year.

    Scale notes: supplier scales with SF but stays orders of magnitude
    smaller than lineitem -- AQE broadcasts it when runtime stats fit,
    else shuffles on the join key; nation (25 rows) is broadcast-hinted.
    The aggregate shuffles only (nation, year) groups after map-side
    partials."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    vol = money("l_extendedprice") * (one() - rate("l_discount"))
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.sum(vol).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q10_returned_items",
    tags=("join", "aggregation", "top-k"),
    oracle="""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most, with their nation.

    Scale notes: both filters (returnflag on lineitem, date on orders)
    push into the scans before the fact-fact join; the final top-20 plans
    as TakeOrderedAndProject, not a global sort."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = money("l_extendedprice") * (one() - rate("l_discount"))
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
        )
        .join(
            l.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q12_priority_linestatus",
    tags=("join", "aggregation", "conditional-agg"),
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate
        GROUP BY l_linestatus
    """,
)
def q12_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: pivot-style conditional counts inside one
    aggregate pass (no separate filtered scans), plus a cross-table
    residual predicate (l_shipdate >= o_orderdate) that must evaluate
    post-join."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    tags=("join", "aggregation", "ratio"),
    oracle="""
        SELECT CAST(100.0 AS DOUBLE)
               * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share -- a global ratio of two conditional
    sums in a single aggregate (one pass, one row out).

    Scale notes: the month filter prunes lineitem at the scan; part is
    the smaller side and joins under AQE's runtime choice.  Numerator and
    denominator stay in exact decimal until the final double division."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = money("l_extendedprice") * (one() - rate("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0).cast("double")
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q19_disjunctive_revenue",
    tags=("join", "aggregation", "predicate-pushdown"),
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_matched
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.

    Scale notes: Catalyst extracts the common single-side conjuncts from
    the disjunction (p_brand IN (...), p_size <= 50, l_quantity <= 40
    bounds) and pushes them below the join into both scans -- check
    PushedFilters in the explain; the residual cross-side disjunction
    evaluates post-join."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30) & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(20, 50) & (q >= 20) & (q <= 40))
    )
    rev = money("l_extendedprice") * (one() - rate("l_discount"))
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


@register(
    "q6_discount_revenue",
    bench=True,
    tags=("aggregation", "scan-filter"),
    oracle="""
        SELECT
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
            COUNT(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
)
def q6_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, the canonical pushdown
    showcase -- all four predicates land in the parquet scan
    (PushedFilters), three columns read, one row out, zero joins.  The
    whole query is one WholeStageCodegen span feeding a single-group
    partial/final aggregate."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q15_top_supplier_per_year",
    tags=("aggregation", "window", "argmax"),
    oracle="""
        SELECT ship_year, s_suppkey, s_name, total_revenue
        FROM (
            SELECT ship_year, s_suppkey, s_name, total_revenue,
                   ROW_NUMBER() OVER (
                       PARTITION BY ship_year
                       ORDER BY total_revenue DESC, s_suppkey ASC
                   ) AS rn
            FROM (
                SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
                       s_suppkey, s_name,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                            AS DOUBLE) AS total_revenue
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                GROUP BY YEAR(l_shipdate), s_suppkey, s_name
            )
        ) WHERE rn = 1
    """,
)
def q15_top_supplier_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate, then argmax over the aggregate (top
    supplier by revenue per ship year), via rank-over-aggregate with a
    deterministic tiebreak.

    Scale notes: the aggregate collapses lineitem to (year x supplier)
    cardinality BEFORE the window, so the rank's sort shuffles group
    rows only.  The reference formulation (a view + WHERE rev = (SELECT
    MAX..)) would scan the aggregate twice; the window form is one
    pass."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    rev = money("l_extendedprice") * (one() - rate("l_discount"))
    agg = (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
            F.col("s_suppkey"),
            F.col("s_name"),
        )
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ship_year").orderBy(
        F.col("total_revenue").desc(), F.col("s_suppkey").asc()
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "events_props_json_stats",
    tags=("json", "semi-structured", "aggregation"),
    oracle="""
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY event_type, k_bucket
    """,
)
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a typed field from the
    JSON props string and aggregate on it (the engine's F16 parity
    surface -- late schema imposition on a schemaless payload column,
    reference steps/ingesters.py:330-335).

    Scale notes: get_json_object evaluates JVM-side inside codegen -- no
    Python, no full from_json materialisation for a single field."""
    e = load_table(spark, "events", sf_dir).select("event_type", "props")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy(
            "event_type", (k % 10).alias("k_bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_sum"),
        )
    )


@register(
    "events_props_variant_stats",
    tags=("json", "variant", "semi-structured"),
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 7 AS k_mod,
               COUNT(*) AS n,
               CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS k_min,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS k_max
        FROM events
        GROUP BY 1
    """,
)
def events_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT path for semi-structured data (Spark 4): parse_json
    once into the binary variant encoding, then typed variant_get
    extraction -- the open-table-format answer to repeated
    get_json_object parsing (each get_json_object re-parses the string;
    a variant column parses once and every extraction is an O(path)
    binary probe).  Same aggregate as the string-JSON twin above, so the
    two surfaces are mutually checkable and the DuckDB oracle covers
    both.

    Scale notes: for a props column probed by k extractions, variant
    turns k string parses per row into 1 parse + k binary probes; at
    100 TB the parse is the dominant scan-stage cost, which is why
    engines are converging on variant encodings for JSON columns."""
    e = load_table(spark, "events", sf_dir).select(
        F.parse_json("props").alias("pv")
    )
    k = F.variant_get("pv", "$.k", "bigint")
    return (
        e.groupBy((k % 7).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(k).cast("bigint").alias("k_min"),
            F.max(k).cast("bigint").alias("k_max"),
        )
    )
