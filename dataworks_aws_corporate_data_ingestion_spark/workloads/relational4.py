"""TPC-H tail shapes q8/q17/q21/q22 adapted to the synthetic schema.

The testdata has no partsupp table and omits a few classic columns
(l_receiptdate/l_commitdate, p_container, c_phone), so the remaining
expressible shapes keep the canonical PLAN structure with adapted
predicates: q21's lateness is l_shipdate > o_orderdate + 90 days, q22's
country code is the market segment.  q2/q9/q11/q16/q20 stay blocked on
partsupp (ROUND_NOTES backlog).

Oracle discipline (see .claude/skills/verify/SKILL.md): money stays
DECIMAL(12,2) until a final double cast; threshold comparisons are
cross-multiplied exact values (integers or decimals), never engine-summed
doubles; ratio outputs are double-divided only after exact numerators and
denominators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..workload import money, one, rate, register


@register(
    "q8_market_share",
    tags=("join", "aggregation", "ratio"),
    oracle="""
        SELECT
            EXTRACT(year FROM o_orderdate) AS mkt_year,
            CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                AS mkt_share
        FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
          AND p_type = 'ECONOMY'
        GROUP BY mkt_year
        ORDER BY mkt_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of ECONOMY-part revenue sold into EUROPE
    per order year.

    Scale notes: nation/region are fixed 25/5-row dims -> broadcast hints;
    part/supplier/customer scale with SF, so their join strategies are
    left to AQE.  The share is one hash aggregate over the joined fact --
    the conditional numerator avoids a second scan.  Exact decimal sums,
    double division at the end only."""
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    supplier = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    lineitem = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, "region", sf_dir).select("r_regionkey", "r_name")

    volume = money("l_extendedprice") * (one() - rate("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    euro_nations = (
        nation.alias("n1")
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n1.n_nationkey").alias("cust_nationkey"))
    )
    return (
        lineitem.join(
            part.filter(F.col("p_type") == "ECONOMY"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                F.col("o_orderdate").between(
                    F.lit("1995-01-01").cast("timestamp_ntz"),
                    F.lit("1996-12-31").cast("timestamp_ntz"),
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(euro_nations),
            F.col("c_nationkey") == F.col("cust_nationkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("supp_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("supp_nationkey"),
        )
        .groupBy(F.year("o_orderdate").alias("mkt_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(zero)
                ).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("mkt_year")
    )


@register(
    "q17_small_quantity_revenue",
    tags=("join", "correlated-agg"),
    oracle="""
        WITH per_part AS (
            SELECT l_partkey AS pp_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(COUNT(*) AS BIGINT) AS cnt_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
               AS DOUBLE) AS avg_yearly
        FROM lineitem, part, per_part
        WHERE p_partkey = l_partkey
          AND pp_partkey = p_partkey
          AND p_brand = 'Brand#13'
          AND p_type = 'ECONOMY'
          AND CAST(l_quantity AS BIGINT) * 5 * cnt_qty < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lines whose quantity is below 20% of the
    part's average ordered quantity (for one brand/type slice).

    The 0.2*AVG threshold is the classic cross-engine trap: AVG(double)
    differs per summation order.  Quantities are integral, so the
    comparison cross-multiplies to exact integers:
    qty < 0.2 * sum/cnt  ==  qty * 5 * cnt < sum.

    Scale notes: the per-part aggregate is a partial-agg shuffle on
    l_partkey (map-side combine shrinks it to one row per part), then an
    equi-join back to the filtered fact; no per-row correlated probe
    exists in the physical plan."""
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_type")
    lineitem = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("__sum_qty"),
        F.count(F.lit(1)).alias("__cnt_qty"),
    )
    return (
        lineitem.join(
            part.filter(
                (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "ECONOMY")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(per_part.withColumnRenamed("l_partkey", "__pk"),
              F.col("p_partkey") == F.col("__pk"))
        .filter(
            F.col("l_quantity").cast("bigint") * 5 * F.col("__cnt_qty")
            < F.col("__sum_qty")
        )
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q21_waiting_supplier",
    tags=("join", "exists", "anti-exists", "topk"),
    oracle="""
        WITH order_lines AS (
            SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS is_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        order_stats AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
            FROM order_lines GROUP BY l_orderkey
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM order_lines ol
        JOIN order_stats os ON ol.l_orderkey = os.l_orderkey
        JOIN supplier ON ol.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE ol.is_late
          AND os.n_supp >= 2
          AND os.n_late_supp = 1
          AND n_name = 'NATION_3'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers in one nation who alone held up multi-supplier
    'F' orders (their line late, EXISTS another supplier on the order,
    NOT EXISTS another LATE supplier).  Lateness adapts to the synthetic
    schema as l_shipdate > o_orderdate + 90 days.

    Scale notes: the classic EXISTS / NOT EXISTS pair is re-expressed as
    ONE per-order aggregate (distinct suppliers, distinct late suppliers)
    joined back to the late lines -- two shuffles on l_orderkey and one
    on s_name, versus two correlated semi/anti probes of the fact table.
    The nation filter broadcasts; TakeOrderedAndProject caps the output."""
    supplier = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    lineitem = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    order_lines = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("is_late"),
        )
    )
    order_stats = order_lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    return (
        order_lines.filter(F.col("is_late"))
        .join(
            order_stats.withColumnRenamed("l_orderkey", "__ok"),
            F.col("l_orderkey") == F.col("__ok"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "q22_lapsed_balance_report",
    tags=("anti-join", "scalar-subquery", "aggregation"),
    oracle="""
        WITH pos AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS bal_sum,
                   CAST(COUNT(*) AS BIGINT) AS bal_cnt
            FROM customer
            WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
              AND c_acctbal > 0.0
        )
        SELECT c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer, pos
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
          AND CAST(c_acctbal AS DECIMAL(12,2)) * bal_cnt > bal_sum
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def q22_lapsed_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers (balance above the positive
    average for their cohort) with no orders since 2000-01-01, reported
    per segment (the synthetic schema's stand-in for the phone country
    code; every synthetic customer has SOME order, so "lapsed" is
    date-scoped to keep the anti join meaningful).

    The above-average threshold is cross-multiplied exact decimals
    (bal * count > sum), never a double AVG -- the skill-file trap.

    Scale notes: the scalar aggregate is one tiny row broadcast into the
    filter; the never-ordered test is a left_anti hash join on o_custkey
    (null-safe by construction); one final shuffle on the 3 segments."""
    segs = ("AUTOMOBILE", "BUILDING", "MACHINERY")
    customer = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    cohort = customer.filter(F.col("c_mktsegment").isin(*segs))
    pos = cohort.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(money("c_acctbal")).cast("decimal(38,2)").alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    return (
        cohort.join(F.broadcast(pos))
        .filter(money("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("segment")
    )


@register(
    "user_type_history_scd2",
    tags=("scd2", "window", "gaps-and-islands"),
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), isl AS (
            SELECT user_id, event_type, ts,
                   SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM ordered
        ), coll AS (
            SELECT user_id, island, MAX(event_type) AS event_type,
                   MIN(ts) AS valid_from
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
                   AS valid_to,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
                   IS NULL AS is_current
        FROM coll
    """,
)
def user_type_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity history of each user's event_type: consecutive
    identical values collapse into [valid_from, valid_to) intervals with
    an is_current flag (operators/scd.py).

    Scale notes: both gaps-and-islands windows share one (user_id, ts)
    ordering, so the plan is a single hash exchange + partition-local
    sort reused across lag, running-sum, and lead -- no joins, no
    second shuffle for the collapse (it groups on the same key)."""
    from ..operators.scd import scd2_history

    events = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    return scd2_history(
        events, key="user_id", attr="event_type", ts="ts", tiebreak="event_id"
    )


@register(
    "events_in_error_windows",
    tags=("range-join", "interval", "bucketed"),
    oracle="""
        SELECT i.event_id AS window_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events i, events p
        WHERE i.event_type = 'error'
          AND p.event_id <> i.event_id
          AND p.ts >= i.ts
          AND p.ts < i.ts + INTERVAL 1 HOUR
        GROUP BY i.event_id
    """,
)
def events_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): how many events of ANY user land
    inside the hour after each error event -- blast-radius accounting.

    The oracle is the naive inequality join; the engine answers it with
    the bucketed interval join (operators/rangejoin.py): intervals
    explode to covered 1h buckets, points map to one bucket, and the
    equi-join on bucket id replaces the cartesian product.  The plan is
    a plain hash join -- test_plan_quality's no-CartesianProduct guard
    holds for this query like every other."""
    from ..operators.rangejoin import interval_point_join

    events = load_table(spark, "events", sf_dir)
    intervals = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("interval 1 hour")).alias("end"),
    )
    points = events.select("event_id", "ts")
    pairs = interval_point_join(intervals, points, bucket_width_s=3600)
    return (
        pairs.filter(F.col("event_id") != F.col("window_id"))
        .groupBy("window_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "lineitem_metrics_unpivot",
    tags=("unpivot", "melt", "aggregation"),
    oracle="""
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                       AS qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS gross,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                       AS discount_amt
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty' AS metric, qty AS total FROM wide
        UNION ALL
        SELECT l_returnflag, 'gross' AS metric, gross AS total FROM wide
        UNION ALL
        SELECT l_returnflag, 'discount_amt' AS metric, discount_amt AS total
        FROM wide
    """,
)
def lineitem_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping via the declarative unpivot operator (the
    inverse of event_value_pivot's declared pivot): per-returnflag metric
    totals melt into (metric, total) rows.

    Scale notes: unpivot is a row-local Expand (3 output rows per input
    row, no shuffle, no Python); the only exchange is the upstream
    3-group aggregate.  The oracle spells the same reshape as UNION ALL,
    which is what Expand desugars to."""
    li = load_table(spark, "lineitem", sf_dir)
    wide = li.groupBy("l_returnflag").agg(
        F.sum(money("l_quantity")).cast("double").alias("qty"),
        F.sum(money("l_extendedprice")).cast("double").alias("gross"),
        F.sum(money("l_extendedprice") * rate("l_discount"))
        .cast("double")
        .alias("discount_amt"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "gross", "discount_amt"],
        variableColumnName="metric",
        valueColumnName="total",
    )


_PIT_ORACLE = """
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), isl AS (
            SELECT user_id, event_type, ts,
                   SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM ordered
        ), coll AS (
            SELECT user_id, island, MAX(event_type) AS event_type,
                   MIN(ts) AS valid_from
            FROM isl GROUP BY user_id, island
        ), dim AS (
            SELECT user_id, event_type AS state, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
                       AS valid_to
            FROM coll
        )
        SELECT f.event_id, f.user_id, f.ts,
               d.state, d.valid_from AS state_since
        FROM events f
        JOIN dim d
          ON d.user_id = f.user_id
         AND d.valid_from <= f.ts
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        WHERE f.event_type = 'purchase'
"""


@register(
    "purchases_point_in_time_state",
    tags=("point-in-time", "scd2", "join", "feature-store"),
    oracle=_PIT_ORACLE,
)
def purchases_point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join: attach to each purchase the user's SCD2 state
    interval containing the purchase timestamp -- the feature-store
    correctness primitive (training features must reflect what was
    known AT event time; joining the CURRENT dimension row leaks the
    future into the label).  Exactly one dim row matches per fact
    because SCD2 intervals tile each user's timeline.

    Scale notes: equi-join on user_id (one exchange per side, AQE
    broadcast if the dim fits) with the validity interval as a
    post-join filter -- never a theta-only join.  For dimensions with
    extreme per-key churn, the as-of union trick (operators/asof.py)
    computes the same 'last version at-or-before ts' in one window
    pass without the interval filter."""
    from ..operators.scd import scd2_history

    events = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    dim = scd2_history(
        events, key="user_id", attr="event_type", ts="ts", tiebreak="event_id"
    ).select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    facts = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (F.col("user_id") == F.col("d_user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return facts.join(dim, cond).select(
        "event_id",
        "user_id",
        "ts",
        "state",
        F.col("valid_from").alias("state_since"),
    )


@register(
    "snapshot_diff_orders",
    tags=("diff", "full-outer-join", "audit", "ops"),
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            WHERE o_orderdate < DATE '1996-01-01'
        ), new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 97 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice
            FROM orders
            WHERE o_orderdate < DATE '1997-01-01'
        )
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                         AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                        THEN 'unchanged'
                    ELSE 'changed' END AS status,
               o.o_orderstatus AS old_o_orderstatus,
               o.o_totalprice AS old_o_totalprice,
               n.o_orderstatus AS new_o_orderstatus,
               n.o_totalprice AS new_o_totalprice
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/merge.py::snapshot_diff) over two
    synthetic export states of `orders`: 'old' is pre-1996 orders,
    'new' extends to 1997 with every 97th status mutated -- exercising
    added, changed, AND unchanged classes (removed is covered by the
    operator's null-safe full-outer logic and pytests).  The audit
    table a data owner diffs between weekly exports.

    Scale notes: one full-outer join on the snapshot key; null-safe
    equality (<=>) drives change detection so NULL transitions
    classify as changed, not silently equal."""
    from ..operators.merge import snapshot_diff

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    old = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("date")).drop(
        "o_orderdate"
    )
    new = (
        orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .drop("o_orderdate")
    )
    return snapshot_diff(
        old, new, keys=["o_orderkey"], value_cols=["o_orderstatus", "o_totalprice"]
    )


@register(
    "purchases_point_in_time_asof",
    tags=("point-in-time", "scd2", "asof-join", "feature-store", "join-free"),
    oracle=_PIT_ORACLE,
)
def purchases_point_in_time_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JOIN-FREE form of purchases_point_in_time_state: because SCD2
    intervals tile each key's timeline, 'the interval containing ts' ==
    'the latest version starting at-or-before ts', which the as-of
    union trick (operators/asof.py) computes with ONE window over the
    union of facts and dim versions -- no join, no interval predicate,
    no per-key candidate pairs.  Registered under the IDENTICAL oracle
    as the interval-join form, so the driver certifies the two plans
    equivalent row-for-row.

    Scale notes: one shuffle on user_id for the shared window vs the
    interval form's exchange-per-side join -- the shape to prefer when
    the dimension churns hard per key (every version of a hot key
    lands in one sorted partition stream instead of joining against
    every fact)."""
    from ..operators.asof import asof_join
    from ..operators.scd import scd2_history

    events = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    dim = scd2_history(
        events,
        key="user_id",
        attr="event_type",
        ts="ts",
        tiebreak="event_id",
        version_col="version",
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "version",
    )
    facts = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # tiebreak on the SCD2 version ordinal: two versions can share a
    # valid_from (same-timestamp updates leave an empty earlier
    # interval) and the LATER version must win, matching the interval
    # form where the empty interval matches nothing
    out = asof_join(
        facts,
        dim,
        on=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["state", "valid_from"],
        tiebreak="version",
        suffix="_pit",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("state_pit").alias("state"),
        F.col("valid_from_pit").alias("state_since"),
    )
