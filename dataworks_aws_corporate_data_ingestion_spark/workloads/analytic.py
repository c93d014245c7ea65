"""Analytic-shape coverage: rollup/grouping sets, exact percentiles,
having-on-aggregate joins, as-of join, sessionization.

These are beyond-parity OLAP shapes (the reference has no aggregates at
all, SURVEY.md section 2.4); each is expressed so Catalyst picks the
physical plan and each carries an independent DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.sessions import sessionize
from ..operators.skew import distinct_count_twophase, salted_join
from ..sources.tables import load_table
from ..workload import money, one, rate, register


@register(
    "revenue_rollup_cube",
    tags=("aggregation", "rollup", "grouping-sets"),
    oracle="""
        SELECT
            COALESCE(n_name, 'ALL') AS nation,
            COALESCE(CAST(order_year AS VARCHAR), 'ALL') AS order_year,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
            COUNT(*) AS n_orders
        FROM (
            SELECT n_name, YEAR(o_orderdate) AS order_year, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        )
        GROUP BY ROLLUP (n_name, order_year)
    """,
)
def revenue_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (nation, year): per-year, per-nation subtotal, and grand
    total in one pass.

    Scale notes: Spark plans rollup as Expand (one duplicated row per
    grouping set) feeding a single hash aggregate -- partial aggregation
    still applies map-side, so the shuffle carries group rows, not input
    rows.  The string-COALESCE labels avoid NULL-vs-'ALL' ambiguity in the
    comparison (n_name itself is never null)."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name"),
            F.year("o_orderdate").cast("string").alias("order_year_s"),
            F.col("o_totalprice"),
        )
    )
    return (
        joined.rollup("n_name", "order_year_s")
        .agg(
            F.sum(money("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("order_year_s"), F.lit("ALL")).alias("order_year"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "user_value_moving_avg",
    tags=("window", "frame", "moving-average"),
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ) AS DOUBLE)
               / COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ) AS moving_avg_5,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE) AS running_total
        FROM events
    """,
)
def user_value_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame windows: 5-event moving average and running total per
    user -- the explicit ROWS-frame surface (the engine's other windows
    use the default frame).

    Scale notes: both windows share one (partition, order) spec, so
    Catalyst evaluates them in a single Window operator after one
    shuffle+sort; mixing specs would stack exchanges.  Decimal inside the
    frame keeps the short sums exact in both engines; the mean is spelled
    sum/count explicitly because engines disagree on AVG-over-DECIMAL
    result scale and rounding."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", F.col("value").cast("decimal(12,2)").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    moving = w.rowsBetween(-4, Window.currentRow)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum("v").over(moving).cast("double")
            / F.count(F.lit(1)).over(moving)
        ).alias("moving_avg_5"),
        F.sum("v").over(running).cast("double").alias("running_total"),
    )


@register(
    "user_value_hourly_range",
    tags=("window", "range-frame", "event-time"),
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_events_last_hour,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                   AS value_last_hour
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
        )
    """,
)
def user_value_hourly_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the count and value-sum of
    events in the trailing ONE HOUR -- the frame is bounded by the ORDER
    key's VALUE, not a row count, so sparse and bursty users get the
    correct window regardless of event density (the ROWS-frame twin,
    user_value_moving_avg, cannot express this).

    The ordering key is epoch MICROseconds as a bigint: events carry
    sub-second timestamps, so an epoch-seconds key would truncate and
    both engines must bound the frame over the identical integer (3.6e9
    us == 1 hour).  Peers (equal timestamps) are in-frame in both
    engines by RANGE semantics.

    Scale notes: one shuffle on user_id, per-partition sort by time,
    then a sliding two-pointer pass inside Spark's Window operator --
    the frame never re-scans, it advances.  Decimal inside the frame
    sum keeps cross-engine bit-equality (module convention)."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast("decimal(12,2)").alias("v"),
        # ts is TIMESTAMP_NTZ: unix_micros() rejects it and a cast to
        # TIMESTAMP would drag the session timezone in; pure NTZ
        # arithmetic stays engine- and timezone-independent
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_events_last_hour"),
        F.sum("v").over(w).cast("double").alias("value_last_hour"),
    )


@register(
    "rapid_repeat_event_pairs",
    tags=("join", "range-join", "self-join"),
    oracle="""
        SELECT a.event_id AS first_id, b.event_id AS second_id, a.user_id,
               CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = b.event_type
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 60 SECOND
    """,
)
def rapid_repeat_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) self-join: same user + type re-fires within 60
    seconds -- the bounded-interval join shape (dedup of double-fires,
    bot detection).

    Scale notes: the equi keys (user, type) carry the shuffle; the time
    band is a post-join residual, so per-key cost is quadratic only in
    that user's events.  For time-band joins with NO equi key, bucket
    both sides by floor(ts / band) and join adjacent buckets instead.
    gap_s counts whole-second boundary crossings (timestamp truncation to
    seconds, then difference) to match date_diff semantics exactly."""
    e = load_table(spark, "events", sf_dir)
    a = e.select(
        F.col("event_id").alias("first_id"),
        F.col("user_id"),
        F.col("event_type").alias("t_a"),
        F.col("ts").alias("ts_a"),
    )
    b = e.select(
        F.col("event_id").alias("second_id"),
        F.col("user_id").alias("uid_b"),
        F.col("event_type").alias("t_b"),
        F.col("ts").alias("ts_b"),
    )
    # truncate-then-diff on TIMESTAMP_NTZ: session-timezone independent
    # (unix_timestamp on NTZ would bind to the session zone) and matches
    # DuckDB date_diff's boundary-crossing count exactly
    gap_s = F.expr(
        "timestampdiff(SECOND, date_trunc('second', ts_a),"
        " date_trunc('second', ts_b))"
    ).cast("bigint")
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("uid_b"))
            & (F.col("t_a") == F.col("t_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 60 SECONDS")),
        )
        .select("first_id", "second_id", "user_id", gap_s.alias("gap_s"))
    )


@register(
    "orders_grouping_sets",
    tags=("aggregation", "grouping-sets", "sql-api"),
    oracle="""
        SELECT
            COALESCE(o_orderstatus, 'ALL') AS status,
            COALESCE(o_orderpriority, 'ALL') AS priority,
            COUNT(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS -- by status, by priority, and the grand
    total, in one pass -- expressed through the engine's SQL entry point
    (spark.sql over a registered view) rather than the DataFrame API:
    both front-ends land in the same Catalyst Expand + hash aggregate.

    Scale notes: Expand duplicates each input row once per grouping set
    (3x here) BEFORE the partial aggregate; with low-cardinality sets the
    map-side combine absorbs the multiplication, so the shuffle still
    carries only group rows."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT
            COALESCE(o_orderstatus, 'ALL') AS status,
            COALESCE(o_orderpriority, 'ALL') AS priority,
            COUNT(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "price_percentiles_by_flag",
    tags=("aggregation", "percentile"),
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.9) AS p90,
               quantile_cont(l_extendedprice, 0.99) AS p99,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
)
def price_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (verified bit-identical to
    DuckDB's quantile_cont: both use index = p*(n-1) linear interpolation).

    Scale notes: exact percentile sorts each group; at 100 TB prefer
    approx_percentile (t-digest sketch, mergeable map-side, no full sort)
    -- registered separately as a rows-only entry since sketches are not
    oracle-matchable."""
    l = load_table(spark, "lineitem", sf_dir).select("l_returnflag", "l_extendedprice")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "approx_percentiles_by_flag",
    tags=("aggregation", "percentile", "sketch", "invariant-oracle"),
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS p50_rank_ok,
               TRUE AS p90_rank_ok,
               TRUE AS p99_rank_ok,
               TRUE AS distinct_ok
        FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path -- approx_percentile's mergeable sketch
    (map-side partial aggregation, no per-group sort) -- registered as its
    ERROR-BOUND CERTIFICATE, since sketch outputs are engine-specific by
    construction.  Per flag the claim is integer-exact: the row count is
    right, each approximate percentile's RANK lies within +/-1% of its
    target (the sketch guarantees 1/accuracy = 0.01%; the margin covers
    duplicate-value rank plateaus), and the HLL distinct estimate is
    within 20% of exact (4x the default 5% rsd).  Any sketch regression
    flips a boolean and hash-mismatches.  Raw sketch values come from the
    operator API (F.approx_percentile / approx_count_distinct).

    Scale notes: two aggregates over the fact table (sketches, then rank
    counts against the broadcast 3-row sketch results); both map-side
    partial, no sort anywhere."""
    l = load_table(spark, "lineitem", sf_dir).select("l_returnflag", "l_extendedprice")
    sk = l.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice",
            F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
            F.lit(10000),
        ).alias("aps"),
        F.approx_count_distinct("l_extendedprice").alias("approx_d"),
        F.count_distinct("l_extendedprice").alias("exact_d"),
    )
    price = F.col("l_extendedprice")
    joined = l.join(F.broadcast(sk), "l_returnflag")
    counts = joined.groupBy("l_returnflag", "approx_d", "exact_d").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            agg_
            for i in (1, 2, 3)
            for agg_ in (
                F.sum(
                    F.when(price <= F.element_at("aps", i), 1).otherwise(0)
                ).alias(f"le{i}"),
                F.sum(
                    F.when(price < F.element_at("aps", i), 1).otherwise(0)
                ).alias(f"lt{i}"),
            )
        ],
    )
    def rank_ok(i: int, pct: int):
        # integer cross-multiplied: rank window [pct-1, pct+1]% of n
        return (F.col(f"le{i}") * 100 >= (pct - 1) * F.col("n")) & (
            F.col(f"lt{i}") * 100 <= (pct + 1) * F.col("n")
        )

    return counts.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        rank_ok(1, 50).alias("p50_rank_ok"),
        rank_ok(2, 90).alias("p90_rank_ok"),
        rank_ok(3, 99).alias("p99_rank_ok"),
        (
            F.abs(F.col("approx_d") - F.col("exact_d")) * 5 <= F.col("exact_d")
        ).alias("distinct_ok"),
    )


@register(
    "daily_new_users",
    tags=("window", "distinct", "incremental-distinct", "aggregation"),
    oracle="""
        WITH first_seen AS (
            SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS day
            FROM events GROUP BY event_type, user_id
        ), daily AS (
            SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_new_users
            FROM first_seen GROUP BY event_type, day
        )
        SELECT event_type, day, n_new_users,
               CAST(SUM(n_new_users) OVER (
                   PARTITION BY event_type ORDER BY day
               ) AS BIGINT) AS cum_distinct_users
        FROM daily
    """,
)
def daily_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day -- the SCALE
    REWRITE of COUNT(DISTINCT) OVER (which Spark refuses and which
    would hold every group's full membership in window state anyway):
    distinct-to-date == running sum of FIRST-SEEN counts.  One
    (type, user) aggregate collapses the corpus to its user set, a
    second to (type, day) new-user counts, and the cumulative window
    runs over ~types x days rows only.

    Scale notes: both aggregates are map-side partial; the window input
    is days-sized, not events-sized.  Days with zero new users have no
    row (join timeseries_ops.events_gap_filled_daily's spine for a
    dense calendar).  CAST(ts AS DATE) is timezone-free on NTZ in both
    engines."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    first_seen = e.groupBy("event_type", "user_id").agg(F.min("day").alias("day"))
    daily = first_seen.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_users")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    )


@register(
    "daily_user_sketch_rollup",
    tags=("aggregation", "sketch", "hll", "rollup", "invariant-oracle"),
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS merged_estimate_ok
        FROM events GROUP BY event_type
    """,
)
def daily_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting: per-day HLL sketches of user_id
    (Datasketches hll_sketch_agg), merged per event type with
    hll_union_agg -- the pattern that answers 'distinct users this
    month/quarter/ever' from 30/90/N TINY stored sketches instead of
    re-scanning raw events.  approx_count_distinct alone cannot do this:
    its result is a number, not a mergeable state.

    Registered as its ERROR-BOUND CERTIFICATE (sketch bytes are
    engine-specific): per type, the day count and exact user count are
    integer-exact, and the union-of-daily-sketches estimate lands within
    10% of exact (default lgConfigK=12 gives ~1.6% rsd; the margin is
    6x).  A broken merge -- dropped day, double-counted sketch, bad
    union -- lands far outside it.

    Scale notes: sketch aggregation is map-side partial (each task
    sketches its rows, the shuffle carries kilobyte sketch states); the
    daily sketch table is days x types rows, and every wider rollup is
    an aggregate over THAT, never over events."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    daily_sk = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily_sk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    return rolled.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users")) * 10 <= F.col("exact_users")
        ).alias("merged_estimate_ok"),
    )


@register(
    "event_funnel_counts",
    tags=("funnel", "sequence", "aggregation", "conversion"),
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
                   MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
                   MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
                   MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN t_view >= t_signup THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_viewed,
               CAST(SUM(CASE WHEN t_click >= t_view AND t_view >= t_signup
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
               CAST(SUM(CASE WHEN t_purchase >= t_click AND t_click >= t_view
                              AND t_view >= t_signup
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
        FROM firsts
    """,
)
def event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence funnel signup -> view -> click -> purchase: how
    many users completed each ORDERED prefix (each step's first
    occurrence at-or-after the previous step's).  Sequence detection
    without MATCH_RECOGNIZE (which Spark lacks): for first-occurrence
    funnels, per-user min timestamps per step carry the whole ordering,
    so the corpus collapses to one row per user before any comparison
    happens.

    Scale notes: one (user) hash aggregate with conditional MINs
    (map-side partial), then a scalar aggregate over user-sized data;
    no window, no self-join, no per-step passes.  NULL timestamps
    (step never done) fail every >= comparison in both engines, so
    missing steps drop out without explicit null guards."""
    e = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    m = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    firsts = e.groupBy("user_id").agg(
        m("signup").alias("t_signup"),
        m("view").alias("t_view"),
        m("click").alias("t_click"),
        m("purchase").alias("t_purchase"),
    )
    step2 = F.col("t_view") >= F.col("t_signup")
    step3 = (F.col("t_click") >= F.col("t_view")) & step2
    step4 = (F.col("t_purchase") >= F.col("t_click")) & step3
    return firsts.agg(
        F.count("t_signup").cast("bigint").alias("n_signup"),
        F.sum(F.when(step2, 1).otherwise(0)).cast("bigint").alias("n_viewed"),
        F.sum(F.when(step3, 1).otherwise(0)).cast("bigint").alias("n_clicked"),
        F.sum(F.when(step4, 1).otherwise(0)).cast("bigint").alias("n_purchased"),
    )


@register(
    "user_retention_cohorts",
    tags=("cohort", "retention", "aggregation", "date-functions"),
    oracle="""
        WITH activity AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), cohorts AS (
            SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
        )
        SELECT c.cohort_day,
               CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active_users
        FROM activity a JOIN cohorts c USING (user_id)
        GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-active day, and
    for each (cohort_day, day_offset) how many were active again --
    the table behind every retention curve / triangle chart.

    Scale notes: the corpus collapses to distinct (user, day) activity
    first (map-side partial distinct), cohort assignment is a
    user-sized aggregate joined back user-to-user (AQE picks the
    strategy), and the final group-by runs over activity-sized data.
    No window, no per-cohort passes; day arithmetic is date-integer
    subtraction, timezone-free on NTZ in both engines."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    )
    activity = e.distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_users"))
    )


@register(
    "group_content_signature",
    tags=("aggregation", "udaf", "pandas-grouped-agg", "drift-detection"),
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                        AS BIGINT)) % 2147483647 AS BIGINT) AS content_sig
        FROM events GROUP BY event_type
    """,
)
def group_content_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-group content checksum (sum of per-row md5
    prefixes mod a prime) -- the signature an ingestion gate compares
    across batches to detect silent membership drift without storing
    members.  Registered as the GROUPED-AGGREGATE pandas UDF surface
    (the one pandas-UDF variant the other workloads don't exercise:
    scalar / iterator / applyInPandas / mapInPandas / withState / UDTF
    are all covered elsewhere): the UDAF receives each group's column
    as one pandas Series and returns one scalar, with map-side partial
    aggregation NOT available -- which is exactly why the docstring's
    production form is the equivalent JVM column expression the oracle
    spells (md5/conv/sum fold inside a regular hash aggregate, partial
    aggregation intact).  The Python form exists for signatures that
    genuinely need Python (a library hash, a learned sketch); for
    md5-sums, stay JVM-side.

    Cross-engine note: the 8-hex-char prefix fits 32 bits, the bigint
    sum of 2k such terms fits well under 2^63 (no ANSI overflow), and
    the mod lands both engines on the identical residue."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sig(ids):
        total = 0
        for v in ids:
            total += int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        return total % 2147483647

    # real annotation objects (Series -> scalar selects the GROUPED_AGG
    # variant); this module's postponed annotations would stringify an
    # inline signature and the UDF type-hint parser rejects it
    _sig.__annotations__ = {"ids": pd.Series, "return": int}
    content_sig = pandas_udf(_sig, "bigint")

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a second pandas
    # UDAF over the same group -- one aggregate pass either way
    def _n(ids):
        return len(ids)

    _n.__annotations__ = {"ids": pd.Series, "return": int}
    n_rows = pandas_udf(_n, "bigint")

    e = load_table(spark, "events", sf_dir).select("event_type", "event_id")
    return e.groupBy("event_type").agg(
        n_rows("event_id").alias("n"),
        content_sig("event_id").alias("content_sig"),
    )


@register(
    "q18_large_orders",
    tags=("join", "aggregation", "having", "top-k"),
    oracle="""
        SELECT c_name, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
               sum_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180
        ) big ON o_orderkey = l_orderkey
        ORDER BY total_price DESC, o_orderkey
        LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-filter (HAVING) feeding a join, with
    a global top-k.

    Scale notes: the lineitem aggregate shrinks the fact side before any
    join (aggregate pushdown by construction); the orders join then runs on
    orders-per-qualifying-key cardinality.  The final ORDER BY + LIMIT
    plans as TakeOrderedAndProject -- per-partition top-k then a k-row
    merge on the driver, never a global sort."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    big = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 180)
        .select("l_orderkey", F.col("sum_qty_dec").cast("double").alias("sum_qty"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            money("o_totalprice").cast("double").alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "order_revenue_salted_join",
    tags=("join", "skew", "aggregation"),
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
)
def order_revenue_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders-customer join executed through the explicit salting
    operator; the oracle is the plain unsalted join, so the hash match
    proves salting changes the physical fan-out and nothing else.

    Scale notes: use this form when one customer owns so many orders
    that even AQE's split of the hot partition leaves single-task
    stragglers; 8 salt buckets bound any key's share at 1/8 per task at
    the cost of replicating the customer side 8x (see operators/skew.py)."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    joined = salted_join(
        orders, customer, on=["o_custkey"], salt_buckets=8, big_salt_src="o_orderkey"
    )
    return (
        joined.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(money("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "distinct_users_per_event_type",
    tags=("aggregation", "skew", "distinct"),
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY event_type
    """,
)
def distinct_users_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe COUNT(DISTINCT): two-phase dedup-then-count (see
    operators/skew.py).  With only a handful of event_type groups, the
    naive single-shuffle plan would funnel every (type, user) pair of a
    type through one task -- this shape is exactly the low-cardinality
    hot-group case the two-phase form exists for."""
    e = load_table(spark, "events", sf_dir)
    return distinct_count_twophase(e, ["event_type"], "user_id")


@register(
    "asof_last_view_before_purchase",
    tags=("asof-join", "window"),
    oracle="""
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT v.event_id FROM events v
                WHERE v.user_id = p.user_id
                  AND v.event_type = 'view'
                  AND v.ts <= p.ts
                ORDER BY v.ts DESC, v.event_id DESC
                LIMIT 1) AS view_event_id_asof
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase matched to the user's most recent
    view at or before it.  The oracle is a deliberately different
    algorithm (correlated top-1 subquery) so a hash match validates the
    union-trick implementation independently.

    Scale notes: one shuffle on user_id, zero joins -- see
    operators/asof.py for why the naive range-join formulation is
    quadratic on hot keys."""
    e = load_table(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id"],
        tiebreak="event_id",
    ).withColumnRenamed("event_id_asof", "view_event_id_asof")


@register(
    "sessionization_30min",
    tags=("sessionization", "window"),
    oracle="""
        WITH numbered AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_no
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
        )
        SELECT user_id, session_no,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM numbered
        GROUP BY user_id, session_no
    """,
)
def sessionization_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) + per-session rollup.

    Scale notes: sessionize is lag + running sum in ONE window partition
    per user -- the session aggregate then groups on (user, session_no)
    which is partition-local after the window shuffle, so AQE coalesces
    it without a second exchange."""
    e = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id")
    s = sessionize(e, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "events_session_window_builtin",
    tags=("sessionization", "session-window", "builtin"),
    oracle="""
        WITH numbered AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_no
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_no
    """,
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's BUILT-IN session_window aggregate --
    the operator twin of the manual lag+cumsum sessionization above, and
    the form that transfers unchanged to Structured Streaming (merging
    session state across micro-batches under a watermark, which the
    manual window form cannot do).

    Semantics quirk the oracle mirrors: session_window closes a session
    when the NEXT event is >= gap after the last (a gap of exactly 30:00
    starts a new session), and the reported session end is last-event
    time + gap, not last-event time.

    Scale notes: one shuffle on user_id, then Spark's
    UpdatingSessionsExec merges windows partition-locally -- same
    exchange count as the manual form."""
    e = load_table(spark, "events", sf_dir).select("user_id", "ts")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "user_value_zscore",
    tags=("window", "statistics", "exact-moments"),
    oracle="""
        WITH q AS (
            SELECT event_id, user_id,
                   CAST(FLOOR(value * 100) AS BIGINT) AS vq
            FROM events
        ),
        m AS (
            SELECT event_id, user_id, vq,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n,
                   CAST(SUM(vq) OVER w AS BIGINT) AS s,
                   CAST(SUM(vq * vq) OVER w AS BIGINT) AS ss
            FROM q
            WINDOW w AS (PARTITION BY user_id)
        )
        SELECT event_id, user_id,
               (CAST(vq AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt(
                   (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                 ) AS z
        FROM m
        WHERE n >= 2
          AND CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) > 0
    """,
)
def user_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score standardisation of event values -- the
    feature-normalisation step of a training pipeline, done with EXACT
    integer moments so the result hash-matches across engines: values
    quantise to cents (bigint), the per-user count/sum/sum-of-squares
    come from one unbounded window, and mean/variance/z are derived in
    IEEE double arithmetic with identical association order on both
    sides (sqrt is correctly-rounded per IEEE, so it is portable;
    sum-of-doubles is NOT, which is why the sums happen in bigint).

    Scale notes: one shuffle on user_id, three window aggregates over the
    same frame share one sort; the z projection is scan-stage math.
    Degenerate users (n<2 or zero variance) are filtered by the same
    exact-integer predicate both engines evaluate."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("vq"),
    )
    w = Window.partitionBy("user_id")
    m = e.select(
        "event_id",
        "user_id",
        "vq",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("vq").over(w).cast("bigint").alias("s"),
        F.sum(F.col("vq") * F.col("vq")).over(w).cast("bigint").alias("ss"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    var_num = nd * ssd - sd * sd
    z = (F.col("vq").cast("double") - sd / nd) / F.sqrt(
        var_num / (nd * (F.col("n") - 1).cast("double"))
    )
    return m.filter((F.col("n") >= 2) & (var_num > 0)).select(
        "event_id", "user_id", z.alias("z")
    )


@register(
    "incremental_monthly_rollup",
    tags=("aggregation", "incremental", "partial-agg"),
    oracle="""
        SELECT CAST(YEAR(ts) AS INT) AS y,
               CAST(MONTH(ts) AS INT) AS m,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY YEAR(ts), MONTH(ts)
    """,
)
def incremental_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly rollup maintained from DAILY partial aggregates -- the
    incremental-view-maintenance shape: a production pipeline materialises
    one partial-state row per (day, grain) as each day lands, and the
    month (or quarter, or lifetime) rollup is a merge of partials that
    never rescans raw events.  Count and sum merge losslessly; the
    distinct-user count is the one aggregate that does NOT decompose
    from day-level counts, so the partial state keeps the (day, user)
    grain -- distincts then merge exactly at any coarser grain, the same
    way the reference's weekly snapshot
    merge re-reads only the post-cutoff dailies (plans/runner.py).

    Here the exact path is what both levels compute (so the oracle can
    hash it): dailies = groupBy(day, user) partials, month = merge.  The
    two-level plan shuffles (day,user)-sized partials, not events --
    map-side combine does the heavy lifting in the scan stage.

    Scale notes: at 100 TB the daily-partials table is ~10^5x smaller
    than raw events; re-aggregating a month touches 30 partial files
    under partition pruning instead of re-scanning the month's raw data."""
    e = load_table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("vq"),
    )
    # daily partial state at (day, user) grain: mergeable counts/sums,
    # and the user grain keeps exact distincts derivable downstream
    daily = e.groupBy("day", "y", "m", "user_id").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("vq").alias("psum")
    )
    return daily.groupBy("y", "m").agg(
        F.sum("pn").cast("bigint").alias("n_events"),
        F.sum("psum").cast("bigint").alias("sum_cents"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


def _zorder_oracle() -> str:
    """DuckDB twin of operators/zorder.zvalue at bits=10 over
    (user_id, value-bucket): generated bit-interleave expression."""
    terms = " | ".join(
        f"((({c} >> {b}) & 1) << {b * 2 + i})"
        for b in range(10)
        for i, c in enumerate(("zx", "zv"))
    )
    return f"""
        WITH z AS (
            SELECT event_id,
                   GREATEST(0, LEAST(CAST(user_id AS BIGINT), 1023)) AS zx,
                   GREATEST(0, LEAST(CAST(FLOOR(value) AS BIGINT), 1023)) AS zv
            FROM events
        )
        SELECT event_id, CAST({terms} AS BIGINT) AS zval FROM z
    """


@register(
    "zorder_cells",
    tags=("layout", "zorder", "pruning"),
    oracle=_zorder_oracle(),
)
def zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over (user_id, value-bucket) -- the multi-dim
    clustering key behind operators/zorder.write_zordered (files written
    in z order carry tight min/max on EVERY interleaved column, so range
    predicates on any of them prune files/row-groups; see
    tests/test_zorder.py for the measured bounding-box shrink).  The
    z-value itself is pure integer bit math, oracle-checked bit for bit.

    Scale notes: a per-row projection inside the scan stage -- the
    shift/and/or chain is one codegen expression, no shuffle, no
    Python."""
    from ..operators.zorder import zvalue

    e = load_table(spark, "events", sf_dir)
    return e.select(
        "event_id",
        zvalue(
            # explicit floor: Spark CAST(double AS bigint) truncates while
            # DuckDB rounds -- floor first makes both exact
            [F.col("user_id"), F.floor("value").cast("bigint")], bits=10
        ).alias("zval"),
    )


@register(
    "user_sequence_match_counts",
    tags=("sequence", "automaton", "higher-order-functions", "funnel"),
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   CAST(list(CASE event_type
                                 WHEN 'view' THEN 1
                                 WHEN 'click' THEN 2
                                 WHEN 'purchase' THEN 3
                                 ELSE 0 END ORDER BY ts, event_id)
                        AS BIGINT[]) AS codes
            FROM events GROUP BY user_id
        ), folded AS (
            SELECT user_id,
                   -- FLAT single CASE: a CASE nested inside the lambda's
                   -- CASE mis-evaluates in DuckDB 1.0.0's grouped
                   -- pipeline (returned acc contradicted a reference
                   -- fold of the very list the same query yields);
                   -- the flattened delta form is bug-free and the
                   -- Spark side mirrors it token-for-token
                   list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                       (acc, c) -> acc + CASE
                           WHEN c = (acc // 1000000000000) + 1
                                AND (acc // 1000000000000) = 2
                               THEN -1999999999999
                           WHEN c = (acc // 1000000000000) + 1
                               THEN 1000000000000
                           ELSE 0 END) AS acc
            FROM seq
        )
        SELECT user_id,
               CAST(acc % 1000000000000 AS BIGINT) AS n_matches,
               CAST(acc // 1000000000000 AS BIGINT) AS pending_stage
        FROM folded
    """,
)
def user_sequence_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern automaton as a CATALYST FOLD: per user, count
    greedy non-overlapping view -> click -> purchase subsequence
    matches over the time-ordered event stream.  Spark has no
    MATCH_RECOGNIZE; instead the automaton state (stage, count) is
    packed into one BIGINT (stage*1e12 + count -- the count field wraps
    only past 1e12 completed matches per user, beyond any physical
    event volume; stage <= 2 keeps the packed value under 4e12) and
    advanced by
    F.aggregate over the ordered per-user code array -- whole-stage
    codegen, no Python, and the identical integer fold runs in DuckDB's
    list_reduce, so the oracle is exact.  pending_stage exposes the
    in-flight partial match (resume state for incremental runs).

    Scale notes: one shuffle to group each user's events; the array
    holds one user's events only (bounded per key -- the unbounded-key
    streaming twin is applyInPandasWithState, streaming/stateful.py).
    The fold is O(events) with zero additional shuffles.  Generalising
    the pattern = swapping the code CASE and the terminal stage
    constant."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id",
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            F.when(F.col("event_type") == "view", 1)
            .when(F.col("event_type") == "click", 2)
            .when(F.col("event_type") == "purchase", 3)
            .otherwise(0)
            .cast("bigint")
            .alias("code"),
        ).alias("ev"),
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list("ev")).alias("seq")
    )
    folded = per_user.select(
        "user_id",
        F.expr(
            """
            aggregate(
                transform(seq, s -> s.code),
                CAST(0 AS BIGINT),
                (acc, c) -> acc + CASE
                    WHEN c = (acc div 1000000000000) + 1
                         AND (acc div 1000000000000) = 2
                        THEN CAST(-1999999999999 AS BIGINT)
                    WHEN c = (acc div 1000000000000) + 1
                        THEN CAST(1000000000000 AS BIGINT)
                    ELSE 0 END)
            """
        ).alias("acc"),
    )
    return folded.select(
        "user_id",
        (F.col("acc") % 1000000000000).cast("bigint").alias("n_matches"),
        F.expr("acc div 1000000000000").cast("bigint").alias("pending_stage"),
    )


@register(
    "user_value_drawdown",
    tags=("window", "running-max", "drawdown", "timeseries"),
    oracle="""
        WITH cum AS (
            SELECT event_id, user_id, ts,
                   SUM(CAST(value AS DECIMAL(12,2))) OVER w AS running_total
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT event_id, user_id, ts,
               CAST(running_total AS DOUBLE) AS running_total,
               CAST(MAX(running_total) OVER w2 AS DOUBLE) AS running_peak,
               CAST(MAX(running_total) OVER w2 - running_total AS DOUBLE)
                   AS drawdown
        FROM cum
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
    """,
)
def user_value_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and drawdown per user: cumulative value, its running
    maximum, and the gap between them -- the peak-tracking analytic
    (budget burn-down, engagement decay, portfolio drawdown) that needs
    a WINDOW OVER A WINDOW: the running max ranges over the cumulative
    sum, not the raw values.

    Scale notes: both windows share one (user_id, (ts, event_id))
    partition/order spec, so Catalyst plans ONE exchange + one sort
    feeding two stacked Window operators -- the second pass is
    partition-local.  Decimal inside both frames, double only at the
    output edge (module convention)."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", F.col("value").cast("decimal(12,2)").alias("v")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = e.select(
        "event_id", "user_id", "ts", F.sum("v").over(w).alias("running_total_d")
    )
    return cum.select(
        "event_id",
        "user_id",
        "ts",
        F.col("running_total_d").cast("double").alias("running_total"),
        F.max("running_total_d").over(w).cast("double").alias("running_peak"),
        (F.max("running_total_d").over(w) - F.col("running_total_d"))
        .cast("double")
        .alias("drawdown"),
    )


@register(
    "order_price_rank_profile",
    tags=("window", "percent-rank", "cume-dist", "ranking"),
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
                   AS total_price,
               PERCENT_RANK() OVER w AS price_pct_rank,
               CUME_DIST() OVER w AS price_cume_dist,
               CAST(NTILE(4) OVER w AS BIGINT) AS price_quartile
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey
        )
    """,
)
def order_price_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing windows per priority class: percent_rank
    ((rank-1)/(n-1)), cume_dist (peers-or-below / n), and quartile
    ntile -- the remaining ranking-window variants the other registered
    windows don't exercise.  All three are exact integer ratios (or
    assignments), so the doubles are bit-identical cross-engine with no
    decimal staging; ordering carries the unique o_orderkey tiebreaker
    so rank plateaus match.

    Scale notes: one hash exchange on the partition key + one sort
    serves all three functions (same window spec); none of them need a
    second pass -- rank arithmetic is streamed during the sort scan."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("p").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("p").cast("double").alias("total_price"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
    )


@register(
    "order_counts_cube",
    tags=("aggregation", "cube", "grouping-sets"),
    oracle="""
        SELECT
            COALESCE(o_orderpriority, 'ALL') AS priority,
            COALESCE(o_orderstatus, 'ALL') AS status,
            CAST(COUNT(*) AS BIGINT) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                AS revenue
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def order_counts_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (priority, status): all four grouping sets --
    both, each alone, and the grand total -- in one pass (the
    2^n-combination shape; the registered ROLLUP covers only the
    hierarchy prefix sets).

    Scale notes: Spark plans cube via Expand (2^n duplicated rows per
    input row) feeding ONE hash aggregate with map-side partials, so
    the shuffle carries group rows; keep n small -- Expand's 2^n input
    multiplication is the real cost at scale, which is why this cubes
    two low-cardinality columns, not ten.  Neither grouping column is
    nullable here, so the string COALESCE labels are unambiguous."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", "o_orderstatus", money("o_totalprice").alias("p")
    )
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("p").cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "value_winsorization_bounds",
    tags=("statistics", "percentile", "outliers"),
    oracle="""
        WITH b AS (
            SELECT event_type,
                   quantile_cont(value, 0.01) AS p01,
                   quantile_cont(value, 0.99) AS p99
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, b.p01, b.p99,
               CAST(SUM(CASE WHEN e.value < b.p01 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_below,
               CAST(SUM(CASE WHEN e.value > b.p99 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above,
               COUNT(*) AS n
        FROM events e JOIN b USING (event_type)
        GROUP BY e.event_type, b.p01, b.p99
    """,
)
def value_winsorization_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization prep -- the outlier-clamping step of feature
    pipelines: per event type, the exact interpolated p01/p99 bounds and
    how many rows each tail clamp would touch.  Spark percentile() and
    DuckDB quantile_cont() agree bit-for-bit on doubles (same
    interpolation), so the bounds AND the boundary comparisons
    hash-match.

    Scale notes: exact percentile sorts per group -- fine on bounded
    group counts; at petabyte scale swap in approx_percentile (its own
    registered query demonstrates the accuracy envelope) and the clamp
    counting is unchanged.  The bounds re-join is a broadcast (one row
    per event type)."""
    e = load_table(spark, "events", sf_dir).select("event_type", "value")
    b = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    return (
        e.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            F.sum((F.col("value") < F.col("p01")).cast("int"))
            .cast("bigint")
            .alias("n_below"),
            F.sum((F.col("value") > F.col("p99")).cast("int"))
            .cast("bigint")
            .alias("n_above"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "event_value_hour_correlation",
    tags=("statistics", "correlation", "exact-moments"),
    oracle="""
        WITH q AS (
            SELECT event_type,
                   CAST(HOUR(ts) AS BIGINT) AS h,
                   CAST(FLOOR(value * 100) AS BIGINT) AS v
            FROM events
        ),
        m AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(h) AS BIGINT) AS sh,
                   CAST(SUM(v) AS BIGINT) AS sv,
                   CAST(SUM(h * v) AS BIGINT) AS shv,
                   CAST(SUM(h * h) AS BIGINT) AS sh2,
                   CAST(SUM(v * v) AS BIGINT) AS sv2
            FROM q GROUP BY event_type
        )
        SELECT event_type, n,
               (CAST(n AS DOUBLE) * CAST(shv AS DOUBLE)
                - CAST(sh AS DOUBLE) * CAST(sv AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sh2 AS DOUBLE)
                       - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(sv2 AS DOUBLE)
                         - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)))
                   AS hour_value_corr
        FROM m
    """,
)
def event_value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hour-of-day and value per event type,
    from EXACT integer moments (same discipline as user_value_zscore):
    hour and cent-quantised value sum as bigints, the correlation is
    derived in fixed-association IEEE doubles with two correctly-rounded
    sqrts.  Spark's built-in corr() would NOT hash-match (double
    accumulation order); this form does, and is the same one partial
    aggregation distributes for free.

    Scale notes: one map-side-combined aggregate -- six integer sums per
    group ride the scan stage; no second pass, no window."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.hour("ts").cast("bigint").alias("h"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("h").cast("bigint").alias("sh"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("h") * F.col("v")).cast("bigint").alias("shv"),
        F.sum(F.col("h") * F.col("h")).cast("bigint").alias("sh2"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sv2"),
    )
    nd, shd, svd = (F.col(c).cast("double") for c in ("n", "sh", "sv"))
    shvd, sh2d, sv2d = (F.col(c).cast("double") for c in ("shv", "sh2", "sv2"))
    corr = (nd * shvd - shd * svd) / (
        F.sqrt(nd * sh2d - shd * shd) * F.sqrt(nd * sv2d - svd * svd)
    )
    return m.select("event_type", "n", corr.alias("hour_value_corr"))


@register(
    "monthly_order_spine",
    tags=("dimension-spine", "sequence", "left-join"),
    oracle="""
        WITH bounds AS (
            SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                   CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
            FROM orders
        ),
        spine AS (
            SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                               INTERVAL 1 MONTH)) AS DATE)
                   AS month_start
            FROM bounds
        ),
        m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ms,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS rev
            FROM orders GROUP BY 1
        )
        SELECT s.month_start,
               CAST(COALESCE(m.n, 0) AS BIGINT) AS n_orders,
               COALESCE(m.rev, 0.0) AS revenue
        FROM spine s LEFT JOIN m ON m.ms = s.month_start
    """,
)
def monthly_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete month spine joined against monthly order aggregates --
    the gap-preserving time series (months with zero orders appear as
    explicit zero rows, which a plain GROUP BY silently drops and every
    downstream model/forecast needs).  The spine is GENERATED
    (F.sequence over the data's own month bounds), not scanned.

    Scale notes: the spine is tiny (one row per month) and generated
    from a two-value aggregate; the left join broadcasts the monthly
    aggregate against it.  Generating dimensions instead of storing
    them is the zero-maintenance pattern for calendar/bucket spines."""
    o = load_table(spark, "orders", sf_dir).select(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("ms"),
        money("o_totalprice").alias("p"),
    )
    bounds = o.agg(F.min("ms").alias("lo"), F.max("ms").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias(
            "month_start"
        )
    )
    monthly = o.groupBy("ms").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p").cast("double").alias("rev"),
    )
    return spine.join(
        monthly, spine["month_start"] == monthly["ms"], "left"
    ).select(
        "month_start",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("rev", F.lit(0.0)).alias("revenue"),
    )


@register(
    "monthly_revenue_growth",
    tags=("window", "lag", "time-series"),
    oracle="""
        WITH m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                       AS month_start,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM orders GROUP BY 1
        )
        SELECT month_start, rev_cents,
               CAST(rev_cents - LAG(rev_cents) OVER (ORDER BY month_start)
                    AS BIGINT) AS delta_cents,
               CAST(rev_cents AS DOUBLE)
                   / CAST(LAG(rev_cents) OVER (ORDER BY month_start)
                          AS DOUBLE) AS growth_ratio
        FROM m
    """,
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas and growth ratio: monthly cent
    sums (exact bigint; prices are 2-decimal so *100 is lossless), lag
    over the month series, one deterministic double division for the
    ratio (first month's lag is NULL in both engines).

    Scale notes: the lag window runs over the AGGREGATED series -- one
    row per month -- so the single-partition window is a driver-sized
    triviality, not a scale concern; the heavy lifting is the
    map-side-combined monthly aggregate."""
    o = load_table(spark, "orders", sf_dir).select(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        # floor, not cast: double->int casts TRUNCATE in Spark but ROUND
        # in DuckDB; floor-then-cast is identical in both
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    m = o.groupBy("month_start").agg(
        F.sum("cents").cast("bigint").alias("rev_cents")
    )
    w = Window.orderBy("month_start")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "month_start",
        "rev_cents",
        (F.col("rev_cents") - prev).cast("bigint").alias("delta_cents"),
        (F.col("rev_cents").cast("double") / prev.cast("double")).alias(
            "growth_ratio"
        ),
    )


@register(
    "trailing_7d_active_users",
    tags=("window", "distinct", "time-series"),
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        mem AS (
            SELECT CAST(unnest(generate_series(
                       day::TIMESTAMP,
                       (day + INTERVAL 6 DAY)::TIMESTAMP,
                       INTERVAL 1 DAY)) AS DATE) AS asof_day,
                   user_id
            FROM du
        )
        SELECT asof_day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM mem GROUP BY asof_day
    """,
)
def trailing_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (WAU) -- the sliding DISTINCT
    that a RANGE window cannot express (count_distinct is unsupported
    over window frames in both engines).  The scale-shape rewrite:
    collapse to distinct (day, user) first (the only corpus-sized pass),
    then explode each activity day into the 7 as-of days it supports and
    run a plain distinct-count aggregate -- membership amplification is
    7x on the ALREADY-collapsed day/user pairs, not on raw events.
    Days past the last activity keep their partial trailing windows
    (asof_day extends 6 days beyond max(day); both engines agree).

    Scale notes: distinct(day,user) is map-side partial + one shuffle;
    the explode is a generator in the same stage; the final
    count_distinct shuffles (asof_day, user) pairs.  At 100 TB the
    (day, user) set is ~10^4x smaller than events."""
    e = load_table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    du = e.distinct()
    mem = du.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 day, interval 1 day)")
        ).alias("asof_day"),
        "user_id",
    )
    return mem.groupBy("asof_day").agg(
        F.count_distinct("user_id").cast("bigint").alias("wau")
    )


@register(
    "event_gap_percentiles",
    tags=("window", "percentile", "time-series"),
    oracle="""
        WITH g AS (
            SELECT event_type,
                   date_diff('microsecond',
                             LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) AS gap_us
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n_gaps,
               quantile_cont(CAST(gap_us AS DOUBLE), 0.5) AS p50_us,
               quantile_cont(CAST(gap_us AS DOUBLE), 0.9) AS p90_us
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY event_type
    """,
)
def event_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per event type: per-user lag over
    event time, exact interpolated p50/p90 of the gaps.  Gaps are exact
    integer MICROseconds from pure-NTZ arithmetic (session-timezone
    independent, sub-second precision preserved); the percentile
    interpolates over their double images, which is parity-exact
    (percentile == quantile_cont bit-for-bit; integers < 2^53 are exact
    doubles).

    Scale notes: one shuffle on user_id for the lag window; the
    percentile groups by event_type -- a handful of groups, each sorting
    only its gaps.  The sessionization gap threshold (30 min) can be
    read straight off this distribution, which is why the query earns
    its place next to the session operators."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type", "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) over (partition by user_id"
        " order by ts asc, event_id asc), ts)"
    )
    g = e.select("event_type", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.percentile(F.col("gap_us").cast("double"), F.lit(0.5)).alias("p50_us"),
        F.percentile(F.col("gap_us").cast("double"), F.lit(0.9)).alias("p90_us"),
    )


@register(
    "user_value_forward_fill",
    tags=("window", "gap-fill", "ignore-nulls"),
    oracle="""
        SELECT event_id, user_id,
               CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE)
                   AS masked_value,
               CAST(last_value(CASE WHEN event_type <> 'click'
                                    THEN CAST(value AS DECIMAL(12,2)) END
                               IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   AS filled_value
        FROM events
    """,
)
def user_value_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last-observation-carried-forward): clicks are
    treated as carrying no reading, and each row takes the most recent
    non-click value in its user's event-time order -- the gap-filling
    primitive of sensor/feature pipelines, spelled with last_value
    IGNORE NULLS over a running frame (identical semantics in both
    engines; leading unfilled rows stay NULL).  Values ride as exact
    decimals and convert to double once at the end (module convention:
    decimal-in-flight, double-out keeps the hash bit-stable).

    Scale notes: one shuffle on user_id + per-partition sort; the fill
    is a single streaming pass over the frame -- same cost profile as
    any running aggregate, no self-join, no correlated subquery (the
    naive LOCF spellings that do not survive scale)."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    reading = F.when(F.col("event_type") != "click", F.col("v"))
    return e.select(
        "event_id",
        "user_id",
        F.col("v").cast("double").alias("masked_value"),
        F.last(reading, ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("filled_value"),
    )


@register(
    "event_type_transition_matrix",
    tags=("sequence", "window", "markov"),
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type,
                   event_type AS next_type
            FROM events
        )
        SELECT prev_type, next_type,
               COUNT(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """,
)
def event_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioural transition matrix: per user, each
    consecutive event pair (lag over event time) rolled up to
    (prev_type, next_type) counts -- the empirical Markov kernel behind
    next-action models and funnel diagnostics (the full-sequence
    automaton, user_sequence_match_counts, answers pattern queries; this
    is the aggregate view).

    Scale notes: one shuffle on user_id for the lag, then a
    5x5-group aggregate that combines map-side -- transition counting
    costs the same as any running window at any corpus size."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "user_churn_flags",
    tags=("aggregation", "churn", "broadcast-scalar"),
    oracle="""
        WITH m AS (SELECT MAX(ts) AS corpus_max FROM events),
        u AS (
            SELECT user_id,
                   COUNT(*) AS n_events,
                   MAX(ts) AS last_seen
            FROM events GROUP BY user_id
        )
        SELECT u.user_id, u.n_events, u.last_seen,
               u.last_seen < m.corpus_max - INTERVAL 14 DAY AS churned_14d
        FROM u, m
    """,
)
def user_churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn flags relative to the corpus's own clock: a user is
    14d-churned iff their last event precedes (global max ts - 14 days).
    Anchoring on the data's max -- not wall-clock now() -- keeps the
    query deterministic, replayable, and oracle-checkable (the same
    reason bench fixtures pin EXPORT_DATE).

    Scale notes: one map-side-combined per-user aggregate; the corpus
    max is a broadcast singleton joined to every row -- the same
    broadcast-scalar shape as q22's average-balance filter."""
    e = load_table(spark, "events", sf_dir)
    m = e.agg(F.max("ts").alias("corpus_max"))
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_seen")
    )
    return u.crossJoin(F.broadcast(m)).select(
        "user_id",
        "n_events",
        "last_seen",
        (
            F.col("last_seen")
            < F.col("corpus_max") - F.expr("interval 14 days")
        ).alias("churned_14d"),
    )


@register(
    "event_burst_windows",
    tags=("window-agg", "anomaly", "time-series"),
    oracle="""
        WITH w AS (
            SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1
        ),
        trail AS (
            SELECT window_start, n_events,
                   CAST(SUM(n_events) OVER (
                       ORDER BY window_start
                       ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING
                   ) AS BIGINT) AS trail_sum,
                   CAST(COUNT(*) OVER (
                       ORDER BY window_start
                       ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING
                   ) AS BIGINT) AS trail_n
            FROM w
        )
        SELECT window_start, n_events, trail_sum, trail_n,
               n_events * trail_n * 2 > trail_sum * 3 AS is_burst
        FROM trail WHERE trail_n > 0
    """,
)
def event_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection over 6-hour tumbling windows: a window is a burst
    when its count exceeds 1.5x the mean of the trailing 4 windows.  The
    threshold is cross-multiplied (n * trail_n * 2 > trail_sum * 3), so
    the flag is pure integer arithmetic -- no division, no float
    boundary flips between engines (module convention for threshold
    compares).

    Scale notes: the corpus collapses to one row per window FIRST
    (map-side partials); the trailing frame then runs over the
    windows-sized series.  The ordered frame is a single partition by
    construction -- correct here because windows-per-corpus is tiny; a
    per-entity burst detector would partition by the entity."""
    e = load_table(spark, "events", sf_dir)
    w = (
        e.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    frame = Window.orderBy("window_start").rowsBetween(-4, -1)
    trail = w.select(
        "window_start",
        "n_events",
        F.sum("n_events").over(frame).cast("bigint").alias("trail_sum"),
        F.count(F.lit(1)).over(frame).cast("bigint").alias("trail_n"),
    )
    return trail.filter(F.col("trail_n") > 0).select(
        "window_start",
        "n_events",
        "trail_sum",
        "trail_n",
        (
            F.col("n_events") * F.col("trail_n") * 2
            > F.col("trail_sum") * 3
        ).alias("is_burst"),
    )


@register(
    "events_dow_hour_heatmap",
    tags=("aggregation", "calendar", "heatmap"),
    oracle="""
        SELECT CAST(isodow(ts) AS INT) AS dow,
               CAST(HOUR(ts) AS INT) AS hour,
               COUNT(*) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap -- the load-profile
    rollup behind capacity planning and batch-window placement.
    Calendar parity is the trap here: engines disagree on week-start
    conventions (Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday),
    so both sides use the ISO numbering -- Spark weekday()+1 ==
    DuckDB isodow(), 1=Monday..7=Sunday -- and the rollup is
    engine-exact.

    Scale notes: two scan-stage calendar projections feeding a
    168-group map-side-combined aggregate; the distinct-user count
    shuffles (cell, user) pairs once."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.select(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
            "user_id",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@register(
    "peak_concurrent_sessions",
    tags=("sweep-line", "sessionization", "window"),
    oracle="""
        WITH numbered AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_no
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
        ),
        sessions AS (
            SELECT user_id, session_no,
                   MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM numbered GROUP BY user_id, session_no
        ),
        deltas AS (
            SELECT s_start AS t, 1 AS d FROM sessions
            UNION ALL
            SELECT s_end AS t, -1 AS d FROM sessions
        ),
        sweep AS (
            SELECT t,
                   CAST(SUM(SUM(d)) OVER (ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
            FROM deltas GROUP BY t
        )
        SELECT CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent,
               CAST(MIN(t_at_peak) AS TIMESTAMP) AS first_peak_at
        FROM (
            SELECT concurrent,
                   CASE WHEN concurrent = MAX(concurrent) OVER ()
                        THEN t END AS t_at_peak
            FROM sweep
        )
        WHERE concurrent = (SELECT MAX(concurrent) FROM sweep)
        GROUP BY concurrent
    """,
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions -- the SWEEP-LINE shape: sessions
    become +1/-1 boundary deltas, a time-ordered running sum gives the
    concurrency curve, and the answer is its maximum (with the first
    time it is reached).  End==start ties net out within the same
    timestamp because deltas are SUMMED PER INSTANT before the running
    sum -- a session ending exactly when another starts does not double
    count (both engines group by t first).

    Scale notes: sessionization is the usual per-user window; the sweep
    itself runs over session-boundary COUNTS (two rows per session,
    summed per distinct instant), a series ~10^4x smaller than events.
    Its ordered running sum is a single partition by construction --
    fine at boundary-series size; a per-day partition keys the sweep
    when the series itself gets big."""
    from ..operators.sessions import sessionize

    e = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id")
    s = sessionize(e, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
    sessions = s.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    deltas = sessions.select(
        F.col("s_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(sessions.select(F.col("s_end").alias("t"), F.lit(-1).alias("d")))
    per_instant = deltas.groupBy("t").agg(F.sum("d").alias("dd"))
    sweep = per_instant.select(
        "t",
        F.sum("dd")
        .over(
            Window.orderBy("t").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("bigint")
        .alias("concurrent"),
    )
    peak = sweep.agg(F.max("concurrent").alias("peak"))
    return (
        sweep.join(F.broadcast(peak), sweep["concurrent"] == peak["peak"])
        .groupBy("concurrent")
        .agg(F.min("t").alias("first_peak_at"))
        .select(
            F.col("concurrent").alias("peak_concurrent"),
            F.col("first_peak_at").cast("timestamp").alias("first_peak_at"),
        )
    )


@register(
    "order_backlog_aging",
    tags=("aggregation", "aging", "calendar"),
    oracle="""
        WITH m AS (SELECT MAX(o_orderdate) AS anchor FROM orders),
        aged AS (
            SELECT o.o_orderstatus,
                   LEAST(date_diff('day', o.o_orderdate, m.anchor) // 365, 4)
                       AS age_years
            FROM orders o, m
            WHERE o.o_orderstatus <> 'F'
        )
        SELECT o_orderstatus, CAST(age_years AS BIGINT) AS age_years,
               COUNT(*) AS n_orders
        FROM aged GROUP BY 1, 2
    """,
)
def order_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: non-finished orders bucketed by whole
    years outstanding relative to the dataset's own last order date
    (data-anchored clock again -- deterministic and replayable, like
    user_churn_flags).  Integer day diffs, integer bucket division,
    top bucket open at 4+ years.

    Scale notes: broadcast-scalar anchor + scan-stage bucket arithmetic
    + a tiny aggregate; the WHERE prunes finished orders inside the
    scan."""
    o = load_table(spark, "orders", sf_dir)
    m = o.agg(F.max("o_orderdate").alias("anchor"))
    aged = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(m))
        .select(
            "o_orderstatus",
            F.least(
                F.floor(F.datediff("anchor", "o_orderdate") / 365), F.lit(4)
            )
            .cast("bigint")
            .alias("age_years"),
        )
    )
    return aged.groupBy("o_orderstatus", "age_years").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
