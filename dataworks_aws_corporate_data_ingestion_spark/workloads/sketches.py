"""Sketch-based approximations with driver-checkable error certificates.

At 100 TB an exact COUNT(DISTINCT user) is a full shuffle of every
distinct key and an exact percentile is a global sort; the scale path is
sketches -- HyperLogLog++ (`approx_count_distinct`) and the
KLL/Greenwald-Khanna family (`approx_percentile`) -- which aggregate
map-side into kilobyte state and never shuffle the data itself.

A sketch cannot hash-match a DuckDB oracle (different algorithms,
different registers), so these use the recall-certificate pattern
(cf. simhash_recall_certificate): Spark computes BOTH the sketch and
the exact value, states an integer-exact claim about the error -- the
HLL estimate within the configured rsd envelope (cross-multiplied), the
approx percentile's true RANK within the accuracy envelope of the
target rank -- and the oracle independently recomputes the exact values
and states the claims TRUE.  A sketch regression (upgrade changing
defaults, broken accuracy parameter) flips a boolean; an exact-side
regression flips a count.  The exact twin runs beside the sketch here
because the certificate needs it; production at 100 TB runs the sketch
alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..workload import register

# HLL++ relative standard deviation: estimates are within ±3*rsd of
# exact with probability ~0.99; the certificate allows 4*rsd so a pass
# is overwhelmingly stable while a broken sketch still flips it.
_RSD = 0.02
_RSD_BOUND_PCT = 8  # 4 * rsd, as integer percent

# approx_percentile accuracy: rank error <= n / _ACC
_ACC = 10_000
# certificate envelope: |true_rank(approx) - target_rank| <= 2n/_ACC,
# expressed with integer cross-multiplication (2n/10000 = n/5000)
_RANK_DEN = 5_000


@register(
    "approx_distinct_certificate",
    tags=("sketch", "hll", "approx", "recall-certificate", "scale-path"),
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS within_bound
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def approx_distinct_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type distinct users: HLL++ estimate certified against
    the exact count.  `within_bound` holds iff
    |estimate - exact| * 100 <= exact * 8 (4x the configured 2% rsd,
    integer cross-multiplied).  The oracle recomputes the exact counts,
    so the hash pins BOTH the exact aggregation and the sketch's
    accuracy contract.

    Scale notes: the HLL path aggregates ~1.5 KB registers map-side per
    group -- no distinct-key shuffle; the exact twin (the certificate's
    ground truth) is the one paying the (event_type, user_id) exchange
    and exists only to certify."""
    e = load_table(spark, "events", sf_dir)
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=_RSD).alias("__est"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("__est") - F.col("n_exact")) * 100
            <= F.col("n_exact") * _RSD_BOUND_PCT
        ).alias("within_bound"),
    ).orderBy("event_type")


@register(
    "approx_quantile_certificate",
    tags=("sketch", "quantile", "approx", "recall-certificate", "scale-path"),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               quantile_cont(value, 0.5) AS exact_p50,
               quantile_cont(value, 0.9) AS exact_p90,
               TRUE AS p50_rank_ok,
               TRUE AS p90_rank_ok
        FROM events
    """,
)
def approx_quantile_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Median and p90 of event value: the sketch (approx_percentile,
    accuracy 10000) certified by an integer-exact RANK claim -- the
    number of rows <= the approx value must sit within 2n/10000 of the
    target rank.  Rank, not value distance: the sketch's contract is
    rank error <= n/accuracy, and rank is exactly recomputable on both
    engines while value-space error depends on the data's density.

    The exact p50/p90 ride along (percentile == quantile_cont,
    bit-for-bit -- the interpolated-percentile parity the suite already
    certifies), so the hash also pins the exact-percentile path.

    Scale notes: the sketch is one map-side aggregate of bounded state;
    rank verification is one COUNT with a scalar predicate -- a second
    scan, no sort, no shuffle beyond the 1-row aggregates."""
    e = load_table(spark, "events", sf_dir)
    sk = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.percentile_approx("value", 0.5, _ACC).alias("a50"),
        F.percentile_approx("value", 0.9, _ACC).alias("a90"),
        F.expr("percentile(value, 0.5D)").alias("exact_p50"),
        F.expr("percentile(value, 0.9D)").alias("exact_p90"),
    ).collect()[0]
    n, a50, a90 = sk.n, sk.a50, sk.a90
    ranks = e.agg(
        F.count(F.when(F.col("value") <= F.lit(a50), 1))
        .cast("bigint")
        .alias("r50"),
        F.count(F.when(F.col("value") <= F.lit(a90), 1))
        .cast("bigint")
        .alias("r90"),
    ).collect()[0]
    # |rank - q*n| <= 2n/_ACC, cross-multiplied to integers:
    # |rank*10 - q*10*n| * _RANK_DEN <= n * 10
    p50_ok = abs(ranks.r50 * 10 - 5 * n) * _RANK_DEN <= n * 10
    p90_ok = abs(ranks.r90 * 10 - 9 * n) * _RANK_DEN <= n * 10
    return spark.createDataFrame(
        [
            (
                int(n),
                float(sk.exact_p50),
                float(sk.exact_p90),
                bool(p50_ok),
                bool(p90_ok),
            )
        ],
        "n bigint, exact_p50 double, exact_p90 double, "
        "p50_rank_ok boolean, p90_rank_ok boolean",
    )


@register(
    "hll_mergeable_rollup_certificate",
    tags=("sketch", "hll", "approx", "incremental", "recall-certificate",
          "scale-path"),
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS merged_within_bound
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def hll_mergeable_rollup_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGEABILITY is the sketch property that matters at 100 TB: one
    Datasketches HLL per (event_type, day) is the incremental unit a
    daily pipeline materialises, and the month's distinct-user estimate
    is a UNION of stored sketches -- no rescan of history, unlike
    approx_count_distinct whose state lives and dies inside one query.
    This certificate builds the per-day sketches (lgConfigK=14, ~1.6%
    rsd), merges them with hll_union_agg, and certifies the merged
    estimate within 8% of the exact month-wide distinct count
    (cross-multiplied) -- plus the day count, so the oracle also pins
    that the daily decomposition covered every partition.

    Scale notes: daily sketch build is a map-side aggregate (16 KB
    state per group); the merge touches n_days x n_types sketch blobs,
    independent of corpus size.  The exact twin exists only to certify."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "__est"
        ),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_exact",
            (
                F.abs(F.col("__est") - F.col("n_exact")) * 100
                <= F.col("n_exact") * 8
            ).alias("merged_within_bound"),
        )
        .orderBy("event_type")
    )
