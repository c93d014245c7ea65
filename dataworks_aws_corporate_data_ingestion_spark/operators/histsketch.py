"""Mergeable histogram sketches for quantile rollups.

The missing half of the mergeable-daily-sketch story: the HLL rollup
(workloads/sketches.py::hll_mergeable_rollup_certificate) lets a month's
DISTINCT count be a union of stored per-day sketches, but
`approx_percentile`'s KLL state lives and dies inside one query -- a
month's p99 still rescans history.  A fixed-bin histogram is the
mergeable quantile sketch: per-day bin counts are rows, merging days is
integer ADDITION (like HLL union, bloom OR, KMV MIN), and a quantile
estimate from the merged bins carries a hard rank guarantee -- the true
q-quantile's rank lies inside the chosen bin, so the rank error is
bounded by that bin's count and the value error by the bin width.

Bins are computed in EXACT integer arithmetic (cents via
floor-before-cast, then `cents * n_bins DIV span_cents`), so the same
expression produces identical bins in Spark and DuckDB and the
certificate's rank claims are integer-exact -- no float boundary can
flip a row (the engine-wide cross-multiplication rule).

At 100 TB: each day stores <= n_bins rows (kilobytes); any window's
quantile is one SUM over stored rows plus a driver-side cumulative walk
over <= n_bins integers.  History is never rescanned; resolution is a
storage knob (n_bins), not a recompute."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cents_bin", "daily_histogram", "merge_histograms",
           "bin_for_rank", "grouped_daily_histogram",
           "merge_grouped_histograms"]


def cents_bin(value_col: Column, n_bins: int, span_cents: int) -> Column:
    """Exact integer bin index for a non-negative value: cents =
    FLOOR(value*100) (floor-before-cast: Spark CAST truncates, DuckDB
    rounds), bin = cents * n_bins DIV span_cents (true integer
    division, never a double quotient that could land one ulp under an
    integer), clamped to the top bin.  Engine-exact by construction."""
    cents = F.floor(value_col * 100).cast("bigint")
    raw = cents * F.lit(n_bins).cast("bigint")
    # (raw - raw % span) / span: the numerator is an exact multiple of
    # span, so the quotient is integer-exact in double and the cast is
    # safe -- equivalent to BIGINT DIV in both engines.
    quot = ((raw - F.pmod(raw, F.lit(span_cents))) / F.lit(span_cents)).cast(
        "bigint"
    )
    return F.least(quot, F.lit(n_bins - 1).cast("bigint"))


def daily_histogram(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    n_bins: int,
    span_cents: int,
) -> DataFrame:
    """Per-(day, bin) counts -- the stored daily sketch.  One map-side
    combined aggregate; <= n_bins rows per day regardless of volume."""
    return (
        df.select(
            F.col(ts_col).cast("date").alias("day"),
            cents_bin(F.col(value_col), n_bins, span_cents).alias("bin"),
        )
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_histograms(daily: DataFrame) -> DataFrame:
    """Roll stored per-day sketches up to one histogram: integer
    addition per bin -- the mergeability that lets any date window's
    quantile be computed from stored rows without rescanning events."""
    return daily.groupBy("bin").agg(F.sum("n").cast("bigint").alias("n"))


def bin_for_rank(bins: list[tuple[int, int]], rank: int) -> int:
    """The bin containing the value of the given 1-based rank, from a
    collected [(bin, count)] list (<= n_bins entries).  The true value
    at `rank` lies inside the returned bin -- the sketch's guarantee."""
    cum = 0
    for b, n in sorted(bins):
        cum += n
        if cum >= rank:
            return b
    raise ValueError(f"rank {rank} exceeds histogram mass {cum}")


def grouped_daily_histogram(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    n_bins: int,
    span_cents: int,
) -> DataFrame:
    """Per-(group, day, bin) counts -- the stored daily sketch of a
    GROUPED quantile dashboard (one histogram per key, e.g. per event
    type or per tenant).  <= n_bins rows per (group, day); the same
    addition algebra, so any window's per-group quantile merges from
    stored rows without rescanning events."""
    return (
        df.select(
            F.col(group_col).alias("g"),
            F.col(ts_col).cast("date").alias("day"),
            cents_bin(F.col(value_col), n_bins, span_cents).alias("bin"),
        )
        .groupBy("g", "day", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_grouped_histograms(daily: DataFrame) -> DataFrame:
    """Roll stored per-(group, day) sketches up to one histogram per
    group: integer addition per (g, bin)."""
    return daily.groupBy("g", "bin").agg(
        F.sum("n").cast("bigint").alias("n")
    )
