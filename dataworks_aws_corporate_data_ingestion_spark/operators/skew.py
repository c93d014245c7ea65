"""Explicit skew-handling operators.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
joins at runtime, but two shapes still need explicit treatment at
100 TB:

  * joins against a replicable side when the big side's keys are so hot
    that even a split partition overwhelms one task -> salted_join
    replicates the small side N ways and fans the big side out over the
    replicas, bounding any single task at 1/N of the hottest key;
  * COUNT(DISTINCT x) GROUP BY k on hot keys -> the single-shuffle plan
    sends every (k, x) pair of a hot key to one task; the two-phase form
    dedups on (k, x) first, so the second shuffle carries only distinct
    pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    big_salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-prone big side against a replicable small side.

    The big side gets a deterministic salt in [0, salt_buckets) hashed
    from `big_salt_src` (any well-distributed big-side column, e.g. its
    primary key; defaults to the first non-join column).  The small side
    is exploded once per bucket.  The join key becomes (on..., salt), so
    each hot key's rows spread over `salt_buckets` tasks instead of one.

    Cost: the small side is shuffled/broadcast salt_buckets times --
    size the bucket count to the skew, not to taste.  Results are
    identical to the unsalted join (each big row matches exactly the one
    replica carrying its salt).
    """
    if big_salt_src is None:
        big_salt_src = next(c for c in big.columns if c not in on)
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(big_salt_src)), F.lit(salt_buckets))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_big.join(salted_small, on + ["__salt"], how)
    return out.drop("__salt")


def distinct_count_twophase(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT value) GROUP BY keys, skew-safely.

    Phase 1 groups by (keys, value) -- the value spreads a hot key over
    the whole cluster and map-side partial aggregation collapses repeats
    before the shuffle.  Phase 2 counts the surviving distinct pairs per
    key.  Same result as countDistinct, bounded per-task fan-in.
    """
    value_col = F.col(value) if isinstance(value, str) else value
    return (
        df.select(*keys, value_col.alias("__v"))
        .groupBy(*keys, "__v")
        .agg(F.lit(1).alias("__one"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
