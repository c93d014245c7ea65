"""Deterministic hash-based sampling and dataset splits.

Training pipelines need samples and train/val/test assignments that are
(a) stable across runs and cluster layouts, (b) derivable per row with no
shuffle, and (c) reproducible by other engines auditing the dataset.
Seeded `df.sample` gives none of these (it is partition-layout
dependent); hashing row identity does: a row's fate is a pure function
of its key.  md5 is used (not xxhash) because every engine an auditor
might hold has it, and bucket membership compares hex PREFIX STRINGS --
no hex-to-int conversion, which SQL dialects disagree on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_prefix(key: Column, salt: str = "") -> Column:
    """First 4 hex chars of md5(salt || key): 65536 uniform buckets."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary")), 1, 4
    )


def deterministic_sample(
    df: DataFrame,
    key: str | Column,
    fraction_num: int,
    fraction_den: int = 65536,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash bucket falls below fraction_num/fraction_den.

    The comparison is on the 4-hex-char prefix string, so the kept set is
    identical in any engine that can compute md5 of the same bytes."""
    key_col = F.col(key) if isinstance(key, str) else key
    threshold = format(fraction_num, "04x")
    return df.filter(_hash_prefix(key_col, salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    key: str | Column,
    stratum: str,
    fractions: dict[str, int],
    default_num: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction (numerator over 65536), strata not listed keep
    ``default_num``.  The corpus-rebalancing primitive -- downweight an
    over-represented source, keep a rare one whole -- with the same
    audit-friendly guarantee as deterministic_sample: a row's fate is a
    pure function of (salt, key), independent of partitioning, engine,
    or dataset growth.

    Scale notes: one per-row hash + CASE compare inside the scan stage;
    no shuffle, no per-stratum passes, no driver-side stratum loop --
    the fraction map compiles into a single CASE expression."""
    key_col = F.col(key) if isinstance(key, str) else key
    threshold: Column = F.lit(format(default_num, "04x"))
    for value, num in sorted(fractions.items()):
        threshold = F.when(
            F.col(stratum) == F.lit(value), F.lit(format(num, "04x"))
        ).otherwise(threshold)
    return df.filter(_hash_prefix(key_col, salt) < threshold)


def token_budget_mixture(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int,
    key: str = "doc_id",
    stratum: str = "source",
    tokens_col: str = "n_tokens",
    salt: str = "mix",
) -> DataFrame:
    """Data mixing: sample each source down to a TOKEN budget -- the
    mixture-weighting step of training-corpus assembly ("this much web,
    this much code"), expressed as deterministic per-row sampling whose
    RATE is computed from the data.

    Per stratum: rate = budget_tokens / total_tokens (capped at 1),
    materialised as an integer threshold (budget * 65536) div total over
    the md5 bucket space -- ALL integer arithmetic on exact bigint token
    sums, so any engine recomputes the identical kept set (the

    threshold's hex form compares against the row's md5 prefix exactly
    like deterministic_sample).  Over-budget sources shrink, under-budget
    sources pass through whole.

    Scale notes: one per-stratum aggregate (tiny result, broadcast
    back), then a per-row hash filter in the scan stage -- no
    corpus-sized shuffle, no per-source passes.  Expected kept tokens
    per source = budget +/- sampling noise; exact budgets need a
    per-source pack/truncate pass downstream."""
    totals = docs.groupBy(stratum).agg(
        F.sum(F.col(tokens_col)).cast("bigint").alias("__toks")
    )
    budget: Column = F.lit(default_budget).cast("bigint")
    for value, b in sorted(budgets.items()):
        budget = F.when(
            F.col(stratum) == F.lit(value), F.lit(b).cast("bigint")
        ).otherwise(budget)
    rates = totals.withColumn("__budget", budget).withColumn(
        "__thr", F.expr("(__budget * 65536) div __toks")
    )
    joined = docs.join(F.broadcast(rates.select(stratum, "__thr")), stratum)
    keep = (F.col("__thr") >= F.lit(65536)) | (
        _hash_prefix(F.col(key) if isinstance(key, str) else key, salt)
        < F.lpad(F.lower(F.hex(F.col("__thr"))), 4, "0")
    )
    return joined.filter(keep).drop("__thr")


def assign_split(
    df: DataFrame,
    key: str | Column,
    val_per_64k: int = 3277,  # ~5%
    test_per_64k: int = 3277,  # ~5%
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Stable train/val/test assignment from row identity: the first
    val_per_64k buckets -> 'val', the next test_per_64k -> 'test', the
    rest 'train'.  Membership never changes as the dataset grows -- a
    row's split is a pure function of its key, the property that keeps
    eval sets uncontaminated across dataset versions."""
    key_col = F.col(key) if isinstance(key, str) else key
    h = _hash_prefix(key_col, salt)
    val_hi = format(val_per_64k, "04x")
    test_hi = format(val_per_64k + test_per_64k, "04x")
    return df.withColumn(
        out_col,
        F.when(h < F.lit(val_hi), F.lit("val"))
        .when(h < F.lit(test_hi), F.lit("test"))
        .otherwise(F.lit("train")),
    )


def length_weighted_sample(
    df: DataFrame,
    key: str | Column,
    weight_col: str,
    full_weight: int,
    salt: str = "lw",
) -> DataFrame:
    """PER-ROW weighted sampling: keep probability = weight/full_weight,
    capped at 1 (rows at or above full_weight always kept).  The row's
    weight becomes an exact integer threshold in the md5 bucket space
    ((weight * 65536) div full_weight), so membership is a pure function
    of (salt, key, weight) any engine recomputes -- the
    downweight-short-junk move where per-stratum rates are too blunt.

    Scale notes: one per-row hash + integer compare in the scan stage;
    no shuffle, no aggregate (the weight is row-local, unlike
    token_budget_mixture's corpus-derived rates).  The 65536 product
    must stay under 2^63: cap weights upstream if they can exceed
    full_weight by more than ~2^47."""
    key_col = F.col(key) if isinstance(key, str) else key
    # cast BEFORE multiplying: on a 32-bit int weight column the *65536
    # product would silently wrap (non-ANSI) for weights > 32767, turning
    # the threshold into a garbage negative-hex prefix
    thr = F.lpad(
        F.lower(
            F.hex(F.expr(f"(CAST({weight_col} AS BIGINT) * 65536) div {full_weight}"))
        ),
        4,
        "0",
    )
    keep = (F.col(weight_col) >= full_weight) | (
        _hash_prefix(key_col, salt) < thr
    )
    return df.filter(keep)
