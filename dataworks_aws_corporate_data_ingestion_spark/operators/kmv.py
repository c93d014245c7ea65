"""KMV (bottom-k / k-minimum-values) distinct sketches: cardinality,
union, and -- the thing HLL cannot do -- INTERSECTION estimation.

The 100 TB problem: "how many distinct shingles do corpus A and corpus
B share" is an exact distinct-intersection -- two full distinct
shuffles plus a join on the full key space.  The KMV sketch (Bar-Yossef
et al. 2002; the Theta-sketch family's core) keeps only the k smallest
hash values of each set:

* cardinality: if the k-th smallest of n uniform hashes in [0, M) is
  U_k, then n ~ (k-1) * M / U_k (the classic KMV estimator, rsd ~
  1/sqrt(k-2));
* union: the k smallest of (sig_A UNION sig_B) is exactly the KMV
  signature of A UNION B -- signatures are losslessly mergeable, like
  the HLL rollup (workloads/sketches.py);
* intersection/Jaccard: within the union's bottom-k, the fraction of
  values present in BOTH input signatures is an unbiased Jaccard
  estimate (each bottom-k hash is a uniform sample of A UNION B), and
  |A intersect B| ~ J_est * |A union B|_est.

Hashes are seeded xxhash64 (JVM-side, whole-stage codegen) shifted to
unsigned [0, 2^64) DECIMAL(20,0) so the order statistics and the
estimator arithmetic are exact integers until the single final
division.  Signatures are k rows per set -- kilobytes -- so N daily /
per-source signatures can be stored and cross-intersected without ever
rescanning the corpora, the same mergeable-state contract as the HLL
rollup certificate.

Degenerate exactness: when a set has fewer than k distinct elements its
signature IS the set (est = |sig|, exact), and when the union signature
is under k the Jaccard estimate is exact -- small inputs degrade to
exact answers rather than noisy ones.

Correctness-gate pattern: a sketch cannot hash-match a DuckDB oracle,
so registry entries certify integer-exact CLAIMS about the error
envelope beside exact twins (workloads/approx_exact.py::
corpus_overlap_kmv_certificate), cf. approx_distinct_certificate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_signature",
    "kmv_estimate",
    "kmv_union_jaccard",
    "materialize_kmv_signatures",
    "append_to_kmv_signatures",
    "load_kmv_signatures",
]

# hash domain: xxhash64 shifted to [0, 2^64)
_M = 2**64
_OFFSET = 2**63


def _uhash(col) -> F.Column:
    """Unsigned 64-bit hash as DECIMAL(20,0): exact order statistics,
    no float rounding, no BIGINT sign wrap."""
    # 2^63 exceeds the long literal range; route it in as a decimal string
    return F.xxhash64(col).cast("decimal(20,0)") + F.expr(
        f"CAST('{_OFFSET}' AS DECIMAL(20,0))"
    )


def kmv_signature(
    df: DataFrame, set_col: str, elem_col: str, k: int
) -> DataFrame:
    """Per-set bottom-k signature: the k smallest distinct element
    hashes, as rows (set_col, h DECIMAL(20,0)).

    Plan shape: project-to-hash (scan stage) -> distinct on (set, h)
    (the shuffle carries 8-byte hashes, never the elements themselves)
    -> per-set window rank <= k.  Output is <= k rows per set no matter
    the corpus size; at true scale the distinct can be pre-pruned
    per-partition with a bounded heap exactly like
    operators/heavyhitters.py prunes counters -- the final window then
    sees <= k * n_partitions rows per set."""
    hashed = df.select(
        F.col(set_col).alias("set_id"), _uhash(F.col(elem_col)).alias("h")
    ).distinct()
    w = Window.partitionBy("set_id").orderBy(F.col("h").asc())
    return (
        hashed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_estimate(sig: DataFrame, k: int) -> DataFrame:
    """Distinct-cardinality estimate per set from a bottom-k signature:
    (k-1) * 2^64 / U_k when the signature is full, else the exact
    signature size.  Returns (set_id, n_est double, n_sig bigint)."""
    agg = sig.groupBy("set_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sig"),
        F.max("h").alias("u_k"),
    )
    return agg.select(
        "set_id",
        "n_sig",
        F.when(F.col("n_sig") < k, F.col("n_sig").cast("double"))
        .otherwise(
            (k - 1)
            * F.lit(float(_M))
            / F.col("u_k").cast("double")
        )
        .alias("n_est"),
    )


def kmv_union_jaccard(
    sig_a: DataFrame, sig_b: DataFrame, k: int
) -> DataFrame:
    """Union-cardinality and Jaccard estimates from two signatures
    (ignores their set_id columns; treats each input as one set).

    The k smallest of sig_A UNION sig_B form the union's own KMV
    signature; within it, hashes present in both inputs are a uniform
    sample of the union, so their fraction estimates J.  Returns one
    row: (n_union_sig bigint, union_est double, j_num bigint, j_den
    bigint) -- j_num/j_den is the Jaccard estimate with EXACT integer
    numerator and denominator, so certificates can cross-multiply
    instead of comparing floats."""
    a = sig_a.select("h").withColumn("in_a", F.lit(1))
    b = sig_b.select("h").withColumn("in_b", F.lit(1))
    merged = a.join(b, "h", "full_outer").select(
        "h",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    w = Window.orderBy(F.col("h").asc())
    bottom = (
        merged.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
    agg = bottom.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_sig"),
        F.max("h").alias("u_k"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("j_num"),
    )
    return agg.select(
        "n_union_sig",
        F.when(F.col("n_union_sig") < k, F.col("n_union_sig").cast("double"))
        .otherwise((k - 1) * F.lit(float(_M)) / F.col("u_k").cast("double"))
        .alias("union_est"),
        "j_num",
        F.col("n_union_sig").alias("j_den"),
    )


# ---------------------------------------------------------------------------
# Stored KMV signatures: per-set bottom-k sketches as a catalog artifact
# with append maintenance.  The k smallest of (signature UNION delta
# hashes) IS the signature of (set UNION delta) -- losslessly mergeable
# (pinned by tests/test_kmv.py::test_merge_is_lossless) -- so appending
# a day's / a source's new elements is bit-identical to rebuilding over
# the full history, the same append==rebuild contract the stored bloom
# index proves word-for-word.  The table is append-only partial rows
# (set_id, h); the logical signature is the k smallest distinct h per
# set at load, so replayed appends are idempotent (distinct) and
# crashed appends heal without markers -- the MIN-algebra, like the
# bloom's OR, is itself the recovery mechanism.
# ---------------------------------------------------------------------------


def materialize_kmv_signatures(
    spark,
    df: DataFrame,
    set_col: str,
    elem_col: str,
    prefix: str,
    k: int = 512,
) -> None:
    """Write per-set bottom-k signatures + the k parameter as catalog
    tables ({prefix}_kmv: set_id/h partials; {prefix}_kmvmeta: k)."""
    from ..sinks.bucketing import _clear_orphan_location

    for name in (f"{prefix}_kmv", f"{prefix}_kmvmeta"):
        _clear_orphan_location(spark, name)
    sig = kmv_signature(df, set_col, elem_col, k)
    sig.write.format("parquet").saveAsTable(f"{prefix}_kmv")
    spark.createDataFrame([(k,)], "k long").write.format(
        "parquet"
    ).saveAsTable(f"{prefix}_kmvmeta")


def append_to_kmv_signatures(
    spark, delta: DataFrame, set_col: str, elem_col: str, prefix: str
) -> None:
    """Fold a delta's elements into the stored signatures by APPENDING
    the delta's own bottom-k rows -- history is never rewritten; the
    k-smallest-distinct fold at load makes the result bit-identical to
    a rebuild over the union, and a replayed append a no-op."""
    k = int(spark.table(f"{prefix}_kmvmeta").collect()[0]["k"])
    sig = kmv_signature(delta, set_col, elem_col, k)
    sig.write.mode("append").format("parquet").saveAsTable(f"{prefix}_kmv")


def load_kmv_signatures(spark, prefix: str) -> tuple[DataFrame, int]:
    """Logical signatures: k smallest distinct hashes per set over the
    append-only partials.  Returns (signature df (set_id, h), k)."""
    k = int(spark.table(f"{prefix}_kmvmeta").collect()[0]["k"])
    t = spark.table(f"{prefix}_kmv").select("set_id", "h").distinct()
    w = Window.partitionBy("set_id").orderBy(F.col("h").asc())
    sig = (
        t.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
    return sig, k
