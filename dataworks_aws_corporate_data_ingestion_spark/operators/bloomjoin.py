"""Bloom-filter-pruned semi/anti joins with exact verification.

The 100 TB join problem this solves: joining a huge fact side against a
much smaller key set normally shuffles the ENTIRE fact side on the join
key, even though almost none of it matches (semi) or almost all of it
survives (anti).  The bloom path broadcasts a bitset built over the
small side's keys and filters the fact side MAP-SIDE, before any
exchange: bloom-negative rows are *provably* non-matches (a Bloom
filter has no false negatives when both sides use the same hash
family), so only the bloom-positive sliver ever reaches the exact
verification join.  False positives cost nothing but sliver width --
they are removed by the exact join -- so the final result is
bit-identical to the plain semi/anti join, which is what lets a DuckDB
oracle hash-check it.

Spark's own optimizer has a runtime form of this
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, injected bloom on
shuffle-join builds) and `DataFrameStatFunctions.bloomFilter` builds a
driver-side sketch via treeAggregate; this module makes the plan shape
EXPLICIT and testable: the bitset is built as a distributed
`bit_or`-packed aggregate (shuffle cardinality <= m/64 words,
independent of corpus size), shipped to executors as a Spark broadcast,
and probed by a vectorised Arrow-batched pandas UDF over positions
computed JVM-side with seeded xxhash64 -- no row-at-a-time Python, no
JVM round-trips per probe.

Sizing: m_bits ~ 10 bits/key gives ~1% false-positive rate at
n_hashes=5 (optimal h = m/n * ln2 ~ 7; 5 keeps probe cost low).  At
100 TB the ref side is the bounded one (an id blocklist, yesterday's
user set, a benchmark fingerprint universe), so m is a design budget:
1e9 keys -> 10 Gbit -> 1.25 GB broadcast, the documented ceiling; past
that, partition the ref keyspace and run per-partition blooms.

Beyond-parity vs the reference (no joins by design; SURVEY.md section
2.4): this is the scale path under `benchmark_contamination`-style
"huge corpus vs bounded universe" pruning and RTBF id scans.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "BloomFilter",
    "build_bloom",
    "bloom_might_contain",
    "bloom_semi_join",
    "bloom_anti_join",
    "bloom_classify",
    "materialize_bloom_index",
    "append_to_bloom_index",
    "load_bloom_index",
]


@dataclass(frozen=True)
class BloomFilter:
    """Immutable packed bitset + the hash-family parameters that built
    it.  `words` is a little-endian uint64 array of length m_bits/64;
    bit p lives at words[p >> 6] bit (p & 63)."""

    words: np.ndarray
    m_bits: int
    n_hashes: int

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """n_hashes bit positions for a key, computed JVM-side: seeded
    xxhash64 (the seed rides as an extra hashed column, giving an
    independent-enough family), pmod into the table."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).alias(f"__bf_pos_{i}")
        for i in range(n_hashes)
    ]


def build_bloom(
    ref: DataFrame, key: str | Column, m_bits: int = 1 << 20, n_hashes: int = 5
) -> BloomFilter:
    """Build the bitset over `ref`'s keys as a distributed aggregate.

    Plan shape: scan -> explode to n_hashes positions -> map to
    (word_index, single-bit mask) -> groupBy(word).bit_or -> collect.
    The shuffle and the collect are both bounded by m_bits/64 rows no
    matter how large `ref` is; the corpus itself is touched exactly
    once, map-side.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    key_col = F.col(key) if isinstance(key, str) else key
    pos = ref.select(
        F.explode(F.array(*_positions(key_col, m_bits, n_hashes))).alias("pos")
    )
    packed = (
        pos.select(
            F.shiftright("pos", 6).alias("word"),
            # python-API shiftleft requires a literal count; the SQL form
            # accepts a column.
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    for row in packed:
        words[row["word"]] = np.uint64(row["mask"] & 0xFFFFFFFFFFFFFFFF)
    words.setflags(write=False)
    return BloomFilter(words=words, m_bits=m_bits, n_hashes=n_hashes)


def bloom_might_contain(
    df: DataFrame, key: str | Column, bloom: BloomFilter, out_col: str = "__bf_hit"
) -> DataFrame:
    """Annotate `df` with a boolean membership-test column.  FALSE is a
    proof of absence from the ref key set; TRUE is a candidate.

    Positions are computed JVM-side (whole-stage codegen); the probe is
    one Arrow-batched pandas UDF doing vectorised numpy bitset lookups
    against a Spark-broadcast copy of the words array (shipped once per
    executor, not per task)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.words)

    @pandas_udf("boolean")
    def _probe(*pos_cols: pd.Series) -> pd.Series:
        words = bc.value
        hit = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            pv = p.to_numpy(dtype=np.int64)
            hit &= (
                words[pv >> 6] >> (pv & np.int64(63)).astype(np.uint64)
            ).astype(np.uint64) & np.uint64(1) == np.uint64(1)
        return pd.Series(hit)

    key_col = F.col(key) if isinstance(key, str) else key
    return df.withColumn(
        out_col, _probe(*_positions(key_col, bloom.m_bits, bloom.n_hashes))
    )


def bloom_semi_join(
    big: DataFrame,
    ref: DataFrame,
    big_key: str,
    ref_key: str | None = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of `big` whose key exists in `ref` -- bit-identical to
    `big.join(ref, key, "left_semi")`, but only the bloom-positive
    sliver of `big` reaches the exchange; bloom-negatives die in the
    scan stage."""
    ref_key = ref_key or big_key
    bloom = build_bloom(ref, ref_key, m_bits=m_bits, n_hashes=n_hashes)
    cand = (
        bloom_might_contain(big, big_key, bloom)
        .filter(F.col("__bf_hit"))
        .drop("__bf_hit")
    )
    keys = ref.select(F.col(ref_key).alias(big_key)).distinct()
    return cand.join(keys, big_key, "left_semi")


def bloom_anti_join(
    big: DataFrame,
    ref: DataFrame,
    big_key: str,
    ref_key: str | None = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of `big` whose key does NOT exist in `ref` -- bit-identical
    to `big.join(ref, key, "left_anti")`.  Bloom-negative rows pass
    straight through with NO join at all (no false negatives); only the
    bloom-positive sliver pays the exact anti-join that strips the
    false positives back out."""
    ref_key = ref_key or big_key
    bloom = build_bloom(ref, ref_key, m_bits=m_bits, n_hashes=n_hashes)
    flagged = bloom_might_contain(big, big_key, bloom)
    sure_out = flagged.filter(~F.col("__bf_hit")).drop("__bf_hit")
    cand = flagged.filter(F.col("__bf_hit")).drop("__bf_hit")
    keys = ref.select(F.col(ref_key).alias(big_key)).distinct()
    return sure_out.unionByName(cand.join(keys, big_key, "left_anti"))


def bloom_classify(
    big: DataFrame,
    ref: DataFrame,
    big_key: str,
    ref_key: str | None = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    out_col: str = "is_match",
) -> DataFrame:
    """Annotate every row of `big` with an exact boolean: does its key
    exist in `ref`?  One bloom build, one map-side probe, and one
    left join over only the bloom-positive sliver -- strictly cheaper
    than running `bloom_semi_join` and `bloom_anti_join` separately
    (which would build the bitset and probe the corpus twice).
    Bit-identical to the plain left-join EXISTS classification: a NULL
    key is never a match, bloom-negatives are proofs of absence, and
    false positives are stripped by the verify join."""
    ref_key = ref_key or big_key
    bloom = build_bloom(ref, ref_key, m_bits=m_bits, n_hashes=n_hashes)
    flagged = bloom_might_contain(big, big_key, bloom, out_col="__bf_hit")
    sure_out = flagged.filter(~F.col("__bf_hit")).drop("__bf_hit").withColumn(
        out_col, F.lit(False)
    )
    cand = flagged.filter(F.col("__bf_hit")).drop("__bf_hit")
    keys = (
        ref.select(F.col(ref_key).alias(big_key))
        .distinct()
        .withColumn("__bf_ref", F.lit(1))
    )
    verified = cand.join(keys, big_key, "left").withColumn(
        out_col, F.col("__bf_ref").isNotNull()
    ).drop("__bf_ref")
    return sure_out.unionByName(verified)


# ---------------------------------------------------------------------------
# Stored bloom index: the frozen-corpus membership filter as a catalog
# artifact with append maintenance.  Bloom union is bitwise OR, so
# appending a delta's positions is LOSSLESSLY identical to rebuilding
# over the full key set -- the same append==rebuild contract the BM25 /
# minhash / LM indexes certify, here provable bit-for-bit on the words.
# The table is append-only partial rows (word, mask); the logical
# bitset is bit_or per word, so an append never rewrites history and a
# crashed append replays idempotently (OR is idempotent).
# ---------------------------------------------------------------------------


def materialize_bloom_index(
    spark,
    ref: DataFrame,
    key: str | Column,
    prefix: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> None:
    """Write the packed-word bloom rows + parameters as catalog tables
    ({prefix}_bloom: word/mask partials; {prefix}_bloommeta: m_bits,
    n_hashes).  At 100 TB the build touches the corpus once map-side
    and shuffles <= m/64 word rows (build_bloom's plan)."""
    from ..sinks.bucketing import _clear_orphan_location

    for name in (f"{prefix}_bloom", f"{prefix}_bloommeta"):
        _clear_orphan_location(spark, name)
    bf = build_bloom(ref, key, m_bits=m_bits, n_hashes=n_hashes)
    rows = [
        (int(w), int(np.int64(np.uint64(m))))
        for w, m in enumerate(bf.words)
        if m
    ]
    spark.createDataFrame(rows, "word long, mask long").write.format(
        "parquet"
    ).saveAsTable(f"{prefix}_bloom")
    spark.createDataFrame(
        [(m_bits, n_hashes)], "m_bits long, n_hashes long"
    ).write.format("parquet").saveAsTable(f"{prefix}_bloommeta")


def append_to_bloom_index(
    spark, delta: DataFrame, key: str | Column, prefix: str
) -> None:
    """OR a delta key set into the stored filter by APPENDING its
    packed-word partials -- history is never rewritten, the logical
    bitset is bit_or per word at load, and a replayed append is
    idempotent (OR).  Bit-identical to rebuilding over ref UNION delta,
    which is what `cross_corpus_dedup_bloom_indexed` certifies."""
    meta = spark.table(f"{prefix}_bloommeta").collect()[0]
    bf = build_bloom(
        delta, key, m_bits=int(meta["m_bits"]), n_hashes=int(meta["n_hashes"])
    )
    rows = [
        (int(w), int(np.int64(np.uint64(m))))
        for w, m in enumerate(bf.words)
        if m
    ]
    if rows:
        spark.createDataFrame(rows, "word long, mask long").write.mode(
            "append"
        ).format("parquet").saveAsTable(f"{prefix}_bloom")


def load_bloom_index(spark, prefix: str) -> BloomFilter:
    """Fold the stored partials (bit_or per word) into a BloomFilter."""
    meta = spark.table(f"{prefix}_bloommeta").collect()[0]
    m_bits, n_hashes = int(meta["m_bits"]), int(meta["n_hashes"])
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    for r in (
        spark.table(f"{prefix}_bloom")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    ):
        words[r["word"]] = np.uint64(r["mask"] & 0xFFFFFFFFFFFFFFFF)
    words.setflags(write=False)
    return BloomFilter(words=words, m_bits=m_bits, n_hashes=n_hashes)
