"""Deterministic sampling, dataset-split, and sequence-packing workload
(training-data ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.packing import pack_sequences
from ..operators.sampling import assign_split, deterministic_sample
from ..sources.tables import load_table
from ..workload import register

# ~10%: buckets 0000..1999 hex of 65536
_SAMPLE_NUM = 0x1A00


@register(
    "documents_deterministic_sample",
    tags=("sampling", "training-data"),
    oracle=f"""
        SELECT doc_id, source, n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_SAMPLE_NUM:04x}'
    """,
)
def documents_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% document sample by content-key hash: stable across runs,
    partition layouts, and engines (the oracle IS another engine
    recomputing membership).  Contrast df.sample: partition-layout
    dependent, unauditable.

    Scale notes: a pure per-row filter -- no shuffle, pushes nothing but
    md5 work into the scan stage, trivially parallel at any size."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    return deterministic_sample(d, "doc_id", _SAMPLE_NUM)


@register(
    "dataset_split_stats",
    tags=("sampling", "training-data", "aggregation"),
    oracle="""
        SELECT
            CASE
                WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < '0ccd'
                    THEN 'val'
                WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
                    THEN 'test'
                ELSE 'train'
            END AS split,
            COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
)
def dataset_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment (~90/5/5) from salted row-identity
    hash, with per-split size stats.  A row's split never changes as the
    corpus grows -- the anti-leak property for persistent eval sets."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    return (
        assign_split(d, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "packed_training_sequences",
    tags=("packing", "training-data", "applyInPandas", "non-sql"),
)
def packed_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 512-token training sequences via bucketed
    first-fit-decreasing (operators/packing.py).  No SQL oracle --
    ordering-dependent greedy packing is not relational; pytest pins the
    invariants (every doc exactly once, no pack over budget,
    determinism).

    The operator API returns doc_ids as array<bigint>; the registered
    surface serialises it to a JSON string so the driver's canonicaliser
    (pandas sort over object columns) can hash it."""
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(d, budget=512, residual_threshold=0.85)
    return packed.withColumn("doc_ids", F.to_json("doc_ids")).drop("doc_tokens")


@register(
    "documents_stratified_sample",
    tags=("sampling", "stratified", "training-data"),
    oracle="""
        SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE source
                  WHEN 'src0' THEN 'e000'
                  WHEN 'src1' THEN '8000'
                  ELSE '4000'
              END
    """,
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing via per-stratum deterministic sampling: src0
    keeps ~87.5%, src1 ~50%, every other source ~25% -- the upweight-rare
    / downweight-common move of dataset curation, decided per row by an
    md5 bucket so any engine can audit membership.

    Scale notes: a single CASE-compare filter inside the scan stage --
    no shuffle, no per-stratum passes (operators/sampling.py)."""
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    return stratified_sample(
        docs,
        key="doc_id",
        stratum="source",
        fractions={"src0": 0xE000, "src1": 0x8000},
        default_num=0x4000,
    )
