"""Streaming span-dedup admission: each micro-batch is masked against
every document seen before it, then folds its own grams into the index.

The streaming twin of the batch incremental span dedup
(operators/spandedup.py::mask_duplicated_spans_incremental), with the
same catalog-as-state design as dedup_admission.py: cross-batch state
is two append-only tables --

  {prefix}_grams     (gram_key, doc_freq) partial counts, bucketed by
                     gram_key; the LOGICAL count is SUM(doc_freq) per
                     key (read_gram_counts), so a batch admission is a
                     cheap bucketed APPEND of batch-sized rows, never
                     an index rewrite.  Periodic compaction = the batch
                     materialize_gram_index over the same layout.
  {prefix}_spandocs  (doc_id) admitted ids -- the replay ledger.

Replay idempotence (at-least-once delivery): a replayed batch's docs
are already in {prefix}_spandocs, so their grams are NOT re-appended --
and because their first attempt already pushed their counts into the
index, the masking pass SUBTRACTS the replayed docs' own per-gram
contribution before testing the >= min_docs rule.  Batch content is
identical on replay (same source offsets), so the subtraction exactly
recovers the pre-append corpus and the masked output converges
bit-for-bit; the per-batch output directory is written with overwrite,
so a replay replaces rather than duplicates.

Scale notes: per batch the exchanges are batch-sized (the batch's gram
keys + one join against the bucketed index layout); the span merge and
masking touch only batch documents.  The index grows by
O(batch distinct grams) rows per batch -- compaction folds them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import release_tracked
from ..operators.spandedup import (
    MIN_DOCS,
    N_GRAM,
    mask_duplicated_spans_incremental,
    ngram_positions,
)


def init_span_index(
    spark: SparkSession, prefix: str, n_buckets: int = 32
) -> None:
    """Create the (empty) gram-count and admitted-doc tables."""
    for name in (f"{prefix}_grams", f"{prefix}_spandocs"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    empty_grams = spark.createDataFrame(
        [], "gram_key long, doc_freq long"
    )
    (
        empty_grams.write.bucketBy(n_buckets, "gram_key")
        .sortBy("gram_key")
        .format("parquet")
        .saveAsTable(f"{prefix}_grams")
    )
    spark.createDataFrame([], "doc_id long").write.format(
        "parquet"
    ).saveAsTable(f"{prefix}_spandocs")


def _n_buckets(spark: SparkSession, prefix: str) -> int:
    """Bucket count of the existing index table (appends must match)."""
    for row in spark.sql(
        f"DESCRIBE EXTENDED {prefix}_grams"
    ).collect():
        if row.col_name == "Num Buckets":
            return int(row.data_type)
    return 32


def read_gram_counts(spark: SparkSession, prefix: str) -> DataFrame:
    """Logical (gram_key, doc_freq) view over the append-only partial
    counts."""
    return (
        spark.table(f"{prefix}_grams")
        .groupBy("gram_key")
        .agg(F.sum("doc_freq").alias("doc_freq"))
    )


def admit_span_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_GRAM,
    min_docs: int = MIN_DOCS,
) -> DataFrame:
    """One admission round: mask the batch against (corpus + batch)
    duplication, append the FRESH docs' gram counts and ids, return the
    masked report for the whole batch.  Replay-stable (see module
    docstring)."""
    admitted_ids = spark.table(f"{prefix}_spandocs").select(
        F.col("doc_id")
    )
    fresh = batch_df.join(
        admitted_ids,
        batch_df[id_col] == admitted_ids["doc_id"],
        "left_anti",
    ).localCheckpoint(eager=True)
    replayed = batch_df.join(
        fresh.select(F.col(id_col).alias("__f")),
        batch_df[id_col] == F.col("__f"),
        "left_anti",
    )

    # stored counts minus the replayed docs' own contribution: exactly
    # the corpus as it stood before this batch's first attempt
    replayed_contrib = (
        ngram_positions(replayed, text_col, id_col, n)
        .groupBy("gram_key")
        .agg(F.countDistinct("doc_id").alias("__replayed"))
    )
    corpus_counts = (
        read_gram_counts(spark, prefix)
        .join(replayed_contrib, "gram_key", "left")
        .select(
            "gram_key",
            (
                F.col("doc_freq")
                - F.coalesce(F.col("__replayed"), F.lit(0))
            ).alias("doc_freq"),
        )
    )
    masked = mask_duplicated_spans_incremental(
        corpus=None,
        delta=batch_df,
        text_col=text_col,
        id_col=id_col,
        n=n,
        min_docs=min_docs,
        corpus_gram_counts=corpus_counts,
    ).localCheckpoint(eager=True)

    fresh_counts = (
        ngram_positions(fresh, text_col, id_col, n)
        .groupBy("gram_key")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
    )
    (
        fresh_counts.write.mode("append")
        .bucketBy(_n_buckets(spark, prefix), "gram_key")
        .sortBy("gram_key")
        .format("parquet")
        .saveAsTable(f"{prefix}_grams")
    )
    fresh.select(F.col(id_col).alias("doc_id")).write.mode(
        "append"
    ).format("parquet").saveAsTable(f"{prefix}_spandocs")
    return masked


def span_admission_applier(
    spark: SparkSession,
    prefix: str,
    masked_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch hook: mask the micro-batch against everything seen
    so far and write the report to `{masked_dir}/batch_id=N` (overwrite
    -- replays converge)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        try:
            masked = admit_span_batch(
                spark, batch_df, prefix, id_col=id_col, text_col=text_col
            )
            masked.write.mode("overwrite").parquet(
                f"{masked_dir}/batch_id={batch_id}"
            )
        finally:
            release_tracked()

    return _apply
