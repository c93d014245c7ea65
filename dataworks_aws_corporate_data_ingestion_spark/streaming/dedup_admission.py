"""Streaming dedup admission: each micro-batch is checked against the
materialised minhash index, survivors are admitted AND indexed, so later
batches dedup against everything admitted before them.

This is the streaming twin of the batch incremental dedup
(operators/dedup.py::near_dup_pairs_against_index): the index tables are
the cross-batch state, living in the catalog rather than in stream
state -- they survive restarts, are queryable mid-stream, and grow by
append (bucketed layout preserved), which is exactly how a production
corpus admission gate runs (the reference's daily cadence, tightened to
micro-batches).

Admission policy per batch:
  * a batch doc near-dup of an ALREADY-INDEXED doc is rejected;
  * within a batch, near-dup groups keep the smallest id (the same
    representative rule as the batch curation collapse);
  * survivors append to the index inside the same foreachBatch call, so
    the check-then-append pair is ordered per batch (foreachBatch runs
    batches sequentially).

Scale notes: per batch the cost is the incremental shape -- candidates
scale with the batch, never the corpus; the index append is a bucketed
write of batch-sized data.  At-least-once caveat: a replayed batch
re-checks against an index that already contains its docs, so its docs
collide with themselves by id-inequality pairs -- the `a < b` keep-min
rule makes the replay a no-op for survivors (their smaller ids are
already present), which is the idempotence a foreachBatch sink needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    append_to_minhash_index,
    near_dup_pairs_against_index,
)


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
) -> DataFrame:
    """One admission round: returns the admitted rows (all batch columns)
    and appends them to the index.  Pure function of (batch, index
    state); used directly by tests and wrapped by the foreachBatch
    applier."""
    pairs = near_dup_pairs_against_index(
        spark, batch_df, prefix, id_col=id_col, text_col=text_col,
        threshold=threshold,
    )
    batch_ids = batch_df.select(F.col(id_col).alias("x"))
    links = pairs.select(F.col("a").alias("x"), F.col("b").alias("partner")).unionByName(
        pairs.select(F.col("b").alias("x"), F.col("a").alias("partner"))
    )
    in_batch = links.join(batch_ids, "x")
    partner_is_batch = in_batch.join(
        batch_df.select(F.col(id_col).alias("partner")), "partner", "left_semi"
    )
    partner_is_corpus = in_batch.join(
        batch_df.select(F.col(id_col).alias("partner")), "partner", "left_anti"
    )
    # reject: duplicate of anything indexed, or of a smaller-id batchmate
    rejected = partner_is_corpus.select("x").unionByName(
        partner_is_batch.filter(F.col("partner") < F.col("x")).select("x")
    ).distinct()
    admitted = batch_df.join(
        rejected.select(F.col("x").alias(id_col)), id_col, "left_anti"
    )
    append_to_minhash_index(
        spark, admitted, prefix, id_col=id_col, text_col=text_col
    )
    return admitted


def dedup_admission_applier(
    spark: SparkSession,
    prefix: str,
    admitted_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
):
    """foreachBatch hook: admit the micro-batch against the index and
    append survivors to `admitted_dir` (parquet)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        admitted = admit_batch(
            spark, batch_df, prefix, id_col=id_col, text_col=text_col,
            threshold=threshold,
        )
        admitted.write.mode("append").parquet(admitted_dir)

    return _apply
