"""Streaming bigram-LM admission: each micro-batch's token counts are
folded into the stored language model, then the batch is scored against
the post-admission model.

The streaming twin of the batch incremental LM maintenance
(operators/ngram_lm.py::append_to_bigram_lm, certified append==retrain
by the `bigram_lm_incremental` oracle), with the same catalog-as-state
design as span_admission.py: cross-batch state is three tables --

  {prefix}_uni     (w1, c1, batch_token) partial unigram counts,
                   bucketed by w1; the LOGICAL count is SUM(c1) per
                   word (read_lm_counts), so a batch admission is a
                   cheap bucketed APPEND of batch-vocabulary-sized
                   rows, never a model rewrite.
  {prefix}_bi      (w1, w2, c12, batch_token) partial bigram counts,
                   same discipline, bucketed by w1 (the scoring join
                   key).
  {prefix}_lmdocs  (doc_id) admitted ids -- the replay ledger.

Replay idempotence (at-least-once delivery): a replayed batch's docs
are already in {prefix}_lmdocs, so their counts are NOT re-appended;
the model state after a replay is bit-identical to the state after the
first attempt, so the (deterministic) scoring pass converges too.

Crash atomicity (three appends cannot be one transaction): each batch
derives a deterministic ``batch_token`` (foreachBatch's batch_id, else
a content hash of the batch's doc-id set -- identical on replay) and
BOTH count tables carry it.  A parquet saveAsTable append is job-atomic
(the committer publishes all files or none), so a token's presence in a
count table is a per-table commit marker.  Appends run uni -> bi ->
ledger; on replay each count table is appended ONLY if it lacks the
token, and the ledger (written last) is completed.  Every crash window
therefore heals without double-counting:

  crash before any append   -> replays as a plain fresh batch
  crash after uni only      -> replay appends bi + ledger
  crash after uni + bi      -> replay appends only the ledger

Unlike span admission there is no subtraction step: scoring is defined
against the post-admission model (the batch's own counts ALWAYS
participate, exactly like the self-trained `bigram_lm_familiarity`
form), so the target state is the same whether the counts landed on
this attempt or a previous one.

Scale notes: per batch the exchanges are batch-sized (the batch's
token/bigram keys grouped, then joined against the w1-bucketed model
layout); the model grows by O(batch new vocabulary) rows per batch and
stays vocabulary-sized -- megabytes against a 100 TB corpus -- while
the corpus itself is never re-read.  Periodic compaction = re-grouping
the partials over the same bucketed layout (only safe when no batches
are in flight, or it must preserve the distinct batch_token set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import release_tracked
from ..operators.ngram_lm import (
    score_documents_against_lm,
    train_bigram_lm,
)
from .admission import (
    batch_content_token,
    refresh_state_tables,
    token_committed as _token_committed,
)


def init_lm_index(
    spark: SparkSession, prefix: str, n_buckets: int = 16
) -> None:
    """Create the (empty) count tables and admitted-doc ledger.
    Idempotent across sessions sharing a warehouse dir (orphaned
    leftover locations are cleared like write_bucketed does)."""
    from ..sinks.bucketing import _clear_orphan_location

    for name in (f"{prefix}_uni", f"{prefix}_bi", f"{prefix}_lmdocs"):
        _clear_orphan_location(spark, name)
    empty_uni = spark.createDataFrame(
        [], "w1 string, c1 long, batch_token long"
    )
    (
        empty_uni.write.bucketBy(n_buckets, "w1")
        .sortBy("w1")
        .format("parquet")
        .saveAsTable(f"{prefix}_uni")
    )
    empty_bi = spark.createDataFrame(
        [], "w1 string, w2 string, c12 long, batch_token long"
    )
    (
        empty_bi.write.bucketBy(n_buckets, "w1")
        .sortBy("w1")
        .format("parquet")
        .saveAsTable(f"{prefix}_bi")
    )
    spark.createDataFrame([], "doc_id long").write.format(
        "parquet"
    ).saveAsTable(f"{prefix}_lmdocs")


def _n_buckets(spark: SparkSession, prefix: str) -> int:
    """Bucket count of the existing model tables (appends must match)."""
    for row in spark.sql(f"DESCRIBE EXTENDED {prefix}_uni").collect():
        if row.col_name == "Num Buckets":
            return int(row.data_type)
    return 16


def read_lm_counts(
    spark: SparkSession, prefix: str
) -> tuple[DataFrame, DataFrame]:
    """Logical (unigrams(w1, c1), bigram_counts(w1, w2, c12)) views
    over the append-only partial counts."""
    uni = (
        spark.table(f"{prefix}_uni")
        .filter(F.col("w1").isNotNull())
        .groupBy("w1")
        .agg(F.sum("c1").alias("c1"))
    )
    bi = (
        spark.table(f"{prefix}_bi")
        .filter(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("c12").alias("c12"))
    )
    return uni, bi


def compact_lm_index(spark: SparkSession, prefix: str) -> dict:
    """Fold the append-only count partials into one row per key.  The
    distinct batch_token set MUST survive compaction in EACH table --
    tokens are the per-table commit markers that make replayed/crashed
    batches heal instead of double-counting -- so each token is
    retained as a marker row (w1 NULL, zero count; a split() token is
    never NULL, and read_lm_counts filters the markers out).  Only safe
    when no batches are in flight (caller contract).  Returns
    {'rows_before', 'rows_after'} summed over both tables."""
    n_buckets = _n_buckets(spark, prefix)
    rows_before = rows_after = 0
    for name, keys, cnt in (
        (f"{prefix}_uni", ["w1"], "c1"),
        (f"{prefix}_bi", ["w1", "w2"], "c12"),
    ):
        t = spark.table(name)
        rows_before += t.count()
        folded = (
            t.filter(F.col("w1").isNotNull())
            .groupBy(*keys)
            .agg(F.sum(cnt).alias(cnt))
            .withColumn("batch_token", F.lit(None).cast("long"))
        )
        markers = (
            t.select("batch_token")
            .filter(F.col("batch_token").isNotNull())
            .distinct()
        )
        for k in keys:
            markers = markers.withColumn(k, F.lit(None).cast("string"))
        markers = markers.withColumn(cnt, F.lit(0).cast("long")).select(
            *keys, cnt, "batch_token"
        )
        compacted = folded.unionByName(markers).localCheckpoint(
            eager=True
        )
        (
            compacted.write.mode("overwrite")
            .bucketBy(n_buckets, "w1")
            .sortBy("w1")
            .format("parquet")
            .saveAsTable(name)
        )
        rows_after += compacted.count()
    refresh_state_tables(spark, f"{prefix}_uni", f"{prefix}_bi")
    return {"rows_before": rows_before, "rows_after": rows_after}


def admit_lm_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_token: int | None = None,
) -> DataFrame:
    """One admission round: fold the FRESH docs' counts into the model
    (per-table commit markers make the three appends crash-safe, see
    module docstring), then score the whole batch against the
    post-admission model.  Replay-stable: a replayed batch appends
    nothing and rescoring the unchanged model reproduces the output
    bit-for-bit."""
    state_tables = (f"{prefix}_uni", f"{prefix}_bi", f"{prefix}_lmdocs")
    refresh_state_tables(spark, *state_tables)
    if batch_token is None:
        batch_token = batch_content_token(batch_df, id_col=id_col)
    admitted_ids = spark.table(f"{prefix}_lmdocs").select("doc_id")
    # pin fresh before the ledger (a table this function appends to)
    # is touched -- same discipline as span_admission / search-index
    # appends
    fresh = batch_df.join(
        admitted_ids,
        batch_df[id_col] == admitted_ids["doc_id"],
        "left_anti",
    ).localCheckpoint(eager=True)

    if fresh.limit(1).count() > 0:
        d_uni, d_bi = train_bigram_lm(fresh, text_col)
        n_buckets = _n_buckets(spark, prefix)
        if not _token_committed(spark, f"{prefix}_uni", batch_token):
            (
                d_uni.withColumn("batch_token", F.lit(batch_token))
                .write.mode("append")
                .bucketBy(n_buckets, "w1")
                .sortBy("w1")
                .format("parquet")
                .saveAsTable(f"{prefix}_uni")
            )
        if not _token_committed(spark, f"{prefix}_bi", batch_token):
            (
                d_bi.withColumn("batch_token", F.lit(batch_token))
                .write.mode("append")
                .bucketBy(n_buckets, "w1")
                .sortBy("w1")
                .format("parquet")
                .saveAsTable(f"{prefix}_bi")
            )
        fresh.select(F.col(id_col).alias("doc_id")).write.mode(
            "append"
        ).format("parquet").saveAsTable(f"{prefix}_lmdocs")
        # scoring below re-reads the count tables this batch just
        # appended to -- under foreachBatch the implicit refresh landed
        # on the cloned session, so refresh the outer one explicitly
        refresh_state_tables(spark, *state_tables)

    uni, bi = read_lm_counts(spark, prefix)
    return score_documents_against_lm(
        batch_df, uni, bi, text_col=text_col, id_col=id_col
    )


def lm_admission_applier(
    spark: SparkSession,
    prefix: str,
    scored_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch hook: admit the micro-batch's counts and write its
    familiarity report to `{scored_dir}/batch_id=N` (overwrite --
    replays converge)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        try:
            # stream batch ids are stable across replays of the same
            # offsets; offset them past the 62-bit content-token range
            # so mixed direct/stream use of one model cannot collide
            scored = admit_lm_batch(
                spark,
                batch_df,
                prefix,
                id_col=id_col,
                text_col=text_col,
                batch_token=(1 << 62) + batch_id,
            )
            scored.write.mode("overwrite").parquet(
                f"{scored_dir}/batch_id={batch_id}"
            )
        finally:
            release_tracked()

    return _apply
