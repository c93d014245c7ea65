"""Streaming bloom-dedup admission (streaming/bloom_admission.py):
prefix equality with one-shot first-occurrence dedup, replay no-op,
the bloom-ahead-of-ledger crash window the append order exists for,
and the real foreachBatch surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.streaming.bloom_admission import (
    admit_dedup_batch,
    init_bloom_dedup_index,
    read_admitted_fps,
)

pytestmark = pytest.mark.slow

# fingerprints recur across and within batches; ids are globally unique
BATCHES = [
    [(1, "fA"), (2, "fB"), (3, "fA")],          # within-batch dup (fA)
    [(10, "fB"), (11, "fC"), (12, "fC")],       # cross-batch (fB) + within (fC)
    [(20, "fA"), (21, "fD")],                   # cross-batch (fA)
]
# first-occurrence winners under (batch order, id): 1(fA) 2(fB) 11(fC) 21(fD)
EXPECT = {1, 2, 11, 21}


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, fp string").repartition(2)


def _cleanup(spark, prefix):
    for t in (f"{prefix}_bloom", f"{prefix}_bloommeta", f"{prefix}_fps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestBloomDedupAdmission:
    def test_admission_equals_first_occurrence_dedup(self, spark):
        try:
            init_bloom_dedup_index(spark, "t_bd1", m_bits=1 << 10)
            got = set()
            for rows in BATCHES:
                adm = admit_dedup_batch(spark, _batch_df(spark, rows), "t_bd1")
                got |= {r["doc_id"] for r in adm.collect()}
            assert got == EXPECT
            assert read_admitted_fps(spark, "t_bd1").count() == 4
        finally:
            _cleanup(spark, "t_bd1")

    def test_replay_admits_nothing_and_state_unchanged(self, spark):
        try:
            init_bloom_dedup_index(spark, "t_bd2", m_bits=1 << 10)
            df = _batch_df(spark, BATCHES[0])
            first = {r["doc_id"] for r in admit_dedup_batch(spark, df, "t_bd2").collect()}
            assert first == {1, 2}
            replay = admit_dedup_batch(spark, df, "t_bd2")
            assert replay.count() == 0
            assert read_admitted_fps(spark, "t_bd2").count() == 2
        finally:
            _cleanup(spark, "t_bd2")

    def test_crash_after_bloom_before_ledger_heals(self, spark):
        """The load-bearing window: the bloom already contains the
        batch's fps, the ledger does not.  The replay must route the
        rows through the exact verify (bloom-positive), ADMIT them
        (ledger lacks them), and complete the ledger -- a duplicate-free
        outcome without re-admission of anything already ledgered."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.bloomjoin import (
            append_to_bloom_index,
        )

        try:
            init_bloom_dedup_index(spark, "t_bd3", m_bits=1 << 10)
            df = _batch_df(spark, BATCHES[0])
            # simulate the crash: only the bloom append landed
            append_to_bloom_index(
                spark,
                df.select(F.col("fp")).distinct(),
                "fp",
                "t_bd3",
            )
            assert read_admitted_fps(spark, "t_bd3").count() == 0
            adm = admit_dedup_batch(spark, df, "t_bd3")
            assert {r["doc_id"] for r in adm.collect()} == {1, 2}
            assert read_admitted_fps(spark, "t_bd3").count() == 2
            # and a subsequent true replay is now a no-op
            assert admit_dedup_batch(spark, df, "t_bd3").count() == 0
        finally:
            _cleanup(spark, "t_bd3")

    def test_forced_false_positives_stay_exact(self, spark):
        """A deliberately tiny bloom (64 bits) sends nearly every row
        through the verify join; admission must still be exact."""
        try:
            init_bloom_dedup_index(spark, "t_bd4", m_bits=64)
            got = set()
            for rows in BATCHES:
                adm = admit_dedup_batch(spark, _batch_df(spark, rows), "t_bd4")
                got |= {r["doc_id"] for r in adm.collect()}
            assert got == EXPECT
        finally:
            _cleanup(spark, "t_bd4")

    def test_foreachbatch_two_micro_batches(self, spark, tmp_path):
        src = tmp_path / "src"
        out = tmp_path / "admitted"
        try:
            init_bloom_dedup_index(spark, "t_bd5", m_bits=1 << 10)
            for rows in BATCHES[:2]:
                _batch_df(spark, rows).coalesce(1).write.parquet(
                    str(src), mode="append"
                )
            stream = (
                spark.readStream.schema("doc_id bigint, fp string")
                .option("maxFilesPerTrigger", "1")
                .parquet(str(src))
            )

            def _admit(batch_df, batch_id):
                admit_dedup_batch(spark, batch_df, "t_bd5").write.mode(
                    "append"
                ).parquet(str(out))

            q = (
                stream.writeStream.foreachBatch(_admit)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            admitted = {
                r["doc_id"] for r in spark.read.parquet(str(out)).collect()
            }
            # micro-batch order is file order; either way fB is admitted
            # exactly once and each fp exactly once
            fps = [r["fp"] for r in spark.read.parquet(str(out)).collect()]
            assert len(fps) == len(set(fps)) == 3  # fA, fB, fC
            assert read_admitted_fps(spark, "t_bd5").count() == 3
        finally:
            _cleanup(spark, "t_bd5")
