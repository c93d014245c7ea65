"""Streaming CMS admission (streaming/cms_admission.py): append ==
rebuild at every prefix, replay idempotence, the crash window,
compaction invariants, and the real foreachBatch surface with two
micro-batches (cloned-session staleness regression)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.cms import (
    cms_sketch,
)
from dataworks_aws_corporate_data_ingestion_spark.streaming.cms_admission import (
    admit_cms_batch,
    compact_cms_index,
    init_cms_index,
    read_cms_state,
)

pytestmark = pytest.mark.slow

W, D = 8, 3

BATCHES = [
    ["hot"] * 6 + [f"u{i}" for i in range(5)],
    ["hot"] * 4 + ["warm"] * 5 + [f"v{i}" for i in range(4)],
    ["hot"] * 7 + [f"w{i}" for i in range(6)],
]


def _batch_df(spark, keys, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, k) for i, k in enumerate(keys)],
        "event_id bigint, key string",
    ).repartition(2)


def _cleanup(spark, prefix):
    for t in (f"{prefix}_cms", f"{prefix}_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _state_rows(spark, prefix):
    sketch, n = read_cms_state(spark, prefix)
    return sorted(tuple(r) for r in sketch.collect()), n


class TestAdmission:
    def test_prefix_equals_rebuild(self, spark):
        try:
            init_cms_index(spark, "t_ca1")
            seen = []
            sid = 0
            for b in BATCHES:
                df = _batch_df(spark, b, sid)
                seen.extend((sid + i, k) for i, k in enumerate(b))
                sid += 10000
                admit_cms_batch(
                    spark, df, "t_ca1", W, D, key_col="key",
                    id_col="event_id",
                )
                corpus = spark.createDataFrame(
                    seen, "event_id bigint, key string"
                )
                got, n = _state_rows(spark, "t_ca1")
                want = sorted(
                    tuple(r)
                    for r in cms_sketch(
                        corpus.select("key"), "key", W, D
                    ).collect()
                )
                assert got == want and got
                assert n == len(seen)
        finally:
            _cleanup(spark, "t_ca1")

    def test_replay_is_noop(self, spark):
        try:
            init_cms_index(spark, "t_ca2")
            df = _batch_df(spark, BATCHES[0])
            admit_cms_batch(spark, df, "t_ca2", W, D, key_col="key",
                            id_col="event_id")
            s1, n1 = _state_rows(spark, "t_ca2")
            admit_cms_batch(spark, df, "t_ca2", W, D, key_col="key",
                            id_col="event_id")
            s2, n2 = _state_rows(spark, "t_ca2")
            assert s2 == s1 and n1 == n2 == len(BATCHES[0])
        finally:
            _cleanup(spark, "t_ca2")

    def test_crash_after_cms_heals_meta(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.streaming.span_admission import (
            batch_content_token,
        )

        try:
            init_cms_index(spark, "t_ca3")
            df = _batch_df(spark, BATCHES[0])
            token = batch_content_token(df, "event_id")
            part = cms_sketch(df, "key", W, D).collect()
            rows = [
                (int(r["row"]), int(r["col"]), int(r["c"]), token)
                for r in part
            ]
            rows.append((None, None, 0, token))
            spark.createDataFrame(
                rows, "row int, col long, c long, batch_token long"
            ).write.mode("append").format("parquet").saveAsTable(
                "t_ca3_cms"
            )
            _, n_before = read_cms_state(spark, "t_ca3")
            assert n_before == 0  # the crash window
            admit_cms_batch(spark, df, "t_ca3", W, D, key_col="key",
                            id_col="event_id")
            got, n = _state_rows(spark, "t_ca3")
            want = sorted(
                tuple(r) for r in cms_sketch(df, "key", W, D).collect()
            )
            assert got == want  # a double-append would inflate cells
            assert n == len(BATCHES[0])
        finally:
            _cleanup(spark, "t_ca3")

    def test_compaction_preserves_cells_tokens_and_replay(self, spark):
        try:
            init_cms_index(spark, "t_ca4")
            sid = 0
            for b in BATCHES[:2]:
                admit_cms_batch(
                    spark, _batch_df(spark, b, sid), "t_ca4", W, D,
                    key_col="key", id_col="event_id",
                )
                sid += 10000
            before, n_before = _state_rows(spark, "t_ca4")
            tokens_before = {
                r["batch_token"]
                for r in spark.table("t_ca4_cms")
                .select("batch_token")
                .filter(F.col("batch_token").isNotNull())
                .distinct()
                .collect()
            }
            compact_cms_index(spark, "t_ca4")
            after, n_after = _state_rows(spark, "t_ca4")
            assert after == before and n_after == n_before
            tokens_after = {
                r["batch_token"]
                for r in spark.table("t_ca4_cms")
                .select("batch_token")
                .filter(F.col("batch_token").isNotNull())
                .distinct()
                .collect()
            }
            assert tokens_after == tokens_before
            admit_cms_batch(  # replay after compaction: still a no-op
                spark, _batch_df(spark, BATCHES[1], 10000), "t_ca4",
                W, D, key_col="key", id_col="event_id",
            )
            final, n_final = _state_rows(spark, "t_ca4")
            assert final == before and n_final == n_before
        finally:
            _cleanup(spark, "t_ca4")


class TestForeachBatch:
    def test_two_micro_batches_end_to_end(self, spark, tmp_path):
        src = tmp_path / "src"
        try:
            init_cms_index(spark, "t_ca6")
            sid = 0
            for b in BATCHES[:2]:
                _batch_df(spark, b, sid).coalesce(1).write.parquet(
                    str(src), mode="append"
                )
                sid += 10000
            stream = (
                spark.readStream.schema("event_id bigint, key string")
                .option("maxFilesPerTrigger", "1")
                .parquet(str(src))
            )

            def _admit(batch_df, batch_id):
                admit_cms_batch(
                    spark, batch_df, "t_ca6", W, D, key_col="key",
                    id_col="event_id",
                )

            q = (
                stream.writeStream.foreachBatch(_admit)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            corpus = spark.read.parquet(str(src))
            got, n = _state_rows(spark, "t_ca6")
            want = sorted(
                tuple(r)
                for r in cms_sketch(
                    corpus.select("key"), "key", W, D
                ).collect()
            )
            assert got == want and got
            assert n == corpus.count()
        finally:
            _cleanup(spark, "t_ca6")


class TestWeightedAdmission:
    def test_weighted_prefix_equals_rebuild(self, spark):
        """Weighted streaming admission must equal the one-shot
        weighted sketch at every prefix, including a rare-by-rows but
        heavy-by-weight whale key; the ledger tracks weight mass."""
        wbatches = [
            [("whale", 5000)] + [(f"u{i}", 3) for i in range(10)],
            [("warm", 2000), ("whale", 1000)]
            + [(f"v{i}", 5) for i in range(8)],
            [("warm", 3000)] + [(f"w{i}", 2) for i in range(9)],
        ]
        try:
            init_cms_index(spark, "t_caw1")
            seen = []
            sid = 0
            for b in wbatches:
                rows = [(sid + i, k, w) for i, (k, w) in enumerate(b)]
                sid += 10000
                seen.extend(rows)
                df = spark.createDataFrame(
                    rows, "event_id bigint, key string, w long"
                ).repartition(2)
                admit_cms_batch(
                    spark, df, "t_caw1", W, D, key_col="key",
                    id_col="event_id", weight_col="w",
                )
                corpus = spark.createDataFrame(
                    seen, "event_id bigint, key string, w long"
                )
                got, mass = _state_rows(spark, "t_caw1")
                want = sorted(
                    tuple(r)
                    for r in cms_sketch(
                        corpus.select("key", "w"), "key", W, D,
                        weight_col="w",
                    ).collect()
                )
                assert got == want and got
                assert mass == sum(w for _, _, w in seen)
        finally:
            _cleanup(spark, "t_caw1")
