"""CSV quarantine and schema-evolution sources (sources/text_formats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.sources.text_formats import (
    read_csv_quarantine,
    read_evolving,
)


class TestCsvQuarantine:
    def test_good_and_bad_split(self, spark, tmp_path):
        p = tmp_path / "feed.csv"
        p.write_text(
            "id,name,amount\n"
            "1,alice,10.50\n"
            "2,bob,not_a_number\n"  # uncastable -> quarantine
            "3,carol,7.25\n"
            "4,dave\n"  # wrong arity -> quarantine
        )
        good, bad = read_csv_quarantine(
            spark, str(p), "id INT, name STRING, amount DOUBLE"
        )
        assert good.count() == 2
        assert {r["id"] for r in good.collect()} == {1, 3}
        bad_rows = [r["raw_line"] for r in bad.collect()]
        assert len(bad_rows) == 2
        # the quarantine carries the raw line for forensic replay
        assert any("not_a_number" in r for r in bad_rows)
        assert any(r.startswith("4,dave") for r in bad_rows)

    def test_clean_file_quarantines_nothing(self, spark, tmp_path):
        p = tmp_path / "clean.csv"
        p.write_text("id,name,amount\n1,a,1.0\n2,b,2.0\n")
        good, bad = read_csv_quarantine(
            spark, str(p), "id INT, name STRING, amount DOUBLE"
        )
        assert good.count() == 2 and bad.count() == 0


class TestSchemaEvolution:
    def _write_days(self, spark, root):
        d1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id INT, name STRING"
        )
        d1.write.parquet(f"{root}/day=2024-01-01")
        d2 = spark.createDataFrame(
            [(3, "c", 9.5)], "id INT, name STRING, score DOUBLE"
        )
        d2.write.parquet(f"{root}/day=2024-01-02")

    def test_merge_schema_unions_columns(self, spark, tmp_path):
        root = str(tmp_path / "evolving")
        self._write_days(spark, root)
        df = read_evolving(spark, root)
        assert set(df.columns) == {"id", "name", "score", "day"}
        assert df.count() == 3
        # pre-evolution rows read as null for the late column
        assert df.filter(F.col("score").isNull()).count() == 2
        assert df.filter(F.col("score") == 9.5).count() == 1

    def test_contract_schema_needs_no_discovery(self, spark, tmp_path):
        root = str(tmp_path / "evolving2")
        self._write_days(spark, root)
        df = read_evolving(
            spark, root, schema_ddl="id INT, name STRING, score DOUBLE, day DATE"
        )
        assert df.count() == 3
        assert df.filter(F.col("score").isNotNull()).count() == 1
        assert df.schema["day"].dataType.simpleString() == "date"


class TestProvenanceMetadata:
    def test_metadata_columns_survive_partitioned_write(self, spark, tmp_path):
        """The hidden _metadata struct gives per-row file provenance --
        the 100 TB debugging tool ('which physical file produced this
        row') -- and must track files through a partitioned write."""
        from dataworks_aws_corporate_data_ingestion_spark.sources.tables import load_table

        events = load_table(spark, "events", "/root/testdata/sf0.001").select(
            "event_id", "event_type"
        )
        root = str(tmp_path / "prov")
        events.write.partitionBy("event_type").parquet(root)
        back = spark.read.parquet(root).select(
            "event_id",
            "event_type",
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.file_name").alias("fn"),
            F.col("_metadata.file_size").alias("sz"),
        )
        # every row maps to a real file inside its partition directory
        bad = back.filter(
            ~F.col("fp").contains(F.concat(F.lit("event_type="), F.col("event_type")))
        )
        assert bad.count() == 0
        per_file = back.groupBy("fp", "sz").count().collect()
        assert len(per_file) >= back.select("event_type").distinct().count()
        assert all(r["sz"] > 0 for r in per_file)
        assert back.count() == events.count()


class TestStateStoreDataSource:
    """Python DataSource V2 (Spark 4) over the job-state JSONL log:
    schema imposition, status partitioning, last-writer-wins parity with
    LocalStateStore, and pushed filters via the normal DataFrame API."""

    def _seed(self, path):
        from dataworks_aws_corporate_data_ingestion_spark.plans.state import (
            COMPLETED,
            FAILED,
            IN_PROGRESS,
            JobStatus,
            LocalStateStore,
        )

        store = LocalStateStore(str(path))
        store.put(
            JobStatus("c1", "CDI-a", "2024-01-01", IN_PROGRESS, updated_at=1.0)
        )
        # same key overwritten: only the COMPLETED winner may surface
        store.put(
            JobStatus(
                "c1", "CDI-a", "2024-01-01", COMPLETED,
                export_prefix="s3://x/a/1", updated_at=2.0,
            )
        )
        store.put(
            JobStatus("c1", "CDI-a", "2024-01-02", FAILED, updated_at=3.0)
        )
        store.put(
            JobStatus(
                "c2", "CDI-b", "2024-01-02", COMPLETED,
                export_prefix="s3://x/b/1", updated_at=4.0,
            )
        )
        return store

    def test_table_view_matches_state_store_lww(self, spark, tmp_path):
        from dataworks_aws_corporate_data_ingestion_spark.sources.statestore_ds import (
            register_state_source,
        )

        path = tmp_path / "state.jsonl"
        store = self._seed(path)
        register_state_source(spark)
        df = spark.read.format("cdi_state").option("path", str(path)).load()
        rows = {
            (r.correlation_id, r.data_product, r.date): r
            for r in df.collect()
        }
        # 3 distinct keys, never the overwritten IN_PROGRESS record
        assert len(rows) == 3
        assert rows[("c1", "CDI-a", "2024-01-01")].status == "COMPLETED"
        assert rows[("c1", "CDI-a", "2024-01-02")].status == "FAILED"
        # parity with the driver-side store view
        store_keys = {
            (e.correlation_id, e.data_product, e.date): e.status
            for e in store.entries()
        }
        assert {k: r.status for k, r in rows.items()} == store_keys

    def test_status_filtered_audit(self, spark, tmp_path):
        from dataworks_aws_corporate_data_ingestion_spark.sources.statestore_ds import (
            register_state_source,
        )

        path = tmp_path / "state.jsonl"
        self._seed(path)
        register_state_source(spark)
        failed = (
            spark.read.format("cdi_state")
            .option("path", str(path))
            .load()
            .filter("status = 'FAILED'")
            .collect()
        )
        assert [(r.date, r.correlation_id) for r in failed] == [
            ("2024-01-02", "c1")
        ]

    def test_missing_file_fails_loudly_unless_opted_in(self, spark, tmp_path):
        # a missing log must be a driver-side error (on a real cluster an
        # absent-on-executor path would otherwise read as "no runs ever"),
        # unless the caller explicitly allows it
        from dataworks_aws_corporate_data_ingestion_spark.sources.statestore_ds import (
            register_state_source,
        )

        register_state_source(spark)
        with pytest.raises(Exception, match="allow_missing"):
            (
                spark.read.format("cdi_state")
                .option("path", str(tmp_path / "nope.jsonl"))
                .load()
                .count()
            )
        df = (
            spark.read.format("cdi_state")
            .option("path", str(tmp_path / "nope.jsonl"))
            .option("allow_missing", "true")
            .load()
        )
        assert df.count() == 0

    def test_unknown_status_and_null_run_id_survive(self, spark, tmp_path):
        # novel status values land in the catch-all partition instead of
        # vanishing; an explicit null run_id defaults to 1 instead of
        # raising TypeError
        import json as _json

        from dataworks_aws_corporate_data_ingestion_spark.sources.statestore_ds import (
            register_state_source,
        )

        path = tmp_path / "state.jsonl"
        path.write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {
                        "correlation_id": "c9",
                        "data_product": "CDI-x",
                        "date": "2024-02-01",
                        "status": "RETRYING",
                        "run_id": None,
                        "updated_at": 9.0,
                    },
                    {
                        "correlation_id": "c1",
                        "data_product": "CDI-a",
                        "date": "2024-02-01",
                        "status": "COMPLETED",
                        "run_id": 2,
                        "updated_at": 1.0,
                    },
                    {
                        # a legitimate 0 must NOT be rewritten to the
                        # null-default (advisor r6: `or` caught 0 too)
                        "correlation_id": "c0",
                        "data_product": "CDI-z",
                        "date": "2024-02-01",
                        "status": "COMPLETED",
                        "run_id": 0,
                        "updated_at": 0,
                    },
                ]
            )
            + "\n"
        )
        register_state_source(spark)
        rows = {
            r.correlation_id: r
            for r in spark.read.format("cdi_state")
            .option("path", str(path))
            .load()
            .collect()
        }
        assert rows["c9"].status == "RETRYING"
        assert rows["c9"].run_id == 1
        assert rows["c1"].status == "COMPLETED"
        assert rows["c1"].run_id == 2
        assert rows["c0"].run_id == 0
        assert rows["c0"].updated_at == 0.0
