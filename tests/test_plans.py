"""SQL runner, job-state store, catalog publication, and the date-range
collection runner (CLI path) end-to-end."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.plans import state as state_mod
from dataworks_aws_corporate_data_ingestion_spark.plans.publish import (
    TableSpec,
    publish_audit_day,
    publish_audit_view,
    publish_snapshot_tables,
)
from dataworks_aws_corporate_data_ingestion_spark.plans.runner import (
    CollectionSpec,
    EngineConfig,
    date_range,
    main as runner_main,
    run_range,
)
from dataworks_aws_corporate_data_ingestion_spark.plans.sqlrunner import (
    SqlRunner,
    interpolate,
    split_statements,
)
from dataworks_aws_corporate_data_ingestion_spark.plans.state import (
    JobStatus,
    LocalStateStore,
)

from tests.fixtures import make_batch


class TestSqlRunner:
    def test_interpolation_and_split(self):
        sql = "SELECT * FROM #{hivevar:db}.t; DROP TABLE #{hivevar:db}.t"
        out = interpolate(sql, {"db": "mydb"})
        assert split_statements(out) == [
            "SELECT * FROM mydb.t",
            "DROP TABLE mydb.t",
        ]

    def test_execute_multi_statement(self, spark):
        r = SqlRunner(spark)
        df = r.execute(
            "CREATE DATABASE IF NOT EXISTS #{hivevar:db}; SELECT 1 AS one",
            variables={"db": "t_sqlrunner"},
        )
        assert df.collect()[0]["one"] == 1


class TestStateStore:
    def test_latest_completed_export(self, tmp_path):
        store = LocalStateStore(str(tmp_path / "state.jsonl"))
        put = lambda **kw: store.put(  # noqa: E731
            JobStatus(correlation_id="c1", data_product="CDI-a:b", **kw)
        )
        put(date="2023-05-01", status=state_mod.COMPLETED, export_prefix="exports/1")
        put(date="2023-05-08", status=state_mod.COMPLETED)  # no export prefix
        put(date="2023-05-15", status=state_mod.FAILED, export_prefix="exports/x")
        put(date="2023-05-10", status=state_mod.COMPLETED, export_prefix="exports/2")
        latest = store.latest_completed_export("CDI-a:b")
        assert latest.date == "2023-05-10"
        assert latest.export_prefix == "exports/2"
        assert store.latest_completed_export("CDI-other") is None

    def test_last_writer_wins_per_day(self, tmp_path):
        store = LocalStateStore(str(tmp_path / "state.jsonl"))
        base = dict(correlation_id="c", data_product="p", date="2023-05-01")
        store.put(JobStatus(status=state_mod.IN_PROGRESS, **base))
        store.put(JobStatus(status=state_mod.COMPLETED, **base))
        entries = store.entries("p")
        assert len(entries) == 1 and entries[0].status == state_mod.COMPLETED


class TestPublish:
    def test_snapshot_tables(self, spark, tmp_path):
        snap = str(tmp_path / "snap")
        rows = [
            (f"id{i}", f"{i % 4:02d}", "INSERT", json.dumps({"a": i, "b": f"x{i}"}))
            for i in range(20)
        ]
        spark.createDataFrame(rows, "id string, id_part string, db_type string, val string").write.format(
            "orc"
        ).save(snap)
        publish_snapshot_tables(
            spark,
            snap,
            [TableSpec("t_pub_snapshot", "a INT, b STRING")],
        )
        out = spark.table("t_pub_snapshot")
        assert out.columns == ["a", "b"]
        assert out.count() == 20
        assert out.filter(F.col("b") == "x7").collect()[0]["a"] == 7

    def test_audit_day_and_view(self, spark, tmp_path):
        day_dir = tmp_path / "audit_jsonl"
        day_dir.mkdir()
        recs = [{"AUDIT_EVENT": f"E{i}", "who": f"u{i}", "extra": i} for i in range(5)]
        (day_dir / "part-0.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs)
        )
        publish_audit_day(spark, str(day_dir), "2023-05-02", database="t_audit_db")
        raw = spark.table("t_audit_db.auditlog_raw")
        assert raw.filter(F.col("date_str") == "2023-05-02").count() == 5

        # idempotent re-run replaces, not duplicates, the partition
        publish_audit_day(spark, str(day_dir), "2023-05-02", database="t_audit_db")
        assert raw.filter(F.col("date_str") == "2023-05-02").count() == 5

        publish_audit_view(
            spark,
            "t_audit_db",
            "auditlog_sec_v",
            ["AUDIT_EVENT", "who"],
            "t_audit_db.auditlog_raw",
            "AUDIT_EVENT STRING, who STRING, extra INT",
        )
        view = spark.table("t_audit_db.auditlog_sec_v")
        assert set(view.columns) == {"AUDIT_EVENT", "who", "date_str"}
        assert view.count() == 5


class TestRunner:
    def test_date_range(self):
        assert date_range("2023-05-01", "2023-05-03") == [
            "2023-05-01",
            "2023-05-02",
            "2023-05-03",
        ]

    def _land(self, tmp_path, date: str, n: int, seed: int):
        y, m, d = date.split("-")
        day_dir = tmp_path / "landing" / y / m / d
        day_dir.mkdir(parents=True)
        lines, _ = make_batch(n, seed=seed)
        (day_dir / "batch.jsonl").write_text("\n".join(lines))

    def test_run_range_tracks_status_and_writes(self, spark, tmp_path):
        self._land(tmp_path, "2023-05-01", 8, seed=11)
        self._land(tmp_path, "2023-05-02", 9, seed=22)
        cfg = EngineConfig(
            correlation_id="t1",
            start_date="2023-05-01",
            end_date="2023-05-02",
            collection=CollectionSpec(
                name="calculator:calculationParts",
                source_root=str(tmp_path / "landing"),
                output_root=str(tmp_path / "out"),
            ),
            state_path=str(tmp_path / "state.jsonl"),
        )
        run_range(spark, cfg)
        out = spark.read.parquet(str(tmp_path / "out"))
        assert out.count() == 17
        assert set(r["export_day"] for r in out.select("export_day").distinct().collect()) == {1, 2}
        store = LocalStateStore(cfg.state_path)
        statuses = {e.date: e.status for e in store.entries("CDI-calculator:calculationParts")}
        assert statuses == {
            "2023-05-01": state_mod.COMPLETED,
            "2023-05-02": state_mod.COMPLETED,
        }

    def test_failure_marks_failed_and_raises(self, spark, tmp_path):
        # no landing data -> the read fails -> FAILED status then raise
        cfg = EngineConfig(
            correlation_id="t2",
            start_date="2023-05-01",
            end_date="2023-05-01",
            collection=CollectionSpec(
                name="calculator:calculationParts",
                source_root=str(tmp_path / "missing"),
                output_root=str(tmp_path / "out2"),
            ),
            state_path=str(tmp_path / "state2.jsonl"),
        )
        with pytest.raises(Exception):
            run_range(spark, cfg)
        store = LocalStateStore(cfg.state_path)
        assert store.entries()[0].status == state_mod.FAILED


class StubDynamoClient:
    """In-memory stand-in for the low-level boto3 dynamodb client,
    implementing exactly the call shapes DynamoDBStateStore makes.
    Scan returns one item per page to exercise pagination."""

    def __init__(self):
        self.items = {}  # (correlation_id, data_product) -> item dict
        self.calls = []

    @staticmethod
    def _k(key):
        return (key["Correlation_Id"]["S"], key["DataProduct"]["S"])

    def get_item(self, TableName, Key):
        self.calls.append(("get_item", TableName))
        item = self.items.get(self._k(Key))
        return {"Item": item} if item else {}

    def put_item(self, TableName, Item):
        self.calls.append(("put_item", TableName))
        self.items[self._k(Item)] = dict(Item)

    def update_item(self, TableName, Key, AttributeUpdates):
        self.calls.append(("update_item", TableName))
        item = self.items[self._k(Key)]
        for name, upd in AttributeUpdates.items():
            item[name] = upd["Value"]

    def scan(
        self,
        TableName,
        FilterExpression,
        ExpressionAttributeNames,
        ExpressionAttributeValues,
        ExclusiveStartKey=None,
    ):
        self.calls.append(("scan", TableName))
        assert "attribute_exists(S3_Prefix_CDI_Export)" in FilterExpression
        assert ExpressionAttributeNames == {"#st": "Status"}
        dp = ExpressionAttributeValues[":dp"]["S"]
        completed = ExpressionAttributeValues[":completed"]["S"]
        matches = sorted(
            (
                item
                for item in self.items.values()
                if item["DataProduct"]["S"] == dp
                and "S3_Prefix_CDI_Export" in item
                and item["Status"]["S"] == completed
            ),
            key=lambda it: it["Correlation_Id"]["S"],
        )
        start = 0
        if ExclusiveStartKey is not None:
            keys = [self._k(it) for it in matches]
            start = keys.index(self._k(ExclusiveStartKey)) + 1
        page = {"Items": matches[start : start + 1]}
        if start + 1 < len(matches):
            page["LastEvaluatedKey"] = {
                "Correlation_Id": matches[start]["Correlation_Id"],
                "DataProduct": matches[start]["DataProduct"],
            }
        return page


class TestDynamoDBStateStore:
    def _store(self):
        from dataworks_aws_corporate_data_ingestion_spark.plans.state import (
            DynamoDBStateStore,
        )

        client = StubDynamoClient()
        return DynamoDBStateStore(client, now=lambda: 1_000_000.0), client

    def test_create_then_update_flow(self):
        from dataworks_aws_corporate_data_ingestion_spark.plans.state import (
            COMPLETED,
            IN_PROGRESS,
            JobStatus,
        )

        store, client = self._store()
        store.put(
            JobStatus("corr1", "CDI-a:b", "2024-01-05", IN_PROGRESS, cluster_id="j-1")
        )
        item = client.items[("corr1", "CDI-a:b")]
        # first write creates the full row, reference steps/dynamodb.py:44-56
        assert item["Status"]["S"] == IN_PROGRESS
        assert item["Cluster_Id"]["S"] == "j-1"
        assert float(item["TimeToExist"]["N"]) == 1_000_000.0 + 2 * 52 * 7 * 24 * 3600
        assert "S3_Prefix_CDI_Export" not in item

        store.put(
            JobStatus(
                "corr1", "CDI-a:b", "2024-01-05", COMPLETED, export_prefix="s3://x/p1"
            )
        )
        # second write goes through update_item, not put_item
        assert client.calls.count(("put_item", "data_pipeline_metadata")) == 1
        assert client.calls.count(("update_item", "data_pipeline_metadata")) == 1
        item = client.items[("corr1", "CDI-a:b")]
        assert item["Status"]["S"] == COMPLETED
        assert item["S3_Prefix_CDI_Export"]["S"] == "s3://x/p1"

    def test_latest_completed_export_scans_and_paginates(self):
        from dataworks_aws_corporate_data_ingestion_spark.plans.state import (
            COMPLETED,
            IN_PROGRESS,
            JobStatus,
        )

        store, client = self._store()
        put = lambda corr, date, status, prefix: store.put(
            JobStatus(corr, "CDI-a:b", date, status, export_prefix=prefix)
        )
        put("c1", "2024-01-05", COMPLETED, "s3://x/p1")
        put("c2", "2024-02-01", COMPLETED, "s3://x/p2")   # newest valid
        put("c3", "2024-03-01", IN_PROGRESS, "s3://x/p3")  # wrong status
        put("c4", "2024-04-01", COMPLETED, None)           # no export prefix
        put("c5", "not-a-date", COMPLETED, "s3://x/p5")    # unparseable Date
        store.put(JobStatus("c6", "CDI-other", "2024-05-01", COMPLETED,
                            export_prefix="s3://x/p6"))    # other product

        latest = store.latest_completed_export("CDI-a:b")
        assert latest is not None
        assert (latest.correlation_id, latest.export_prefix) == ("c2", "s3://x/p2")
        # stub pages 1 item at a time -> pagination was exercised
        assert client.calls.count(("scan", "data_pipeline_metadata")) >= 2

    def test_empty_scan_returns_none(self):
        store, _ = self._store()
        assert store.latest_completed_export("CDI-a:b") is None


class TestHiveDdlAuditPath:
    """The metastore-backed audit publication variant: DDL strings are
    asserted verbatim against the reference sequence
    (steps/ingesters.py:181-206); execution stays gated on a Hive-enabled
    session, which the sandbox doesn't have."""

    def test_raw_load_sequence_matches_reference(self):
        from dataworks_aws_corporate_data_ingestion_spark.plans.publish import (
            audit_raw_load_ddl,
        )
        from dataworks_aws_corporate_data_ingestion_spark.plans.sqlrunner import (
            split_statements,
        )

        stmts = split_statements(
            audit_raw_load_ddl(
                "uc_dw_auditlog", "auditlog_raw", "2024-01-05", "s3://pub/audit/2024-01-05/"
            )
        )
        assert stmts == [
            "DROP TABLE IF EXISTS uc_dw_auditlog.auditlog_raw_2024_01_05",
            "CREATE EXTERNAL TABLE uc_dw_auditlog.auditlog_raw_2024_01_05 (val STRING)"
            " PARTITIONED BY (date_str STRING) STORED AS TEXTFILE"
            " LOCATION 's3://pub/audit/2024-01-05/'",
            "ALTER TABLE uc_dw_auditlog.auditlog_raw_2024_01_05 ADD IF NOT EXISTS"
            " PARTITION(date_str='2024-01-05') LOCATION 's3://pub/audit/2024-01-05/'",
            "INSERT OVERWRITE TABLE uc_dw_auditlog.auditlog_raw"
            " SELECT * FROM uc_dw_auditlog.auditlog_raw_2024_01_05",
            "DROP TABLE IF EXISTS uc_dw_auditlog.auditlog_raw_2024_01_05",
        ]

    def test_expanded_table_uses_openx_serde(self):
        from dataworks_aws_corporate_data_ingestion_spark.plans.publish import (
            audit_expanded_table_ddl,
        )

        ddl = audit_expanded_table_ddl(
            "uc_dw_auditlog", "2024-01-05", "s3://pub/audit/2024-01-05/"
        )
        assert "ROW FORMAT SERDE 'org.openx.data.jsonserde.JsonSerDe'" in ddl
        assert "auditlog_expanded_2024_01_05" in ddl
        assert "PARTITION(date_str='2024-01-05')" in ddl

    def test_execution_gated_on_hive_catalog(self, spark):
        import pytest

        from dataworks_aws_corporate_data_ingestion_spark.plans.publish import (
            publish_audit_day_hive,
        )

        with pytest.raises(RuntimeError, match="catalogImplementation"):
            publish_audit_day_hive(spark, "/tmp/nowhere", "2024-01-05")
