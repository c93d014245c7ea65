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
