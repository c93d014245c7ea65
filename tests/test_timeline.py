"""Record timeline over the daily + snapshot layouts (plans/timeline.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.plans.timeline import (
    id_part_of,
    record_timeline,
)
from dataworks_aws_corporate_data_ingestion_spark.sinks.writers import (
    write_daily,
    write_snapshot,
)


def _rid(part: str, n: int) -> str:
    return json.dumps({"id": f"{part}-rec-{n}"})


def _daily_rows(spark, date: str, rows):
    y, m, d = (int(p) for p in date.split("-"))
    return spark.createDataFrame(
        rows, "id string, db_type string, val string"
    ).select(
        "id",
        F.get_json_object("id", "$.id").substr(1, 2).alias("id_part"),
        F.lit(y).alias("export_year"),
        F.lit(m).alias("export_month"),
        F.lit(d).alias("export_day"),
        "db_type",
        "val",
    )


class TestIdPartOf:
    def test_wrapped(self):
        assert id_part_of(_rid("ab", 1)) == "ab"

    def test_primitive(self):
        assert id_part_of("zq-plain") == "zq"

    def test_matches_spark_derivation_for_nonstring_inner_ids(self, spark):
        """The driver twin must agree with the ingest column expression
        (coalesce(get_json_object(id,'$.id')[:2], id[:2])) for EVERY
        inner-id shape -- get_json_object stringifies non-string values,
        so '{"id": 123}' buckets under '12', not '{\"' (advisor r6)."""
        cases = [
            json.dumps({"id": "ab-rec-1"}),  # wrapped string
            json.dumps({"id": 123456}),  # wrapped int -> "12"
            json.dumps({"id": 1.5}),  # wrapped float -> "1."
            json.dumps({"id": True}),  # wrapped bool -> "tr"
            json.dumps({"id": None}),  # wrapped null -> fallback
            json.dumps({"id": {"$oid": "x"}}),  # wrapped object
            json.dumps({"noid": 1}),  # missing key -> fallback
            "zq-plain",  # unparseable -> fallback
        ]
        df = spark.createDataFrame([(c,) for c in cases], "id string")
        inner = F.get_json_object(F.col("id"), "$.id")
        got = {
            r.id: r.part
            for r in df.select(
                "id",
                F.coalesce(
                    F.substring(inner, 1, 2), F.substring("id", 1, 2)
                ).alias("part"),
            ).collect()
        }
        for c in cases:
            assert id_part_of(c) == got[c], c


class TestRecordTimeline:
    def _build(self, spark, tmp_path):
        daily_root = str(tmp_path / "dailies")
        snap_root = str(tmp_path / "snapshot")
        rid = _rid("aa", 1)
        other = _rid("bb", 2)
        days = [
            ("2025-03-01", [(rid, "INSERT", "v1"), (other, "INSERT", "x1")]),
            ("2025-03-02", [(rid, "INSERT", "v2")]),
            ("2025-03-03", [(rid, "DELETE", "v2"), (other, "INSERT", "x2")]),
        ]
        for date, rows in days:
            write_daily(
                _daily_rows(spark, date, rows),
                daily_root,
                fmt="parquet",
                compression="snappy",
            )
        snap = spark.createDataFrame(
            [(other, "bb", "INSERT", "x2")],
            "id string, id_part string, db_type string, val string",
        )
        write_snapshot(snap, snap_root, fmt="parquet", compression="snappy")
        return daily_root, snap_root, rid, other

    def test_history_ordered_with_snapshot_last(self, spark, tmp_path):
        daily_root, snap_root, rid, other = self._build(spark, tmp_path)
        rows = record_timeline(
            spark,
            daily_root,
            other,
            snapshot_root=snap_root,
            daily_fmt="parquet",
            snapshot_fmt="parquet",
        ).collect()
        assert [r.source for r in rows] == ["daily", "daily", "snapshot"]
        assert [str(r.event_date) for r in rows[:2]] == [
            "2025-03-01",
            "2025-03-03",
        ]
        assert rows[-1].val == "x2"

    def test_deleted_record_shows_full_mutation_trail(
        self, spark, tmp_path
    ):
        daily_root, snap_root, rid, _ = self._build(spark, tmp_path)
        rows = record_timeline(
            spark,
            daily_root,
            rid,
            snapshot_root=snap_root,
            daily_fmt="parquet",
            snapshot_fmt="parquet",
        ).collect()
        # not in the snapshot (deleted): 3 daily rows only
        assert [r.source for r in rows] == ["daily"] * 3
        assert [r.db_type for r in rows] == ["INSERT", "INSERT", "DELETE"]

    def test_unknown_record_is_empty(self, spark, tmp_path):
        daily_root, snap_root, _, _ = self._build(spark, tmp_path)
        out = record_timeline(
            spark,
            daily_root,
            _rid("zz", 9),
            snapshot_root=snap_root,
            daily_fmt="parquet",
            snapshot_fmt="parquet",
        )
        assert out.count() == 0

    def test_snapshot_scan_is_partition_pruned(self, spark, tmp_path):
        daily_root, snap_root, rid, other = self._build(spark, tmp_path)
        part = id_part_of(other)
        snap_scan = (
            spark.read.format("parquet")
            .load(snap_root)
            .filter(F.col("id_part") == part)
        )
        files = snap_scan.inputFiles()
        assert files and all(f"id_part={part}" in f for f in files)

    def test_id_predicate_pushes_to_daily_scan(self, spark, tmp_path):
        daily_root, snap_root, rid, _ = self._build(spark, tmp_path)
        df = record_timeline(
            spark, daily_root, rid, daily_fmt="parquet"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        assert "IsNotNull(id)" in plan or "EqualTo(id" in plan


class TestOpsCli:
    def test_timeline_cli_prints_json_lines(self, spark, tmp_path, capsys):
        from dataworks_aws_corporate_data_ingestion_spark.plans.ops_cli import main

        daily_root, snap_root, rid, other = TestRecordTimeline()._build(
            spark, tmp_path
        )
        rc = main(
            [
                "timeline",
                "--daily-root",
                daily_root,
                "--snapshot-root",
                snap_root,
                "--record-id",
                other,
                "--daily-fmt",
                "parquet",
                "--snapshot-fmt",
                "parquet",
            ],
            spark=spark,
        )
        assert rc == 0
        import json as _json

        lines = [
            _json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        ]
        assert [r["source"] for r in lines] == ["daily", "daily", "snapshot"]

    def test_purge_cli_erases_and_audits(self, spark, tmp_path, capsys):
        import json as _json

        from dataworks_aws_corporate_data_ingestion_spark.plans.ops_cli import main
        from dataworks_aws_corporate_data_ingestion_spark.sinks.writers import (
            write_snapshot,
        )

        snap_root = str(tmp_path / "snap")
        snap = spark.createDataFrame(
            [
                (_rid("aa", n), "aa", "INSERT", f"v{n}")
                for n in range(4)
            ],
            "id string, id_part string, db_type string, val string",
        )
        write_snapshot(snap, snap_root, fmt="parquet", compression="snappy")
        keys_file = tmp_path / "keys.txt"
        keys_file.write_text(_rid("aa", 1) + "\n" + _rid("aa", 3) + "\n")
        rc = main(
            [
                "purge",
                "--snapshot-root",
                snap_root,
                "--keys-file",
                str(keys_file),
                "--fmt",
                "parquet",
            ],
            spark=spark,
        )
        assert rc == 0
        audit = [
            _json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        ]
        assert audit == [
            {"id_part": "aa", "rows_before": 4, "rows_after": 2, "purged": 2}
        ]
        assert spark.read.parquet(snap_root).count() == 2
