"""Subprocess body for the executed (not string-asserted) Hive DDL test.

Runs in its OWN interpreter because spark.sql.catalogImplementation is a
static conf: the shared pytest session is in-memory, and a second session
in the same JVM cannot switch to a Hive catalog.  Here we build a real
enableHiveSupport() session against an embedded Derby metastore in a
tmpdir (pyspark bundles the hive + derby jars), then execute the
reference's actual audit load sequence -- EXTERNAL TABLE over the day's
JSONL, ADD PARTITION, INSERT OVERWRITE into the ORC raw table, DROP --
via publish_audit_day_hive, and the projected view via
publish_audit_view (reference steps/ingesters.py:141-266).

Protocol (stdout, one marker per line):
  DERBY_FAIL <reason>   session/metastore could not start -> pytest skips
  HIVE_DDL_OK <n_rows>  the full round trip executed and verified
Any other outcome (assertion error, DDL failure) exits non-zero -> test
FAILS (the point is executing the DDL, not asserting its text).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, REPO_ROOT)
    work = tempfile.mkdtemp(prefix="cdi-hive-ddl-")
    os.chdir(work)  # metastore_db + derby.log land here, not in the repo

    try:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[2]")
            .appName("cdi-hive-ddl-test")
            .config("spark.sql.warehouse.dir", os.path.join(work, "warehouse"))
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            # the reference's INSERT OVERWRITE relies on Hive dynamic
            # partitioning (EMR default); embedded Hive defaults to strict
            .config("hive.exec.dynamic.partition", "true")
            .config("hive.exec.dynamic.partition.mode", "nonstrict")
            .enableHiveSupport()
            .getOrCreate()
        )
        if (
            spark.conf.get("spark.sql.catalogImplementation", "in-memory")
            != "hive"
        ):
            print("DERBY_FAIL catalogImplementation is not hive")
            return 0
        # force metastore client instantiation now so a Derby failure is
        # classified as a skip, not a test failure
        spark.sql("SHOW DATABASES").collect()
    except Exception as exc:  # Derby/metastore startup is environmental
        print(f"DERBY_FAIL {type(exc).__name__}: {exc}")
        return 0

    from dataworks_aws_corporate_data_ingestion_spark.plans.publish import (
        publish_audit_day_hive,
        publish_audit_view,
    )

    export_date = "2023-05-02"
    day_dir = os.path.join(work, "audit", export_date)
    os.makedirs(day_dir)
    payloads = [
        {"auditType": "VIEW", "user": f"u{i}", "seq": i} for i in range(7)
    ]
    with open(os.path.join(day_dir, "part-000.jsonl"), "w") as fd:
        for p in payloads:
            fd.write(json.dumps(p) + "\n")

    publish_audit_day_hive(spark, day_dir, export_date)

    raw = spark.table("uc_dw_auditlog.auditlog_raw")
    rows = raw.collect()
    assert len(rows) == 7, f"expected 7 raw rows, got {len(rows)}"
    assert {r.date_str for r in rows} == {export_date}
    got_payloads = sorted(json.loads(r.val)["seq"] for r in rows)
    assert got_payloads == list(range(7)), got_payloads
    # the throwaway external table must be dropped by the sequence
    ext = f"auditlog_raw_{export_date.replace('-', '_')}"
    tables = {
        t.name for t in spark.catalog.listTables("uc_dw_auditlog")
    }
    assert ext not in tables, f"external table {ext} survived the DROP"
    # partition registered on the managed table
    parts = spark.sql(
        "SHOW PARTITIONS uc_dw_auditlog.auditlog_raw"
    ).collect()
    assert any(export_date in p[0] for p in parts), parts

    # idempotence: re-running the day's load replaces, not duplicates
    publish_audit_day_hive(spark, day_dir, export_date)
    assert spark.table("uc_dw_auditlog.auditlog_raw").count() == 7

    publish_audit_view(
        spark,
        "uc_dw_auditlog",
        "auditlog_sec_v",
        ["auditType", "user"],
        "uc_dw_auditlog.auditlog_raw",
        "auditType STRING, user STRING, seq BIGINT",
    )
    view = spark.table("uc_dw_auditlog.auditlog_sec_v")
    assert view.columns == ["auditType", "user", "date_str"], view.columns
    assert view.count() == 7

    print(f"HIVE_DDL_OK {len(rows)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
