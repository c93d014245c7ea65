"""Operational CLI: record timeline and targeted deletion.

The incident/compliance companion to the collection runner:

    python -m dataworks_aws_corporate_data_ingestion_spark.plans.ops_cli \\
        timeline --daily-root DAILIES [--snapshot-root SNAP] \\
        --record-id '{"id": "ab-rec-1"}'

    python -m dataworks_aws_corporate_data_ingestion_spark.plans.ops_cli \\
        purge --snapshot-root SNAP --keys-file ids.txt [--fmt orc]

`timeline` prints one JSON line per event (daily mutations in date
order, current snapshot state last).  `purge` reads one record id per
line from --keys-file, erases them partition-surgically
(operators/purge.py) and prints the per-bucket audit as JSON lines.
Both run read/rewrite work through the same operators the tests pin.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="CDI-spark ops tool")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("timeline", help="history of one record")
    t.add_argument("--daily-root", required=True)
    t.add_argument("--snapshot-root", default="")
    t.add_argument("--record-id", required=True)
    t.add_argument("--daily-fmt", default="orc")
    t.add_argument("--snapshot-fmt", default="orc")

    g = sub.add_parser("purge", help="targeted record deletion")
    g.add_argument("--snapshot-root", required=True)
    g.add_argument("--keys-file", required=True)
    g.add_argument("--fmt", default="orc")
    g.add_argument("--compression", default="")
    return p


def run_timeline(spark: SparkSession, args) -> list[dict]:
    from .timeline import record_timeline

    rows = record_timeline(
        spark,
        args.daily_root,
        args.record_id,
        snapshot_root=args.snapshot_root or None,
        daily_fmt=args.daily_fmt,
        snapshot_fmt=args.snapshot_fmt,
    ).collect()
    return [
        {
            "source": r.source,
            "event_date": str(r.event_date) if r.event_date else None,
            "db_type": r.db_type,
            "val": r.val,
        }
        for r in rows
    ]


def run_purge(spark: SparkSession, args) -> list[dict]:
    from ..operators.purge import purge_keys

    with open(args.keys_file) as fd:
        ids = [line.rstrip("\n") for line in fd if line.strip()]
    keys = spark.createDataFrame([(i,) for i in ids], "id string")
    audit = purge_keys(
        spark,
        args.snapshot_root,
        keys,
        fmt=args.fmt,
        compression=args.compression or None,
    ).collect()
    return [
        {
            "id_part": r.id_part,
            "rows_before": r.rows_before,
            "rows_after": r.rows_after,
            "purged": r.purged,
        }
        for r in audit
    ]


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    if spark is None:
        from ..session import get_session

        spark = get_session(app_name=f"cdi-ops-{args.cmd}")
    records = (
        run_timeline(spark, args)
        if args.cmd == "timeline"
        else run_purge(spark, args)
    )
    for rec in records:
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
