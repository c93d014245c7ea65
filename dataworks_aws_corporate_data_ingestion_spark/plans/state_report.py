"""Run-history audit CLI over the job-state store.

Reads the state log THROUGH the `cdi_state` Python DataSource
(sources/statestore_ds.py) -- the same table surface an analyst would
join/filter -- and prints one status line per (data_product, date) plus a
per-product failure-rate summary.  The reference's equivalent is an
operator scanning the DynamoDB console; here the audit is a DataFrame.

Usage: python -m dataworks_aws_corporate_data_ingestion_spark.plans.state_report \
           STATE_PATH [--product CDI-...]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def report(spark: SparkSession, state_path: str, product: str = "") -> list[str]:
    """Returns the report lines (printed by main); split out for tests."""
    from ..sources.statestore_ds import register_state_source

    register_state_source(spark)
    df = spark.read.format("cdi_state").option("path", state_path).load()
    if product:
        df = df.filter(F.col("data_product") == product)
    lines = [
        f"{r.date}  {r.data_product:<40s} {r.status:<12s}"
        f" run={r.run_id} export={r.export_prefix or '-'}"
        for r in df.orderBy("date", "data_product").collect()
    ]
    summary = (
        df.groupBy("data_product")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum((F.col("status") == "FAILED").cast("int")).alias("n_failed"),
            F.max(
                F.when(F.col("status") == "COMPLETED", F.col("date"))
            ).alias("last_completed"),
        )
        .orderBy("data_product")
        .collect()
    )
    lines.append("-" * 72)
    for r in summary:
        lines.append(
            f"{r.data_product:<40s} runs={r.n_runs} failed={r.n_failed}"
            f" last_completed={r.last_completed or '-'}"
        )
    return lines


def main(argv: list[str] | None = None) -> int:
    from ..session import get_session

    p = argparse.ArgumentParser(description="CDI job-state audit report")
    p.add_argument("state_path")
    p.add_argument("--product", default="")
    args = p.parse_args(argv)
    spark = get_session(app_name="cdi-state-report")
    for line in report(spark, args.state_path, args.product):
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
