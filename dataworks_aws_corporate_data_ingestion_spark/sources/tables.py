"""Loaders for the synthetic benchmark tables (see TESTDATA.md).

Parquet scans go through the vectorised native reader; callers `.select`
only what they need so Catalyst prunes columns down to the scan
(`ReadSchema` in explain output) -- at 100 TB the difference between
reading 2 columns and 11 is the job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS), which Spark's parquet reader
        # rejects; read it as raw nanos and rebuild a TIMESTAMP_NTZ with pure
        # epoch arithmetic (no session-timezone dependency, so results match
        # DuckDB's nanos->micros read under any driver timezone).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names=TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so `spark.sql` queries work."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
