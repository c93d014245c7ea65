"""Bucketed tables must deliver what they exist for: the join on the
bucket key plans WITHOUT an Exchange on either side."""

from __future__ import annotations

import pytest

from dataworks_aws_corporate_data_ingestion_spark.sinks.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark):
    orders = spark.createDataFrame(
        [(i, i % 50, float(i)) for i in range(1000)],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double",
    )
    lines = spark.createDataFrame(
        [(i % 1000, i, float(i) / 2) for i in range(3000)],
        "l_orderkey bigint, l_linenumber bigint, l_extendedprice double",
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        lines.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lines",
        ["o_orderkey"],
        8,
    )
    yield "b_orders", "b_lines"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


class TestBucketedJoin:
    def test_no_exchange_in_bucketed_join(self, spark, bucketed_tables):
        left, right = bucketed_tables
        # disable auto-broadcast so the test proves bucketing (not a
        # broadcast) removed the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = bucketed_join(spark, left, right, ["o_orderkey"])
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_join_result_correct(self, spark, bucketed_tables):
        left, right = bucketed_tables
        df = bucketed_join(spark, left, right, ["o_orderkey"])
        assert df.count() == 3000  # every line matches exactly one order

    def test_bucketed_aggregate_skips_exchange(self, spark, bucketed_tables):
        left, _ = bucketed_tables
        agg = (
            spark.table(left)
            .groupBy("o_orderkey")
            .sum("o_totalprice")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
