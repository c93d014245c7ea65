"""Salting and two-phase distinct must be invisible in the results --
every test compares against the naive formulation on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.skew import (
    distinct_count_twophase,
    salted_join,
)


class TestSaltedJoin:
    def test_equals_plain_join_on_skewed_data(self, spark):
        # one hot key (90% of rows) + a tail
        big = spark.createDataFrame(
            [(1, i) for i in range(900)] + [(k, k * 1000) for k in range(2, 102)],
            "k bigint, payload bigint",
        )
        small = spark.createDataFrame(
            [(k, f"dim-{k}") for k in range(1, 102)], "k bigint, label string"
        )
        got = salted_join(big, small, on=["k"], salt_buckets=4, big_salt_src="payload")
        want = big.join(small, ["k"])
        assert got.count() == want.count() == 1000
        assert (
            sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        )

    def test_missing_small_keys_drop_like_inner_join(self, spark):
        big = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, payload bigint")
        small = spark.createDataFrame([(1, "x")], "k bigint, label string")
        got = salted_join(big, small, on=["k"], salt_buckets=3)
        assert [tuple(r) for r in got.collect()] == [(1, 10, "x")]


class TestDistinctTwoPhase:
    def test_equals_count_distinct(self, spark):
        df = spark.createDataFrame(
            [("a", i % 7) for i in range(500)] + [("b", i % 3) for i in range(50)],
            "g string, v bigint",
        )
        got = {
            r["g"]: r["n_distinct"]
            for r in distinct_count_twophase(df, ["g"], "v").collect()
        }
        want = {
            r["g"]: r["nd"]
            for r in df.groupBy("g").agg(F.countDistinct("v").alias("nd")).collect()
        }
        assert got == want == {"a": 7, "b": 3}
