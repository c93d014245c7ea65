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


class TestAutoSkewJoin:
    """auto_skew_join: detected hot keys take the salted path, cold
    keys the plain path, result bit-identical to the plain join."""

    def _mk(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        for i in range(4000):
            key = "hot" if rng.random() < 0.4 else f"c{rng.randrange(300)}"
            rows.append((i, key))
        big = spark.createDataFrame(rows, "rid bigint, k string").repartition(6)
        small = spark.createDataFrame(
            [("hot", 100)] + [(f"c{i}", i) for i in range(300)],
            "k string, attr long",
        )
        return big, small

    def test_equals_plain_join(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.skew import auto_skew_join

        big, small = self._mk(spark)
        got = sorted(
            (r["rid"], r["k"], r["attr"])
            for r in auto_skew_join(
                big, small, ["k"], k=15, salt_buckets=4,
                big_salt_src="rid",
            ).collect()
        )
        want = sorted(
            (r["rid"], r["k"], r["attr"])
            for r in big.join(small, "k", "inner").collect()
        )
        assert got == want
        assert len(got) == 4000

    def test_no_hot_keys_everything_cold(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.skew import auto_skew_join

        big = spark.createDataFrame(
            [(i, f"k{i % 500}") for i in range(2000)], "rid bigint, k string"
        ).repartition(4)
        small = spark.createDataFrame(
            [(f"k{i}", i) for i in range(500)], "k string, attr long"
        )
        out = auto_skew_join(big, small, ["k"], k=15, big_salt_src="rid")
        assert out.count() == 2000

    def test_all_rows_one_key(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.skew import auto_skew_join

        big = spark.createDataFrame(
            [(i, "only") for i in range(1000)], "rid bigint, k string"
        ).repartition(4)
        small = spark.createDataFrame([("only", 1)], "k string, attr long")
        out = auto_skew_join(big, small, ["k"], k=7, big_salt_src="rid")
        assert out.count() == 1000
