"""Histogram quantile sketch (operators/histsketch.py): bin exactness
at boundaries, mergeability (sum of daily == one-shot), the rank
guarantee on adversarial mass distributions, and bin_for_rank edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.histsketch import (
    bin_for_rank,
    cents_bin,
    daily_histogram,
    merge_histograms,
)

NB, SPAN = 200, 50_000  # 200 bins over [0, 500.00)


class TestCentsBin:
    def test_boundaries_exact(self, spark):
        """Values sitting exactly on bin edges must land deterministically
        (edge belongs to the upper bin: cents*NB DIV SPAN)."""
        # bin width = 250 cents = 2.50; 2.50 -> bin 1, 2.49 -> bin 0
        vals = [(0.0,), (2.49,), (2.50,), (2.51,), (499.99,), (5000.0,)]
        df = spark.createDataFrame(vals, "value double")
        got = [
            r["b"]
            for r in df.select(
                cents_bin(F.col("value"), NB, SPAN).alias("b")
            ).collect()
        ]
        assert got == [0, 0, 1, 1, 199, 199]  # top bin clamps overflow

    def test_matches_duckdb_integer_div(self, spark):
        """The Spark bin expression must equal DuckDB's BIGINT // form
        on a dense value sweep -- the cross-engine exactness the
        certificate rests on."""
        import duckdb

        vals = [(i / 100.0,) for i in range(0, 50_200, 7)]
        df = spark.createDataFrame(vals, "value double")
        got = [
            r["b"]
            for r in df.select(
                cents_bin(F.col("value"), NB, SPAN).alias("b")
            ).orderBy("value")
            .collect()
        ]
        want = [
            r[0]
            for r in duckdb.sql(
                f"""SELECT LEAST(CAST(FLOOR(v*100) AS BIGINT) * {NB}
                            // {SPAN}, {NB-1}) AS b
                    FROM (SELECT unnest([{','.join(str(v[0]) for v in vals)}]) AS v)
                    ORDER BY v"""
            ).fetchall()
        ]
        assert got == want


class TestMergeability:
    def test_sum_of_daily_equals_one_shot(self, spark):
        import random

        rng = random.Random(5)
        rows = [
            (f"2024-01-{1 + rng.randrange(9):02d} 10:00:00", rng.random() * 500)
            for _ in range(5000)
        ]
        df = spark.createDataFrame(rows, "ts string, value double").select(
            F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
        )
        daily = daily_histogram(df, "ts", "value", NB, SPAN)
        merged = {
            (r["bin"]): r["n"] for r in merge_histograms(daily).collect()
        }
        oneshot = {
            r["b"]: r["n"]
            for r in df.select(
                cents_bin(F.col("value"), NB, SPAN).alias("b")
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .collect()
        }
        assert merged == oneshot
        assert sum(merged.values()) == 5000


class TestRankGuarantee:
    @pytest.mark.parametrize("q", [0.1, 0.5, 0.9, 0.99])
    def test_true_quantile_rank_inside_chosen_bin(self, spark, q):
        """On a lumpy distribution (mass piled on a few values) the
        selected bin must still bracket the target rank exactly."""
        import math

        vals = (
            [(1.0,)] * 1000 + [(250.0,)] * 3000 + [(499.0,)] * 500
            + [(float(i % 500),) for i in range(500)]
        )
        df = spark.createDataFrame(vals, "value double")
        daily = df.select(
            F.lit("2024-01-01").cast("timestamp_ntz").alias("ts"), "value"
        )
        merged = merge_histograms(
            daily_histogram(daily, "ts", "value", NB, SPAN)
        )
        bins = [(int(r["bin"]), int(r["n"])) for r in merged.collect()]
        n = sum(c for _, c in bins)
        rank = math.ceil(q * n)
        b = bin_for_rank(bins, rank)
        binc = cents_bin(F.col("value"), NB, SPAN)
        r = df.agg(
            F.count(F.when(binc < b, 1)).alias("below"),
            F.count(F.when(binc <= b, 1)).alias("upto"),
        ).collect()[0]
        assert r["below"] < rank <= r["upto"]

    def test_rank_overflow_raises(self):
        with pytest.raises(ValueError):
            bin_for_rank([(0, 10)], 11)

    def test_rank_walk_order_independent(self):
        bins = [(5, 10), (1, 20), (3, 5)]
        assert bin_for_rank(bins, 1) == 1
        assert bin_for_rank(bins, 20) == 1
        assert bin_for_rank(bins, 21) == 3
        assert bin_for_rank(bins, 26) == 5
        assert bin_for_rank(bins, 35) == 5


class TestGroupedHistogram:
    def test_grouped_daily_merge_equals_one_shot(self, spark):
        """Per-group daily sketches merged over days equal a direct
        per-group histogram of all rows; groups stay independent."""
        from datetime import datetime

        from dataworks_aws_corporate_data_ingestion_spark.operators.histsketch import (
            cents_bin,
            grouped_daily_histogram,
            merge_grouped_histograms,
        )
        from pyspark.sql import functions as F

        rows = [
            (g, datetime(2024, 1, day, 9), float(v))
            for g, vals in [("a", [5, 15, 95]), ("b", [45, 45, 999])]
            for day, v in zip((1, 2, 3), vals)
        ]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp_ntz, value double"
        )
        daily = grouped_daily_histogram(df, "g", "ts", "value", 10, 10_000)
        merged = merge_grouped_histograms(daily)
        direct = (
            df.select(
                "g", cents_bin(F.col("value"), 10, 10_000).alias("bin")
            )
            .groupBy("g", "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        assert (
            merged.exceptAll(direct).count()
            + direct.exceptAll(merged).count()
            == 0
        )
        # per-day rows bounded by bins, and day decomposition is exact
        assert daily.count() == 6  # one (g, day, bin) row per input here
