"""Count-Min Sketch (operators/cms.py): the never-undercount guarantee
on collision-heavy data, the addition algebra (merge of arbitrary
splits == one-shot sketch), stored-index maintenance (append==rebuild,
param pinning), and row-mass conservation."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.cms import (
    append_to_cms_daily,
    cms_daily_sketch,
    cms_point_estimates,
    cms_sketch,
    load_cms_daily,
    materialize_cms_daily,
    merge_cms,
)

pytestmark = pytest.mark.slow

W, D = 8, 3  # tiny width: collisions guaranteed


def _keyed(spark, n_keys=50, reps=3):
    rows = [(f"k{i}",) for i in range(n_keys) for _ in range(i % reps + 1)]
    return spark.createDataFrame(rows, "key string")


class TestCms:
    def test_estimates_never_undercount_and_exact_mass(self, spark):
        df = _keyed(spark)
        sketch = cms_sketch(df, "key", W, D).localCheckpoint(eager=True)
        n = df.count()
        # row-mass conservation: every row of the sketch sums to n
        masses = [
            int(r["m"])
            for r in sketch.groupBy("row").agg(F.sum("c").alias("m")).collect()
        ]
        assert len(masses) == D and all(m == n for m in masses)
        est = {
            r["key"]: r["est"]
            for r in cms_point_estimates(
                sketch, df.distinct(), "key", W, D
            ).collect()
        }
        true = {
            r["key"]: r["n"]
            for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()
        }
        assert est.keys() == true.keys()
        assert all(est[k] >= true[k] for k in true)
        # with w=8 over 50 keys, SOME collision overcount must exist
        assert any(est[k] > true[k] for k in true)

    def test_unseen_key_can_only_overcount(self, spark):
        df = _keyed(spark)
        sketch = cms_sketch(df, "key", W, D)
        probes = spark.createDataFrame([("never-seen",)], "key string")
        est = cms_point_estimates(sketch, probes, "key", W, D).collect()
        assert est[0]["est"] >= 0

    def test_merge_of_any_split_equals_one_shot(self, spark):
        df = _keyed(spark).withColumn(
            "part", F.conv(F.substring(F.md5("key"), 1, 4), 16, 10) % 3
        )
        parts = [
            cms_sketch(df.filter(F.col("part") == i), "key", W, D)
            for i in range(3)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        merged = u.groupBy("row", "col").agg(
            F.sum("c").cast("bigint").alias("c")
        )
        one_shot = cms_sketch(df, "key", W, D)
        assert (
            merged.exceptAll(one_shot).count()
            + one_shot.exceptAll(merged).count()
            == 0
        )


class TestStoredIndex:
    def _events(self, spark):
        rows = [
            (datetime(2024, 1, day, 8 + i % 4), f"k{i % 9}")
            for day in (1, 2, 3)
            for i in range(20)
        ]
        return spark.createDataFrame(rows, "ts timestamp_ntz, key string")

    def test_append_equals_rebuild_and_params_pinned(self, spark):
        try:
            e = self._events(spark)
            first = e.filter(F.col("ts") < F.lit("2024-01-03").cast(
                "timestamp_ntz"
            ))
            rest = e.filter(F.col("ts") >= F.lit("2024-01-03").cast(
                "timestamp_ntz"
            ))
            materialize_cms_daily(spark, first, "ts", "key", "t_cms1", W, D)
            append_to_cms_daily(spark, rest, "ts", "key", "t_cms1")
            daily, w, d = load_cms_daily(spark, "t_cms1")
            assert (w, d) == (W, D)
            rebuild = cms_daily_sketch(e, "ts", "key", W, D)
            assert (
                daily.exceptAll(rebuild).count()
                + rebuild.exceptAll(daily).count()
                == 0
            )
            # the merged state answers like a one-shot corpus sketch
            merged = merge_cms(daily)
            one_shot = cms_sketch(e.select("key"), "key", W, D)
            assert (
                merged.exceptAll(one_shot).count()
                + one_shot.exceptAll(merged).count()
                == 0
            )
        finally:
            spark.sql("DROP TABLE IF EXISTS t_cms1")


class TestWeightedCms:
    def test_weighted_never_undercounts_and_mass_conserves(self, spark):
        """Value-mass sketch: a rare-by-rows but heavy-by-weight whale
        key must estimate >= its true mass; every sketch row's total
        equals the corpus weight sum."""
        rows = [("whale", 5000)] + [(f"u{i}", 3) for i in range(40)]
        df = spark.createDataFrame(rows, "key string, w long")
        sketch = cms_sketch(df, "key", W, D, weight_col="w").localCheckpoint(
            eager=True
        )
        total = sum(w for _, w in rows)
        masses = [
            int(r["m"])
            for r in sketch.groupBy("row").agg(F.sum("c").alias("m")).collect()
        ]
        assert len(masses) == D and all(m == total for m in masses)
        est = {
            r["key"]: r["est"]
            for r in cms_point_estimates(
                sketch, df.select("key").distinct(), "key", W, D
            ).collect()
        }
        true = {k: 0 for k, _ in rows}
        for k, w in rows:
            true[k] += w
        assert all(est[k] >= true[k] for k in true)
        assert est["whale"] >= 5000
