"""Misra-Gries heavy hitters: the superset guarantee under adversarial
data (key cardinality >> k), exact-verify equality with the plain
groupBy, and the trim rule itself."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.heavyhitters import (
    _mg_reduce,
    heavy_hitters_exact,
    mg_candidates,
)


def _exact_heavy(rows: list, k: int) -> dict[tuple, int]:
    """Ground truth: keys with freq strictly > n/(k+1), via plain python."""
    counts: dict[tuple, int] = {}
    for r in rows:
        counts[r] = counts.get(r, 0) + 1
    n = len(rows)
    return {key: c for key, c in counts.items() if c * (k + 1) > n}


def _adversarial_stream(seed: int, n_noise_keys: int, n_rows: int) -> list[str]:
    """Three planted heavy keys buried in a long tail of near-unique
    noise keys -- the regime where a naive top-k-per-partition sample
    misses and Misra-Gries must not."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        r = rng.random()
        if r < 0.20:
            rows.append("heavy_a")
        elif r < 0.35:
            rows.append("heavy_b")
        elif r < 0.45:
            rows.append("heavy_c")
        else:
            rows.append(f"noise_{rng.randrange(n_noise_keys)}")
    return rows


class TestMGReduce:
    def test_no_trim_under_k(self):
        s = {("a",): 5, ("b",): 3}
        assert _mg_reduce(dict(s), 4) == s

    def test_trim_subtracts_k_plus_1th_largest(self):
        s = {("a",): 10, ("b",): 7, ("c",): 3, ("d",): 3}
        # k=2: (k+1)-th largest = 3; subtract 3, drop non-positive
        assert _mg_reduce(s, 2) == {("a",): 7, ("b",): 4}

    def test_trim_to_at_most_k(self):
        s = {(i,): 100 + i for i in range(50)}
        out = _mg_reduce(s, 8)
        assert len(out) <= 8
        # survivors are the largest counters
        assert set(out) == {(i,) for i in range(42, 50)}


class TestMGCandidatesSuperset:
    @pytest.mark.parametrize("seed", [1, 7, 42])
    def test_candidates_cover_all_true_heavy(self, spark, seed):
        rows = _adversarial_stream(seed, n_noise_keys=5000, n_rows=20000)
        k = 15
        truth = _exact_heavy([(r,) for r in rows], k)
        assert truth, "fixture must plant at least one heavy key"
        df = spark.createDataFrame(
            [(r,) for r in rows], "key string"
        ).repartition(8)
        cands = {
            (r["key"],) for r in mg_candidates(df, ["key"], k).collect()
        }
        assert set(truth) <= cands
        # bounded output: <= k per partition
        assert len(cands) <= k * 8

    def test_multi_column_keys(self, spark):
        rows = [("x", i % 3) for i in range(600)] + [
            ("y", i) for i in range(400)
        ]
        df = spark.createDataFrame(rows, "a string, b long").repartition(4)
        k = 7
        truth = _exact_heavy(rows, k)
        cands = {
            (r["a"], r["b"]) for r in mg_candidates(df, ["a", "b"], k).collect()
        }
        assert set(truth) <= cands


class TestHeavyHittersExact:
    @pytest.mark.parametrize("k", [3, 15, 63])
    def test_equals_plain_groupby_having(self, spark, k):
        rows = _adversarial_stream(99, n_noise_keys=2000, n_rows=10000)
        truth = _exact_heavy([(r,) for r in rows], k)
        df = spark.createDataFrame(
            [(r,) for r in rows], "key string"
        ).repartition(8)
        got = {
            (r["key"],): r["n_rows"]
            for r in heavy_hitters_exact(df, ["key"], k).collect()
        }
        assert got == truth

    def test_partitioning_invariance(self, spark):
        """The exact result must not depend on how the data is split."""
        rows = _adversarial_stream(5, n_noise_keys=300, n_rows=5000)
        k = 9
        results = []
        for parts in (1, 3, 16):
            df = spark.createDataFrame(
                [(r,) for r in rows], "key string"
            ).repartition(parts)
            res = heavy_hitters_exact(df, ["key"], k)
            results.append(
                sorted((r["key"], r["n_rows"]) for r in res.collect())
            )
        assert results[0] == results[1] == results[2]

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "key string")
        assert heavy_hitters_exact(df, ["key"], 4).collect() == []

    def test_uniform_data_no_heavy(self, spark):
        rows = [(f"k{i}",) for i in range(1000)]
        df = spark.createDataFrame(rows, "key string").repartition(4)
        assert heavy_hitters_exact(df, ["key"], 10).collect() == []

    def test_single_key_stream(self, spark):
        df = spark.createDataFrame([("only",)] * 500, "key string")
        got = heavy_hitters_exact(df, ["key"], 1).collect()
        assert [(r["key"], r["n_rows"]) for r in got] == [("only", 500)]


class TestExactTopKGuard:
    def test_raises_when_guarantee_cannot_hold(self, spark, monkeypatch):
        """top_frequent_cells_exact_topk must refuse (not silently
        mis-rank) when the 10th count is below n/(k+1).  Uniform data
        over many keys puts every count under the threshold."""
        import dataworks_aws_corporate_data_ingestion_spark.workloads.approx_exact as ax

        rows = [(f"t{i % 500}", i % 7) for i in range(5000)]
        uniform = spark.createDataFrame(
            rows, "event_type string, user_bucket long"
        ).withColumn("user_id", F.col("user_bucket"))

        def fake_load(s, name, sf_dir):
            assert name == "events"
            return uniform

        monkeypatch.setattr(ax, "load_table", fake_load)
        with pytest.raises(AssertionError, match="guarantee violated"):
            ax.top_frequent_cells_exact_topk(spark, "unused")


class TestWeightedHeavyHitters:
    def _exact_weighted(self, rows: list[tuple[str, int]], k: int):
        sums: dict[str, int] = {}
        for key, w in rows:
            sums[key] = sums.get(key, 0) + w
        total = sum(w for _, w in rows)
        return {
            key: s for key, s in sums.items() if s * (k + 1) > total
        }

    def test_planted_heavy_weight_key(self, spark):
        """A key that is RARE by row count but heavy by weight must be
        found -- the case the frequency form structurally misses."""
        rng = random.Random(3)
        rows = [("whale", 5000)] * 4 + [
            (f"fish_{rng.randrange(1000)}", rng.randrange(1, 10))
            for _ in range(8000)
        ]
        k = 9
        truth = self._exact_weighted(rows, k)
        assert "whale" in truth
        df = spark.createDataFrame(rows, "key string, w long").repartition(8)
        got = {
            r["key"]: r["n_rows"]
            for r in heavy_hitters_exact(
                df, ["key"], k, weight_col="w"
            ).collect()
        }
        assert got == truth

    def test_zero_weights_are_inert(self, spark):
        rows = [("a", 10)] * 5 + [("z", 0)] * 100
        df = spark.createDataFrame(rows, "key string, w long").repartition(4)
        got = {
            r["key"]: r["n_rows"]
            for r in heavy_hitters_exact(
                df, ["key"], 3, weight_col="w"
            ).collect()
        }
        assert got == {"a": 50}

    def test_weighted_partitioning_invariance(self, spark):
        rng = random.Random(11)
        rows = [
            (f"k{rng.randrange(40)}", rng.randrange(1, 100))
            for _ in range(3000)
        ]
        results = []
        for parts in (1, 5, 13):
            df = spark.createDataFrame(
                rows, "key string, w long"
            ).repartition(parts)
            res = heavy_hitters_exact(df, ["key"], 15, weight_col="w")
            results.append(
                sorted((r["key"], r["n_rows"]) for r in res.collect())
            )
        assert results[0] == results[1] == results[2]
        assert results[0] == sorted(
            self._exact_weighted(rows, 15).items()
        )


class TestGroupedMgSummaries:
    def test_group_heavy_but_globally_light_key_survives(self, spark):
        """The per-group guarantee, distinct from plain mg_summary: a
        key holding 60% of a SMALL day while a huge other day drowns it
        globally must survive its day's summary."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.heavyhitters import (
            mg_summary_by_group,
        )

        k = 3
        rows = (
            [("d1", "niche")] * 6 + [("d1", f"x{i}") for i in range(4)]
            + [("d2", f"y{i % 40}") for i in range(400)]
        )
        df = spark.createDataFrame(rows, "day string, key string").repartition(
            4
        )
        out = mg_summary_by_group(df, "day", ["key"], k).collect()
        d1_keys = {r["key"] for r in out if r["day"] == "d1"}
        assert "niche" in d1_keys  # 60% of d1 >> 1/(k+1)
        # and per (partition, group) the summary stays k-bounded:
        # folding to one row per (day, key) can never exceed k x n_parts
        from collections import Counter

        per_day = Counter(r["day"] for r in out)
        assert per_day["d1"] <= k * 4

    def test_window_union_is_superset_of_window_heavy(self, spark):
        """Pigeonhole composition: a key heavy over a two-day window
        must appear in at least one day's survivors."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.heavyhitters import (
            mg_summary_by_group,
        )

        k = 3
        rows = (
            [("d1", "w")] * 30 + [("d1", f"a{i}") for i in range(40)]
            + [("d2", "w")] * 30 + [("d2", f"b{i}") for i in range(40)]
        )
        # w holds 60/140 ~ 43% of the window > 1/(k+1) = 25%
        df = spark.createDataFrame(rows, "day string, key string").repartition(
            5
        )
        out = mg_summary_by_group(df, "day", ["key"], k).collect()
        assert "w" in {r["key"] for r in out}

    def test_weighted_mode_tracks_mass(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.heavyhitters import (
            mg_summary_by_group,
        )

        rows = [("d1", "whale", 900)] + [
            ("d1", f"u{i}", 2) for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "day string, key string, wt long"
        ).repartition(3)
        out = mg_summary_by_group(df, "day", ["key"], 2, weight_col="wt")
        assert "whale" in {r["key"] for r in out.collect()}
