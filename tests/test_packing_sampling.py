"""Invariants for the non-relational training-data operators: packing
(every doc exactly once, budget respected, deterministic) and
hash-sampling (stability under growth, split disjointness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.packing import pack_sequences
from dataworks_aws_corporate_data_ingestion_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    stratified_sample,
)


def _docs(spark, n=500, seed_mod=97):
    return spark.createDataFrame(
        [(i, 1 + (i * i) % seed_mod) for i in range(n)],
        "doc_id bigint, n_tokens bigint",
    )


class TestPacking:
    def test_every_doc_packed_exactly_once(self, spark):
        d = _docs(spark)
        packs = pack_sequences(d, budget=128).collect()
        seen = [i for r in packs for i in r["doc_ids"]]
        assert sorted(seen) == list(range(500))

    def test_budget_respected_except_oversize_singletons(self, spark):
        d = spark.createDataFrame(
            [(1, 50), (2, 60), (3, 200), (4, 10)],
            "doc_id bigint, n_tokens bigint",
        )
        packs = pack_sequences(d, budget=128, n_buckets=1).collect()
        for r in packs:
            if r["n_docs"] > 1:
                assert r["total_tokens"] <= 128
        # the oversize doc gets its own pack
        solo = [r for r in packs if r["doc_ids"] == [3]]
        assert len(solo) == 1 and solo[0]["total_tokens"] == 200

    def test_deterministic(self, spark):
        d = _docs(spark, n=300)
        a = sorted(map(tuple, pack_sequences(d, budget=96).collect()))
        b = sorted(map(tuple, pack_sequences(d, budget=96).collect()))
        assert a == b

    def test_fill_ratio_reasonable(self, spark):
        d = _docs(spark)
        packs = pack_sequences(d, budget=128, n_buckets=4).collect()
        avg_fill = sum(r["fill_ratio"] for r in packs) / len(packs)
        assert avg_fill > 0.8, f"FFD should pack tightly, got {avg_fill}"

    def test_residual_merge_recovers_global_fill(self, spark):
        """Per-bucket FFD strands ~half a pack per bucket; the one-task
        residual re-pack must recover (measured sf0.1: 0.89 -> 0.99 at
        32 buckets).  Here: many buckets over few docs exaggerates the
        stranding, and the recovered fill must match global FFD's pack
        count."""
        d = _docs(spark)
        global_packs = pack_sequences(d, budget=128, n_buckets=1).count()
        naive = pack_sequences(d, budget=128, n_buckets=16).count()
        merged = pack_sequences(
            d, budget=128, n_buckets=16, residual_threshold=0.85
        ).count()
        assert naive > global_packs  # stranding is real at this shape
        assert merged < naive
        # within 3% of global FFD (packs >= 0.85 fill are never dissolved,
        # so exact parity isn't guaranteed on tiny corpora)
        assert merged - global_packs <= max(2, global_packs * 3 // 100)

    def test_residual_merge_keeps_invariants(self, spark):
        d = _docs(spark)
        packs = pack_sequences(
            d, budget=128, n_buckets=16, residual_threshold=0.85
        ).collect()
        seen = sorted(i for r in packs for i in r["doc_ids"])
        assert seen == list(range(500))  # every doc exactly once
        for r in packs:
            assert r["doc_tokens"] is not None
            assert sum(r["doc_tokens"]) == r["total_tokens"]
            if r["n_docs"] > 1:
                assert r["total_tokens"] <= 128


class TestSampling:
    def test_sample_stable_under_growth(self, spark):
        small = _docs(spark, n=200)
        big = _docs(spark, n=400)
        s_small = {r["doc_id"] for r in deterministic_sample(small, "doc_id", 6554).collect()}
        s_big = {r["doc_id"] for r in deterministic_sample(big, "doc_id", 6554).collect()}
        # membership of existing rows never changes when the corpus grows
        assert s_small == {i for i in s_big if i < 200}

    def test_split_partitions_all_rows(self, spark):
        d = _docs(spark, n=1000)
        rows = assign_split(d, "doc_id").collect()
        assert len(rows) == 1000
        by_split = {}
        for r in rows:
            by_split.setdefault(r["split"], set()).add(r["doc_id"])
        assert set(by_split) == {"train", "val", "test"}
        total = sum(len(v) for v in by_split.values())
        assert total == 1000  # disjoint + exhaustive
        assert len(by_split["train"]) > 800  # ~90%

    def test_stratified_sample_per_stratum_fractions(self, spark):
        d = spark.createDataFrame(
            [(i, "a" if i % 2 else "b") for i in range(2000)],
            "doc_id bigint, src string",
        )
        kept = stratified_sample(
            d, "doc_id", "src", fractions={"a": 0xE000}, default_num=0x2000
        ).collect()
        by_src = {}
        for r in kept:
            by_src.setdefault(r["src"], set()).add(r["doc_id"])
        # ~87.5% of stratum a, ~12.5% of stratum b
        assert 780 < len(by_src["a"]) < 960
        assert 70 < len(by_src["b"]) < 190

    def test_stratified_membership_matches_flat_sample(self, spark):
        """A row's fate depends only on (salt, key) and its own stratum's
        fraction -- stratified with fraction f must equal the flat sample
        at f restricted to that stratum."""
        d = spark.createDataFrame(
            [(i, "a" if i % 3 else "b") for i in range(900)],
            "doc_id bigint, src string",
        )
        strat = {
            r["doc_id"]
            for r in stratified_sample(
                d, "doc_id", "src", fractions={"a": 0x4000}, default_num=0
            ).collect()
        }
        flat = {
            r["doc_id"]
            for r in deterministic_sample(
                d.filter(F.col("src") == "a"), "doc_id", 0x4000
            ).collect()
        }
        assert strat == flat


class TestTokenBudgetMixture:
    def _docs(self, spark):
        rows = [
            (i, "src0" if i % 3 == 0 else "srcX", 10 + (i % 5))
            for i in range(300)
        ]
        return spark.createDataFrame(
            rows, "doc_id bigint, source string, n_tokens bigint"
        )

    def test_rates_derive_from_budgets(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.sampling import (
            token_budget_mixture,
        )

        d = self._docs(spark)
        totals = {
            r["source"]: r["t"]
            for r in d.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        }
        # src0 budget >= its total -> passes through whole;
        # srcX sampled at ~budget/total
        kept = token_budget_mixture(
            d, budgets={"src0": totals["src0"]}, default_budget=totals["srcX"] // 4
        )
        by_src = {
            r["source"]: (r["n"], r["toks"])
            for r in kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks"))
            .collect()
        }
        assert by_src["src0"][0] == 100  # every src0 doc kept
        # sampled source: kept tokens within sampling noise of the budget
        budget = totals["srcX"] // 4
        assert 0.4 * budget <= by_src["srcX"][1] <= 1.8 * budget

    def test_deterministic_and_subset(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.sampling import (
            token_budget_mixture,
        )

        d = self._docs(spark)
        a = {r["doc_id"] for r in token_budget_mixture(d, {}, 300).collect()}
        b = {r["doc_id"] for r in token_budget_mixture(d, {}, 300).collect()}
        assert a == b and 0 < len(a) < 300
        # raising the budget only ADDS docs (thresholds are monotone)
        bigger = {r["doc_id"] for r in token_budget_mixture(d, {}, 600).collect()}
        assert a <= bigger


class TestProfileColumns:
    def test_nulls_distincts_minmax(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.profile import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b"), (4, "a")], "k long, s string"
        )
        got = {
            r["column_name"]: r.asDict()
            for r in profile_columns(df, ["k", "s"]).collect()
        }
        assert got["k"] == {
            "column_name": "k", "n_rows": 4, "n_nulls": 0, "n_distinct": 4,
            "min_value": "1", "max_value": "4",
        }
        assert got["s"] == {
            "column_name": "s", "n_rows": 4, "n_nulls": 1, "n_distinct": 2,
            "min_value": "a", "max_value": "b",
        }
