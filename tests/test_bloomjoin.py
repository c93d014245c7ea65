"""Bloom-pruned joins: the no-false-negative property that makes the
exact-verify contract sound, semi/anti equality with plain joins under
forced false positives, null-key join semantics, and sizing guards."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.bloomjoin import (
    BloomFilter,
    bloom_anti_join,
    bloom_classify,
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


def _keys_df(spark, keys, parts=4):
    return spark.createDataFrame([(k,) for k in keys], "k string").repartition(
        parts
    )


class TestBuildBloom:
    def test_m_bits_must_be_word_aligned(self, spark):
        with pytest.raises(ValueError):
            build_bloom(_keys_df(spark, ["a"]), "k", m_bits=100)

    def test_empty_ref_sets_no_bits(self, spark):
        bf = build_bloom(
            spark.createDataFrame([], "k string"), "k", m_bits=1 << 10
        )
        assert bf.n_set_bits == 0

    def test_set_bits_bounded_by_hashes_times_keys(self, spark):
        bf = build_bloom(
            _keys_df(spark, [f"r{i}" for i in range(100)]),
            "k",
            m_bits=1 << 14,
            n_hashes=5,
        )
        assert 0 < bf.n_set_bits <= 500

    def test_deterministic_across_builds_and_partitionings(self, spark):
        keys = [f"r{i}" for i in range(200)]
        a = build_bloom(_keys_df(spark, keys, parts=1), "k", m_bits=1 << 12)
        b = build_bloom(_keys_df(spark, keys, parts=16), "k", m_bits=1 << 12)
        assert (a.words == b.words).all()


class TestNoFalseNegatives:
    @pytest.mark.parametrize("m_bits", [64, 1 << 10, 1 << 16])
    def test_every_ref_key_probes_positive(self, spark, m_bits):
        """The soundness property the exact-verify contract rests on,
        checked down to a deliberately undersized 64-bit table where
        nearly every probe collides."""
        keys = [f"key_{i}" for i in range(300)]
        ref = _keys_df(spark, keys)
        bf = build_bloom(ref, "k", m_bits=m_bits, n_hashes=4)
        hits = bloom_might_contain(ref, "k", bf).filter(~F.col("__bf_hit"))
        assert hits.count() == 0


class TestSemiAntiEquality:
    @pytest.mark.parametrize(
        "m_bits", [64, 1 << 8, 1 << 16]
    )  # 64 forces heavy false positives; exactness must survive
    def test_matches_plain_joins(self, spark, m_bits):
        rng = random.Random(13)
        big_keys = [f"k{rng.randrange(500)}" for _ in range(2000)]
        ref_keys = [f"k{i}" for i in range(0, 500, 3)]
        big = _keys_df(spark, big_keys, parts=8)
        ref = _keys_df(spark, ref_keys, parts=2)
        semi = bloom_semi_join(big, ref, "k", m_bits=m_bits)
        anti = bloom_anti_join(big, ref, "k", m_bits=m_bits)
        exact_semi = big.join(ref.distinct(), "k", "left_semi")
        exact_anti = big.join(ref.distinct(), "k", "left_anti")
        # multiset equality: duplicates in `big` must be preserved
        def multiset(df):
            return sorted(r["k"] for r in df.collect())

        assert multiset(semi) == multiset(exact_semi)
        assert multiset(anti) == multiset(exact_anti)
        assert semi.count() + anti.count() == big.count()

    def test_disjoint_sides_anti_is_identity(self, spark):
        big = _keys_df(spark, [f"a{i}" for i in range(100)])
        ref = _keys_df(spark, [f"b{i}" for i in range(100)])
        assert bloom_semi_join(big, ref, "k").count() == 0
        assert bloom_anti_join(big, ref, "k").count() == 100

    def test_empty_ref(self, spark):
        big = _keys_df(spark, ["x", "y", "z"])
        empty = spark.createDataFrame([], "k string")
        assert bloom_semi_join(big, empty, "k").count() == 0
        assert bloom_anti_join(big, empty, "k").count() == 3

    def test_null_keys_follow_join_semantics(self, spark):
        """SQL joins never match on NULL: a null-keyed big row belongs
        to the anti side and never the semi side, bloom or no bloom."""
        big = spark.createDataFrame(
            [("a",), (None,), ("b",), (None,)], "k string"
        )
        ref = spark.createDataFrame([("a",), (None,)], "k string")
        semi = [r["k"] for r in bloom_semi_join(big, ref, "k").collect()]
        anti = [r["k"] for r in bloom_anti_join(big, ref, "k").collect()]
        assert semi == ["a"]
        assert sorted(anti, key=lambda v: (v is None, v)) == ["b", None, None]

    @pytest.mark.parametrize("m_bits", [64, 1 << 12])
    def test_classify_matches_exists_semantics(self, spark, m_bits):
        """bloom_classify must reproduce the left-join EXISTS flag for
        every row -- including duplicates and NULL keys -- even when
        the undersized table forces ~100% false positives."""
        big = spark.createDataFrame(
            [("a",), ("a",), ("b",), (None,), ("c",)], "k string"
        )
        ref = spark.createDataFrame([("a",), ("c",), (None,)], "k string")
        out = bloom_classify(big, ref, "k", m_bits=m_bits, out_col="hit")
        got = sorted(
            ((r["k"] or ""), r["hit"]) for r in out.collect()
        )
        assert got == [("", False), ("a", True), ("a", True),
                       ("b", False), ("c", True)]

    def test_distinct_key_names(self, spark):
        big = spark.createDataFrame([("a", 1), ("c", 2)], "k string, v long")
        ref = spark.createDataFrame([("a",), ("b",)], "rk string")
        out = bloom_semi_join(big, ref, "k", ref_key="rk")
        assert [(r["k"], r["v"]) for r in out.collect()] == [("a", 1)]


class TestStoredBloomIndex:
    def _cleanup(self, spark, prefix):
        for t in (f"{prefix}_bloom", f"{prefix}_bloommeta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    def test_append_equals_rebuild_word_for_word(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.bloomjoin import (
            append_to_bloom_index,
            load_bloom_index,
            materialize_bloom_index,
        )

        try:
            base = _keys_df(spark, [f"k{i}" for i in range(200)])
            delta = _keys_df(spark, [f"d{i}" for i in range(50)])
            materialize_bloom_index(spark, base, "k", "t_bf1", m_bits=1 << 12)
            append_to_bloom_index(spark, delta, "k", "t_bf1")
            stored = load_bloom_index(spark, "t_bf1")
            rebuilt = build_bloom(
                base.unionByName(delta), "k", m_bits=1 << 12, n_hashes=5
            )
            assert (stored.words == rebuilt.words).all()
            assert stored.m_bits == 1 << 12 and stored.n_hashes == 5
        finally:
            self._cleanup(spark, "t_bf1")

    def test_replayed_append_is_idempotent(self, spark):
        """OR is idempotent: appending the same delta twice (an
        at-least-once replay) must leave the loaded words unchanged."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.bloomjoin import (
            append_to_bloom_index,
            load_bloom_index,
            materialize_bloom_index,
        )

        try:
            base = _keys_df(spark, [f"k{i}" for i in range(100)])
            delta = _keys_df(spark, [f"d{i}" for i in range(30)])
            materialize_bloom_index(spark, base, "k", "t_bf2", m_bits=1 << 12)
            append_to_bloom_index(spark, delta, "k", "t_bf2")
            w1 = load_bloom_index(spark, "t_bf2").words.copy()
            append_to_bloom_index(spark, delta, "k", "t_bf2")
            w2 = load_bloom_index(spark, "t_bf2").words
            assert (w1 == w2).all()
        finally:
            self._cleanup(spark, "t_bf2")

    def test_empty_delta_append_is_noop(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.bloomjoin import (
            append_to_bloom_index,
            load_bloom_index,
            materialize_bloom_index,
        )

        try:
            base = _keys_df(spark, ["a", "b"])
            materialize_bloom_index(spark, base, "k", "t_bf3", m_bits=1 << 10)
            w1 = load_bloom_index(spark, "t_bf3").words.copy()
            append_to_bloom_index(
                spark, spark.createDataFrame([], "k string"), "k", "t_bf3"
            )
            w2 = load_bloom_index(spark, "t_bf3").words
            assert (w1 == w2).all()
        finally:
            self._cleanup(spark, "t_bf3")


class TestProbePlanShape:
    def test_probe_is_vectorised_not_row_at_a_time(self, spark):
        """The probe must compile to an Arrow-batched python eval
        (ArrowEvalPython), never the row-at-a-time BatchEvalPython the
        plan guard bans engine-wide."""
        big = _keys_df(spark, [f"k{i}" for i in range(100)], parts=4)
        ref = _keys_df(spark, ["k1", "k2"], parts=1)
        plan = bloom_semi_join(big, ref, "k")._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" in plan
