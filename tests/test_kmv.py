"""KMV bottom-k sketches: estimator accuracy on known cardinalities,
lossless signature mergeability, degenerate exactness under k distinct
elements, and Jaccard estimation on planted overlaps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.kmv import (
    kmv_estimate,
    kmv_signature,
    kmv_union_jaccard,
)

K = 256


def _set_df(spark, set_id: str, lo: int, hi: int, parts=4):
    """Distinct elements f'e{lo}'..f'e{hi-1}' labelled set_id, with
    planted duplicates (each element appears twice) so the sketch must
    actually deduplicate."""
    return (
        spark.range(lo, hi)
        .union(spark.range(lo, hi))
        .select(
            F.lit(set_id).alias("s"),
            F.concat(F.lit("e"), F.col("id")).alias("e"),
        )
        .repartition(parts)
    )


class TestSignature:
    def test_at_most_k_rows_sorted_smallest(self, spark):
        df = _set_df(spark, "a", 0, 5000)
        sig = kmv_signature(df, "s", "e", K)
        rows = sig.collect()
        assert len(rows) == K
        # the signature must be exactly the k smallest distinct hashes
        all_h = sorted(
            r["h"]
            for r in df.select(
                F.col("e")
            )
            .distinct()
            .select(
                (
                    F.xxhash64("e").cast("decimal(20,0)")
                    + F.expr("CAST('9223372036854775808' AS DECIMAL(20,0))")
                ).alias("h")
            )
            .collect()
        )
        assert sorted(r["h"] for r in rows) == all_h[:K]

    def test_duplicates_do_not_change_signature(self, spark):
        once = spark.range(0, 2000).select(
            F.lit("a").alias("s"), F.concat(F.lit("e"), "id").alias("e")
        )
        twice = _set_df(spark, "a", 0, 2000)
        sa = sorted(r["h"] for r in kmv_signature(once, "s", "e", K).collect())
        sb = sorted(r["h"] for r in kmv_signature(twice, "s", "e", K).collect())
        assert sa == sb

    def test_partitioning_invariance(self, spark):
        sigs = []
        for parts in (1, 7):
            df = _set_df(spark, "a", 0, 3000, parts=parts)
            sigs.append(
                sorted(r["h"] for r in kmv_signature(df, "s", "e", K).collect())
            )
        assert sigs[0] == sigs[1]


class TestEstimate:
    @pytest.mark.parametrize("n", [1000, 10000, 50000])
    def test_cardinality_within_4_sigma(self, spark, n):
        df = spark.range(0, n).select(
            F.lit("a").alias("s"), F.concat(F.lit("e"), "id").alias("e")
        )
        sig = kmv_signature(df, "s", "e", K)
        est = kmv_estimate(sig, K).collect()[0]["n_est"]
        # rsd ~ 1/sqrt(K-2) ~ 6.3%; allow 4 sigma = 25%
        assert abs(est - n) <= n * 0.25

    def test_under_k_is_exact(self, spark):
        df = spark.range(0, 100).select(
            F.lit("a").alias("s"), F.concat(F.lit("e"), "id").alias("e")
        )
        sig = kmv_signature(df, "s", "e", K)
        row = kmv_estimate(sig, K).collect()[0]
        assert row["n_sig"] == 100
        assert row["n_est"] == 100.0


class TestUnionJaccard:
    def test_merge_is_lossless(self, spark):
        """The k smallest of (sig_a UNION sig_b) must equal the direct
        signature of the concatenated data -- the mergeability contract
        that lets stored signatures cross-intersect without rescans."""
        a = _set_df(spark, "u", 0, 4000)
        b = _set_df(spark, "u", 2000, 6000)
        sig_a = kmv_signature(a, "s", "e", K)
        sig_b = kmv_signature(b, "s", "e", K)
        merged = (
            sig_a.select("h")
            .unionByName(sig_b.select("h"))
            .distinct()
            .orderBy("h")
            .limit(K)
        )
        direct = kmv_signature(a.unionByName(b), "s", "e", K)
        assert sorted(r["h"] for r in merged.collect()) == sorted(
            r["h"] for r in direct.collect()
        )

    @pytest.mark.parametrize(
        "overlap_frac", [0.0, 0.5, 1.0]
    )
    def test_jaccard_on_planted_overlap(self, spark, overlap_frac):
        n = 8000
        shift = int(n * (1 - overlap_frac))
        a = _set_df(spark, "a", 0, n)
        b = _set_df(spark, "b", shift, shift + n)
        sig_a = kmv_signature(a, "s", "e", K)
        sig_b = kmv_signature(b, "s", "e", K)
        row = kmv_union_jaccard(sig_a, sig_b, K).collect()[0]
        j_est = row["j_num"] / row["j_den"]
        inter = n - shift
        union = n + shift
        j_true = inter / union
        assert abs(j_est - j_true) <= 0.12  # ~4 sigma at k=256
        assert abs(row["union_est"] - union) <= union * 0.25

    def test_disjoint_small_sets_exact(self, spark):
        a = _set_df(spark, "a", 0, 50)
        b = _set_df(spark, "b", 1000, 1050)
        sig_a = kmv_signature(a, "s", "e", K)
        sig_b = kmv_signature(b, "s", "e", K)
        row = kmv_union_jaccard(sig_a, sig_b, K).collect()[0]
        assert row["n_union_sig"] == 100
        assert row["union_est"] == 100.0
        assert row["j_num"] == 0


class TestStoredSignatures:
    def _cleanup(self, spark, prefix):
        for t in (f"{prefix}_kmv", f"{prefix}_kmvmeta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    def test_append_equals_rebuild(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.kmv import (
            append_to_kmv_signatures,
            load_kmv_signatures,
            materialize_kmv_signatures,
        )

        try:
            base = _set_df(spark, "a", 0, 3000).unionByName(
                _set_df(spark, "b", 1000, 4000)
            )
            delta = _set_df(spark, "a", 2500, 3500).unionByName(
                _set_df(spark, "b", 0, 500)
            )
            materialize_kmv_signatures(spark, base, "s", "e", "t_kv1", k=K)
            append_to_kmv_signatures(spark, delta, "s", "e", "t_kv1")
            sig, k = load_kmv_signatures(spark, "t_kv1")
            assert k == K
            rebuilt = kmv_signature(
                base.unionByName(delta), "s", "e", K
            )
            got = sorted((r["set_id"], r["h"]) for r in sig.collect())
            want = sorted((r["set_id"], r["h"]) for r in rebuilt.collect())
            assert got == want
        finally:
            self._cleanup(spark, "t_kv1")

    def test_replayed_append_is_noop(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.kmv import (
            append_to_kmv_signatures,
            load_kmv_signatures,
            materialize_kmv_signatures,
        )

        try:
            base = _set_df(spark, "a", 0, 2000)
            delta = _set_df(spark, "a", 1500, 2500)
            materialize_kmv_signatures(spark, base, "s", "e", "t_kv2", k=K)
            append_to_kmv_signatures(spark, delta, "s", "e", "t_kv2")
            sig1, _ = load_kmv_signatures(spark, "t_kv2")
            s1 = sorted(r["h"] for r in sig1.collect())
            append_to_kmv_signatures(spark, delta, "s", "e", "t_kv2")
            sig2, _ = load_kmv_signatures(spark, "t_kv2")
            assert sorted(r["h"] for r in sig2.collect()) == s1
        finally:
            self._cleanup(spark, "t_kv2")
