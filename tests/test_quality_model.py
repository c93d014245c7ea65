"""Learned quality filter (operators/quality_model.py): pyspark.ml
logistic regression over the oracle-certified feature matrix."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.quality_model import (
    score_quality,
    train_quality_model,
    weak_labels,
)
from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES

SF = "/root/testdata/sf0.001"


def _features(spark):
    return QUERIES["document_feature_matrix"].fn(spark, SF)


class TestQualityModel:
    def test_weak_labels_follow_gates(self, spark):
        lab = weak_labels(_features(spark))
        bad = lab.filter(
            (
                (F.col("quality") >= 0.5) & (F.col("dup_ratio") <= 0.5)
            ).cast("double")
            != F.col("label")
        )
        assert bad.count() == 0
        # both classes must exist for training to mean anything
        classes = {r.label for r in lab.select("label").distinct().collect()}
        assert classes == {0.0, 1.0}

    def test_model_separates_planted_structure(self, spark):
        feats = _features(spark)
        model = train_quality_model(feats)
        scored = score_quality(feats, model)
        joined = weak_labels(feats).select("doc_id", "label").join(
            scored, "doc_id"
        )
        stats = {
            r.label: r.avg
            for r in joined.groupBy("label")
            .agg(F.avg("quality_prob").alias("avg"))
            .collect()
        }
        # learned P(keep) must rank positives above negatives on average
        assert stats[1.0] > stats[0.0] + 0.2

    def test_scores_cover_corpus_and_are_probabilities(self, spark):
        feats = _features(spark)
        model = train_quality_model(feats)
        scored = score_quality(feats, model)
        assert scored.count() == feats.count()
        out_of_range = scored.filter(
            (F.col("quality_prob") < 0) | (F.col("quality_prob") > 1)
        )
        assert out_of_range.count() == 0

    def test_retrain_is_stable(self, spark):
        # LBFGS over treeAggregate is deterministic only up to float
        # summation order (which shifts with partitioning/load), so the
        # contract is STABILITY, not bit-equality: two fits must score
        # every document within a tight tolerance and agree on every
        # keep/drop verdict.
        feats = _features(spark)
        m1 = train_quality_model(feats)
        m2 = train_quality_model(feats)
        s1 = {
            r.doc_id: r.quality_prob
            for r in score_quality(feats, m1).collect()
        }
        s2 = {
            r.doc_id: r.quality_prob
            for r in score_quality(feats, m2).collect()
        }
        assert set(s1) == set(s2)
        assert max(abs(s1[k] - s2[k]) for k in s1) < 1e-3
        assert all((s1[k] >= 0.5) == (s2[k] >= 0.5) for k in s1)
