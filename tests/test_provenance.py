"""Provenance analytics (workloads/provenance.py) on planted fixtures."""

from __future__ import annotations

import pytest

from dataworks_aws_corporate_data_ingestion_spark.workloads.provenance import (
    per_source_ngram_novelty,
    source_vocabulary_overlap,
)


@pytest.fixture()
def planted(spark, tmp_path, monkeypatch):
    """Three sources: m1 and m2 are mirrors (identical text), u is
    disjoint.  Written as a documents.parquet so the workload loaders
    read it like driver data."""
    shared = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"x{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, shared, "en", "m1", len(shared)),
            (2, shared, "en", "m2", len(shared)),
            (3, other, "en", "u", len(other)),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


class TestVocabularyOverlap:
    def test_mirrors_have_full_overlap_disjoint_zero(self, spark, planted):
        rows = {
            (r.source_a, r.source_b): r
            for r in source_vocabulary_overlap(spark, planted).collect()
        }
        assert rows[("m1", "m2")].jaccard == pytest.approx(1.0)
        assert rows[("m1", "m2")].n_common == 30
        # sparse contract: zero-overlap pairs emit NO row
        assert set(rows) == {("m1", "m2")}


class TestNgramNovelty:
    def test_mirrored_sources_have_zero_novelty(self, spark, planted):
        rows = {
            r.source: r
            for r in per_source_ngram_novelty(spark, planted).collect()
        }
        assert rows["m1"].novelty == pytest.approx(0.0)
        assert rows["m2"].novelty == pytest.approx(0.0)
        assert rows["u"].novelty == pytest.approx(1.0)
        assert rows["u"].n_grams == 30 - 8 + 1
