"""Compaction: small files merge, data survives byte-for-byte, ordering
contract (sorted by id within files) holds."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.sinks.compaction import (
    compact_partition,
    plan_compaction,
)


def _write_fragmented(spark, path, n_chunks=6, rows_per_chunk=50):
    for c in range(n_chunks):
        spark.createDataFrame(
            [(f"{c:02d}{i:04d}", f"v{c}-{i}") for i in range(rows_per_chunk)],
            "id string, val string",
        ).coalesce(1).write.mode("append").orc(path)


class TestCompaction:
    def test_plan_finds_fragmented_partition(self, spark, tmp_path):
        p = str(tmp_path / "frag")
        _write_fragmented(spark, p)
        plan = plan_compaction(spark, str(tmp_path))
        assert len(plan) == 1
        dirpath, n_files, _total = plan[0]
        assert dirpath == p and n_files >= 6

    def test_compact_preserves_data_and_reduces_files(self, spark, tmp_path):
        p = str(tmp_path / "frag")
        _write_fragmented(spark, p)
        before = {tuple(r) for r in spark.read.orc(p).collect()}
        n_before = len([f for f in os.listdir(p) if not f.startswith(("_", "."))])
        compact_partition(spark, p)
        after = {tuple(r) for r in spark.read.orc(p).collect()}
        n_after = len([f for f in os.listdir(p) if not f.startswith(("_", "."))])
        assert after == before
        assert n_after < n_before
        # clean plan: nothing left to compact
        assert plan_compaction(spark, str(tmp_path)) == []
