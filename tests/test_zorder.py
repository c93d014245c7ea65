"""Z-order clustering: value correctness and the measurable layout win
(per-file bounding boxes shrink on BOTH dimensions vs a single-column
sort, which is what lets min/max stats prune multi-predicate scans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.zorder import (
    file_clustering_stats,
    write_zordered,
    zvalue,
)


class TestZValue:
    def test_interleave_known_values(self, spark):
        # x=0b11, y=0b01 at bits=2 -> bits: x0@0, y0@1, x1@2, y1@3
        # x=3 (11), y=1 (01): positions 0(x0=1),1(y0=1),2(x1=1),3(y1=0)
        # -> 0b0111 = 7
        df = spark.createDataFrame([(3, 1)], "x long, y long")
        got = df.select(
            zvalue([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()[0]["z"]
        assert got == 7

    def test_monotone_and_clamped(self, spark):
        df = spark.createDataFrame(
            [(-5, 0), (0, 0), (1 << 40, 3)], "x long, y long"
        )
        rows = df.select(
            zvalue([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
        # negative clamps to 0; huge clamps to 15
        assert rows[0]["z"] == rows[1]["z"] == 0
        # x=15 interleaved alone = 0b01010101 = 85; y=3 adds bits 1,3
        assert rows[2]["z"] == 85 + 2 + 8


class TestZOrderedLayout:
    def test_boxes_tight_on_both_dims_vs_single_sort(self, spark, tmp_path):
        """The point of the curve: files from a z-ordered write must
        cover small ranges of BOTH columns; a single-column sort gives
        tight boxes on that column and full-range boxes on the other."""
        n, side = 4096, 64  # exhaustive 64x64 grid: x and y independent
        df = spark.range(n).select(
            (F.col("id") % side).alias("x"),
            (F.col("id") / side).cast("long").alias("y"),
        )
        zpath = str(tmp_path / "zordered")
        lpath = str(tmp_path / "linear")
        write_zordered(df, zpath, ["x", "y"], bits=6, num_partitions=16)
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.parquet(lpath)
        )

        def avg_span(path, col):
            stats = file_clustering_stats(spark, path, ["x", "y"]).collect()
            return sum(r[f"max_{col}"] - r[f"min_{col}"] for r in stats) / len(stats)

        # same rows either way
        assert (
            spark.read.parquet(zpath).count()
            == spark.read.parquet(lpath).count()
            == n
        )
        # z-order: both dims clustered; linear: y spans ~the whole range
        assert avg_span(zpath, "x") < side / 2
        assert avg_span(zpath, "y") < side / 2
        assert avg_span(lpath, "y") > side * 0.8
        assert avg_span(zpath, "y") < avg_span(lpath, "y") / 2
