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


class TestFlatDailyZOrder:
    """The measured decision on z-ordering the daily path (round-4 backlog):
    directory partitioning stays the default; the flat z-layout is the
    small-files-regime alternative, and these are the numbers."""

    def _daily(self, spark, n_days=10, rows_per_day=320):
        return (
            spark.range(n_days * rows_per_day)
            .select(
                F.md5(F.col("id").cast("string")).alias("id"),
                F.lit("INSERT").alias("db_type"),
                F.concat(F.lit("v"), F.col("id")).alias("val"),
                F.lit(2023).alias("export_year"),
                F.lit(7).alias("export_month"),
                (F.col("id") % n_days + 1).cast("int").alias("export_day"),
            )
            .withColumn("id_part", F.substring("id", 1, 1))
        )

    def test_lexical_rank_preserves_order(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.zorder import (
            lexical_rank,
        )

        df = spark.createDataFrame(
            [("00a",), ("0f",), ("9zz",), ("a",), ("ff0",)], "s string"
        )
        rows = df.select("s", lexical_rank(F.col("s")).alias("r")).collect()
        by_string = [r["r"] for r in sorted(rows, key=lambda r: r["s"])]
        assert by_string == sorted(by_string)

    def test_flat_zorder_prunes_both_dims_and_avoids_slivers(
        self, spark, tmp_path
    ):
        from dataworks_aws_corporate_data_ingestion_spark.operators.zorder import (
            file_clustering_stats,
            files_opened_by,
            write_daily_flat_zordered,
        )
        from dataworks_aws_corporate_data_ingestion_spark.sinks.writers import (
            write_daily,
        )

        df = self._daily(spark)
        dir_path = str(tmp_path / "dirs")
        z_path = str(tmp_path / "flat_z")
        lin_path = str(tmp_path / "flat_id")
        write_daily(df, dir_path, fmt="parquet", compression="snappy",
                    stabilize=False)
        # bit widths matched to each dimension's REAL variation (10 days
        # ~ 4 bits); an unbalanced split (e.g. id_bits=8) leaves id's high
        # bits on top of the curve and day pruning decays to ~nothing
        # (measured: 7/8 files opened vs 3/16 balanced)
        write_daily_flat_zordered(
            df, z_path, base_date="2023-07-01", day_bits=4, id_bits=4,
            num_partitions=16,
        )
        (
            df.repartitionByRange(8, "id")
            .sortWithinPartitions("id")
            .write.parquet(lin_path)
        )

        import glob

        n_dir_files = len(glob.glob(f"{dir_path}/**/*.parquet", recursive=True))
        n_z_files = len(glob.glob(f"{z_path}/*.parquet"))
        # the sliver regime: ~days x id_parts leaf files vs data-sized files
        assert n_dir_files >= 100 and n_z_files <= 16

        zs = [r.asDict() for r in
              file_clustering_stats(spark, z_path, ["export_day", "id"]).collect()]
        ls = [r.asDict() for r in
              file_clustering_stats(spark, lin_path, ["export_day", "id"]).collect()]

        # a 2-day window: z-layout skips files, the id-sorted flat layout
        # cannot (every file spans all days)
        day_pred = {"export_day": (3, 4)}
        assert files_opened_by(zs, day_pred) < len(zs)
        assert files_opened_by(ls, day_pred) == len(ls)

        # an id prefix range: both layouts skip (z keeps id clustering too)
        id_pred = {"id": ("4", "5")}
        assert files_opened_by(zs, id_pred) < len(zs)
        assert files_opened_by(ls, id_pred) < len(ls)

        # conjunctive day+id probe: the z-layout must beat its own
        # day-only pruning (the second dimension adds real skipping)
        both = {"export_day": (3, 4), "id": ("4", "5")}
        assert files_opened_by(zs, both) <= files_opened_by(zs, day_pred)
