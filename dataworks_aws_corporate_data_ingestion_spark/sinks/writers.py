"""Range-clustered partitioned writers.

The write-layout contract is a first-class part of the engine (reference
docs/data-storage.md:101-103): daily deltas and snapshots are partitioned
by `id_part`, range-clustered and sorted by `(id_part, id)` so the NEXT
merge's range exchange and ORC/parquet stripe pruning stay cheap.  At 10 TB
this discipline is the difference between a planned merge and a blind
re-shuffle of the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DAILY_PARTITIONS = ("export_year", "export_month", "export_day", "id_part")


def write_daily(
    df: DataFrame,
    path: str,
    fmt: str = "orc",
    compression: str = "zlib",
    num_partitions: int | None = None,
) -> None:
    """Daily-delta write (reference steps/ingesters.py:534-538):
    repartitionByRange(id_part, id) + sortWithinPartitions(id) + dynamic
    partition overwrite, so re-runs replace only the day they touch."""
    cluster = (
        df.repartitionByRange(num_partitions, "id_part", "id")
        if num_partitions
        else df.repartitionByRange("id_part", "id")
    )
    (
        cluster.sortWithinPartitions("id")
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*DAILY_PARTITIONS)
        .format(fmt)
        .option("compression", compression)
        .mode("overwrite")
        .save(path)
    )


def write_snapshot(
    df: DataFrame,
    path: str,
    fmt: str = "orc",
    compression: str = "zlib",
) -> None:
    """Snapshot write (reference steps/ingesters.py:456-457): partitioned by
    id_part only.  Callers pass an already range-clustered DataFrame (the
    merge repartitions by range as part of its window)."""
    (
        df.write.partitionBy("id_part")
        .format(fmt)
        .option("compression", compression)
        .mode("overwrite")
        .save(path)
    )


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Audit-collection text sink (reference steps/ingesters.py:116-119 used
    LZO, an EMR-ism; any splittable/standard codec keeps the semantics)."""
    df.write.mode("overwrite").option("compression", compression).text(path)
