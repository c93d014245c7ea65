"""Delimited-text sources with malformed-row quarantine, and
schema-evolution reads for long-lived daily layouts.

The engine's landing formats are JSONL-gz (operators/ingest.py) and
columnar (parquet/ORC); real corporate feeds also arrive as CSV/TSV
exports.  The same discipline applies as the JSONL path: NEVER drop a
malformed row silently -- split it into a quarantine frame the caller
counts and stores (reference quarantines missing-dbObject records the
same way, steps/ingesters.py:497-520).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
    sep: str = ",",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """CSV scan with an explicit schema, split into (good, quarantined).

    PERMISSIVE mode parses every line it can and lands the raw text of
    every line it cannot (wrong arity, uncastable field) in the corrupt
    column; the split keeps both sides as DataFrames so the good path
    stays columnar and the bad path is countable/storable.

    The raw frame is persisted before splitting for two reasons: Spark
    refuses to query ONLY the corrupt column straight off a file scan
    (the parser would never need to parse the other fields, so the
    column would be always-null), and the persist guarantees the two
    sides see one consistent parse of each input split.  Quarantine
    volume is ~zero rows by design, so the cache cost is one pass over
    the day's input -- release it via caching.release_tracked() after
    both sides are consumed.

    Scale notes: an explicit schema skips the inference pre-pass (a
    full extra read at 100 TB); CSV is splittable uncompressed or with
    a splittable codec, so parallelism follows file splits like any
    text source."""
    from ..caching import tracked_persist

    full_schema = f"{schema_ddl}, {CORRUPT_COL} STRING"
    raw = (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
    )
    raw = tracked_persist(raw)
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_evolving(
    spark: SparkSession,
    root: str,
    fmt: str = "parquet",
    schema_ddl: str | None = None,
) -> DataFrame:
    """Read a daily-partitioned dataset whose schema GREW over time
    (columns added by later days): the unified frame carries the union
    of all file schemas, with nulls where an older file predates a
    column.

    With an explicit ``schema_ddl`` (the current contract), every file
    projects into it directly -- no discovery pass, and files that
    predate a column yield nulls for it.  Without one, parquet/ORC
    footer merging (`mergeSchema`) derives the union, which costs a
    footer read per file at planning time -- fine for a backfill tool,
    wrong as the default for a 100 TB daily job, which should pin the
    contract schema instead.

    Columns may be ADDED over time; renames/retypes are breaking
    changes this deliberately does not paper over (an INT-became-STRING
    column should fail loudly, not coerce)."""
    reader = spark.read.format(fmt)
    if schema_ddl is not None:
        reader = reader.schema(schema_ddl)
    else:
        reader = reader.option("mergeSchema", "true")
    return reader.load(root)
