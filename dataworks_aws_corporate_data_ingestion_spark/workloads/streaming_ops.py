"""Driver-visible entries for the streaming/multimodal operator families.

The windowed aggregate runs the exact code path the streaming query uses
(watermark is a no-op on batch input), so the DuckDB oracle checks the
streaming semantics; multimodal features are rows-only (byte-level numpy
math has no SQL analogue) and verified in pytest against numpy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.binary import extract_byte_features
from ..sources.tables import load_table
from ..streaming.windows import windowed_event_counts
from ..workload import register


@register(
    "events_hourly_windows",
    bench=True,
    tags=("streaming", "window-agg", "event-time"),
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2, 3
    """,
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type -- the same
    operator the streaming path runs with a watermark.

    Scale notes: window(ts) is a plain derived grouping column; the agg is
    map-side partial like any other, and in streaming mode the watermark
    bounds state to ~window+lateness."""
    return windowed_event_counts(load_table(spark, "events", sf_dir))


@register(
    "multimodal_byte_features",
    tags=("multimodal", "mapinpandas", "non-sql"),
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction (size/entropy/histogram) over binary
    media columns, here derived from document text bytes.  mapInPandas
    batch plumbing; verified against numpy in pytest.

    The operator API keeps the histogram as array<double>; the registered
    surface serialises it to a JSON string so the driver canonicaliser can
    sort/hash the column."""
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "utf-8").alias("data"),
    )
    return extract_byte_features(media).withColumn(
        "byte_histogram", F.to_json("byte_histogram")
    )
