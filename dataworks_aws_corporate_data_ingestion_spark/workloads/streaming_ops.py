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
    tags=("multimodal", "mapinpandas"),
    oracle="""
        WITH hx AS (
            -- bin UTF-8 BYTES, exactly as the Spark side does over
            -- encode(text): each byte's high nibble is the first hex
            -- digit of its pair in hex(encode(text)) (DuckDB hex is
            -- uppercase).  Binning per-CHARACTER code points instead
            -- diverges on any non-ASCII character.
            SELECT doc_id, hex(encode(text)) AS h FROM documents
        ), idx AS (
            SELECT doc_id, h, unnest(range(length(h) // 2)) AS i FROM hx
        ), ch AS (
            SELECT doc_id,
                   CASE WHEN hc BETWEEN 'A' AND 'F' THEN ascii(hc) - 55
                        ELSE ascii(hc) - 48 END AS nib
            FROM (
                SELECT doc_id, substring(h, CAST(2 * i + 1 AS INT), 1) AS hc
                FROM idx
            )
        ), nibs AS (
            SELECT unnest(range(16)) AS nib
        ), counts AS (
            SELECT d.doc_id, n.nib, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
            FROM (SELECT DISTINCT doc_id FROM documents) d
            CROSS JOIN nibs n
            LEFT JOIN (
                SELECT doc_id, nib, COUNT(*) AS cnt FROM ch GROUP BY doc_id, nib
            ) c ON c.doc_id = d.doc_id AND c.nib = n.nib
        ), lists AS (
            SELECT doc_id,
                   CAST(to_json(list(cnt ORDER BY nib)) AS VARCHAR)
                       AS nibble_histogram,
                   list(cnt ORDER BY nib) AS arr
            FROM counts GROUP BY doc_id
        )
        SELECT l.doc_id AS asset_id,
               CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
               l.nibble_histogram,
               CAST(list_position(l.arr, list_max(l.arr)) - 1 AS BIGINT)
                   AS top_nibble
        FROM lists l JOIN documents d ON d.doc_id = l.doc_id
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction over binary media columns (here
    derived from document text bytes): size, 16-bin nibble histogram,
    dominant nibble.  mapInPandas batch plumbing is the real multimodal
    path; the driver-checked surface sticks to the INTEGER-exact outputs
    (counts, argmax) -- entropy and ratio columns stay on the operator
    API, pinned against numpy in pytest, because libm/division rounding
    is not bit-stable cross-engine.

    The histogram rides as a compact JSON string so the driver
    canonicaliser can sort/hash the column; Spark's to_json and DuckDB's
    to_json render bigint lists identically."""
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "utf-8").alias("data"),
    )
    feats = extract_byte_features(media)
    return feats.select(
        "asset_id",
        "n_bytes",
        F.to_json("byte_hist_counts").alias("nibble_histogram"),
        (
            F.expr("array_position(byte_hist_counts, array_max(byte_hist_counts))")
            - F.lit(1)
        )
        .cast("bigint")
        .alias("top_nibble"),
    )


@register(
    "purchases_attributed_views",
    tags=("streaming", "stream-stream-join", "interval-join", "event-time"),
    oracle="""
        SELECT v.user_id,
               v.event_id AS view_id,
               v.ts AS view_ts,
               p.event_id AS purchase_id,
               p.ts AS purchase_ts,
               CAST(CAST(p.value AS DECIMAL(12,2)) AS DOUBLE)
                   AS purchase_value
        FROM events v
        JOIN events p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 60 MINUTE
        WHERE v.event_type = 'view'
          AND p.event_type = 'purchase'
    """,
)
def purchases_attributed_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View->purchase attribution within a 60-minute horizon
    (streaming/joins.py::interval_join_attribution): the batch twin of
    the watermarked stream-stream interval join, oracle-certified here;
    tests prove the streaming execution emits the identical pair set
    (state bounded by watermark + horizon instead of buffering forever).

    Scale notes: equi-join on user_id (one exchange per side), the time
    range applied inside the joined partition -- never a theta-only
    cross product."""
    from ..streaming.joins import interval_join_attribution

    e = load_table(spark, "events", sf_dir)
    return interval_join_attribution(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
        horizon_minutes=60,
    )


@register(
    "events_sliding_windows",
    tags=("streaming", "window-agg", "sliding", "event-time"),
    oracle="""
        SELECT ws AS window_start,
               ws + INTERVAL '1 hour' AS window_end,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM (
            SELECT time_bucket(INTERVAL '15 minutes', ts)
                       - k.k * INTERVAL '15 minutes' AS ws,
                   event_type, value
            FROM events, LATERAL (SELECT unnest(range(4)) AS k) k
        )
        GROUP BY 1, 2, 3
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING 1-hour windows every 15 minutes (hop windows) -- the
    overlapping-window twin of events_hourly_windows: each event lands in
    exactly window/slide = 4 windows, so trend dashboards get a fresh
    hour-long reading 4x as often without waiting for a tumble boundary.
    The oracle expands the same 4 memberships per event explicitly
    (time_bucket at the slide grain minus k slides, k in 0..3).

    Scale notes: Spark plans the slide as an internal explode (one row
    per overlapping window) feeding the usual partial-then-final hash
    aggregate -- input amplification is the window/slide ratio, which is
    why the slide should divide the window and stay coarse at scale; in
    streaming mode the same expression runs under a watermark with state
    bounded by window+lateness per key."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
