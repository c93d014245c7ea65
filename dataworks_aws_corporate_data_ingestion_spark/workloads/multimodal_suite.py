"""Driver-checkable multimodal entries (r9 verdict #2: widen the family
from one oracle entry to first-class coverage of the REAL no-codec
decode paths in multimodal/binary.py).

Each entry synthesises genuine media containers from document bytes --
uncompressed 24-bit BMP / binary P6 PPM images, RIFF/WAVE audio -- runs
the real parse/decode/featurise operators (struct-walked headers, pixel
buffers, 16-bit PCM), and exposes only INTEGER-EXACT outputs (counts,
sums, min/max, integer luma) so the DuckDB oracle can re-derive the same
numbers from the same bytes.  The doc-bytes -> container synthesis is
deterministic and byte-reversible, which is what makes a cross-engine
oracle possible at all: DuckDB sees the identical payload bytes through
hex(encode(text)).

Scale notes: every stage here is a mapInPandas over fan_out'ed inputs
(single-file parquet arrives as ONE partition; the synth + decode are
CPU-bound per-row stages).  Blobs never join or shuffle after synthesis
-- stats reduce each asset to a few bigints in the same task that
decoded it, the shape that holds at 100 TB of real media.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..multimodal.binary import (
    PIXEL_STATS_EXACT_SCHEMA,
    WAVEFORM_EXACT_SCHEMA,
    decode_images,
    extract_pcm_batch,
    extract_wav_pcm,
    image_stats_batch,
    pcm_stats_batch,
    pixel_stats_exact,
    probe_container_metadata,
    sample_frames,
    waveform_stats_exact,
)
from ..partitioning import fan_out
from ..sources.tables import load_table
from ..workload import register

_MEDIA_BLOB_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("data", BinaryType()),
    ]
)

_IMG_BYTES = 48  # 4x4 RGB
_WAV_BYTES = 128  # 64 16-bit samples


def _synth_image_media(df: DataFrame) -> DataFrame:
    """(doc_id, text) -> real image containers: even doc_ids become
    uncompressed 24-bit 4x4 BMPs (54-byte struct-packed header, BGR
    bottom-up payload), odd doc_ids binary P6 PPMs (ASCII header, RGB
    payload).  The pixel payload is verbatim the first 48 UTF-8 bytes of
    the text, so an oracle can re-derive every decoded pixel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        bmp_header = b"BM" + struct.pack("<IHHI", 102, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, _IMG_BYTES, 0, 0, 0, 0
        )
        for pdf in it:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                payload = (text or "").encode("utf-8")[:_IMG_BYTES]
                if len(payload) < _IMG_BYTES:
                    continue  # guarded by the upstream length filter
                if did % 2 == 0:
                    blob = bmp_header + payload
                else:
                    blob = b"P6\n4 4\n255\n" + payload
                rows.append((int(did), blob))
            yield pd.DataFrame(rows, columns=["asset_id", "data"])

    return df.mapInPandas(batches, _MEDIA_BLOB_SCHEMA)


def _synth_wav_media(df: DataFrame) -> DataFrame:
    """(doc_id, text) -> real RIFF/WAVE containers: canonical 44-byte
    header (PCM fmt chunk; sample rate 8/12/16 kHz by doc_id % 3, mono,
    16-bit) + a data chunk holding the first 128 UTF-8 bytes of the text
    as 64 little-endian 16-bit samples."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in it:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                payload = (text or "").encode("utf-8")[:_WAV_BYTES]
                if len(payload) < _WAV_BYTES:
                    continue  # guarded by the upstream length filter
                rate = 8000 + 4000 * (did % 3)
                blob = (
                    b"RIFF"
                    + struct.pack("<I", 36 + _WAV_BYTES)
                    + b"WAVEfmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", _WAV_BYTES)
                    + payload
                )
                rows.append((int(did), blob))
            yield pd.DataFrame(rows, columns=["asset_id", "data"])

    return df.mapInPandas(batches, _MEDIA_BLOB_SCHEMA)


def _eligible_docs(spark: SparkSession, sf_dir: str, min_bytes: int) -> DataFrame:
    """Docs whose UTF-8 byte length covers the media payload.  The byte-
    length predicate is a plain column expression (pushed to the scan);
    fan_out parallelises the single-file input before the CPU-bound
    synth/decode stages."""
    docs = load_table(spark, "documents", sf_dir)
    return fan_out(
        docs.filter(F.length(F.encode(F.col("text"), "utf-8")) >= min_bytes).select(
            "doc_id", "text"
        )
    )


# shared oracle scaffold: byte k (0-based) of encode(text) via the hex
# rendering -- hex() is uppercase in DuckDB, two chars per byte
_NIB = (
    "(CASE WHEN {c} BETWEEN 'A' AND 'F' THEN ascii({c}) - 55 "
    "ELSE ascii({c}) - 48 END)"
)


def _byte_expr(hexcol: str, idx: str) -> str:
    h1 = f"substring({hexcol}, CAST(2 * ({idx}) + 1 AS INT), 1)"
    h2 = f"substring({hexcol}, CAST(2 * ({idx}) + 2 AS INT), 1)"
    return f"({_NIB.format(c=h1)} * 16 + {_NIB.format(c=h2)})"


@register(
    "multimodal_image_decode_stats",
    bench=True,  # the multimodal family's benched representative (r9
    # verdict #7)
    tags=("multimodal", "mapinpandas", "image-decode", "no-codec"),
    oracle=f"""
        WITH src AS (
            SELECT doc_id, substring(hex(encode(text)), 1, {2 * _IMG_BYTES}) AS hx
            FROM documents
            WHERE octet_length(encode(text)) >= {_IMG_BYTES}
        ), idx AS (
            SELECT doc_id, hx, unnest(range({_IMG_BYTES})) AS i FROM src
        ), bytes AS (
            SELECT doc_id, i, {_byte_expr('hx', 'i')} AS b FROM idx
        ), px AS (
            -- BMP payloads are stored BGR (decode flips to RGB), PPM are
            -- RGB; row order (BMP bottom-up) permutes pixels but stats
            -- are order-invariant, so only the channel mapping branches
            SELECT doc_id, i // 3 AS pix,
                   MAX(CASE WHEN i % 3 = (CASE WHEN doc_id % 2 = 0
                                          THEN 2 ELSE 0 END) THEN b END) AS r,
                   MAX(CASE WHEN i % 3 = 1 THEN b END) AS g,
                   MAX(CASE WHEN i % 3 = (CASE WHEN doc_id % 2 = 0
                                          THEN 0 ELSE 2 END) THEN b END) AS bb
            FROM bytes GROUP BY doc_id, i // 3
        )
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
               CAST(COUNT(*) AS BIGINT) AS n_pixels,
               CAST(SUM(r) AS BIGINT) AS sum_r,
               CAST(SUM(g) AS BIGINT) AS sum_g,
               CAST(SUM(bb) AS BIGINT) AS sum_b,
               CAST(MIN((77 * r + 150 * g + 29 * bb) // 256) AS BIGINT)
                   AS min_luma,
               CAST(MAX((77 * r + 150 * g + 29 * bb) // 256) AS BIGINT)
                   AS max_luma
        FROM px GROUP BY doc_id
    """,
)
def multimodal_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode -> integer-exact pixel stats, end to end with no
    codec library: synthesise genuine BMP (even doc_ids) / P6 PPM (odd)
    containers from document bytes, decode them through the public-spec
    parsers (multimodal/binary.py::_decode_bmp/_decode_ppm -- struct
    header walk, BGR->RGB, bottom-up flip), then reduce each image to
    channel sums and min/max integer luma (pixel_stats_exact).  The
    oracle re-derives the same numbers from the same payload bytes,
    branching the channel mapping on the container format."""
    # ONE Arrow crossing for synth -> decode -> stats (r11, guide 4.2 /
    # r10 verdict #8): the doc text crosses to Python once and only the
    # kilobyte stats rows come back -- container blobs and per-row pixel
    # buffers never round-trip through Arrow (they did twice each as
    # three chained mapInPandas stages).  The container parse itself is
    # vectorised by header shape in image_stats_batch; synthesis and
    # parsing are byte-identical to _synth_image_media + decode_images.
    def _synth_decode_stats(it):
        import struct

        bmp_header = b"BM" + struct.pack("<IHHI", 102, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, _IMG_BYTES, 0, 0, 0, 0
        )
        for pdf in it:
            ids: list[int] = []
            blobs: list[bytes] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                payload = (text or "").encode("utf-8")[:_IMG_BYTES]
                if len(payload) < _IMG_BYTES:
                    continue  # guarded by the upstream length filter
                ids.append(int(did))
                blobs.append(
                    bmp_header + payload
                    if did % 2 == 0
                    else b"P6\n4 4\n255\n" + payload
                )
            if ids:
                yield image_stats_batch(ids, blobs)

    stats = _eligible_docs(spark, sf_dir, _IMG_BYTES).mapInPandas(
        _synth_decode_stats, PIXEL_STATS_EXACT_SCHEMA
    )
    return stats.select(
        "asset_id",
        F.when(F.col("asset_id") % 2 == 0, F.lit("bmp"))
        .otherwise(F.lit("ppm"))
        .alias("fmt"),
        "n_pixels",
        "sum_r",
        "sum_g",
        "sum_b",
        "min_luma",
        "max_luma",
    )


@register(
    "multimodal_wav_waveform_stats",
    tags=("multimodal", "mapinpandas", "audio", "no-codec"),
    oracle=f"""
        WITH src AS (
            SELECT doc_id, substring(hex(encode(text)), 1, {2 * _WAV_BYTES}) AS hx
            FROM documents
            WHERE octet_length(encode(text)) >= {_WAV_BYTES}
        ), idx AS (
            SELECT doc_id, hx, unnest(range({_WAV_BYTES // 2})) AS j FROM src
        ), smp AS (
            SELECT doc_id, j,
                   ({_byte_expr('hx', '2 * j')}
                    + 256 * {_byte_expr('hx', '2 * j + 1')}) AS u
            FROM idx
        ), s16 AS (
            SELECT doc_id, j,
                   u - (CASE WHEN u >= 32768 THEN 65536 ELSE 0 END) AS s
            FROM smp
        ), zc AS (
            SELECT doc_id, j, s,
                   LAG(s) OVER (PARTITION BY doc_id ORDER BY j) AS prev
            FROM s16
        )
        SELECT doc_id AS asset_id,
               'wav' AS "format",
               CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
               CAST(1 AS INT) AS channels,
               CAST(16 AS INT) AS bits,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(CASE WHEN prev IS NOT NULL
                             AND (prev < 0) != (s < 0)
                        THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
               CAST(SUM(abs(s)) AS BIGINT) AS sum_abs,
               CAST(MAX(abs(s)) AS BIGINT) AS peak_abs
        FROM zc GROUP BY doc_id
    """,
)
def multimodal_wav_waveform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio-container pipeline with no codec library: synthesise
    genuine RIFF/WAVE blobs (rate varies by doc_id), parse the header
    with the real chunk walk (probe_container_metadata), strip the
    container (extract_wav_pcm), and reduce the 16-bit PCM to integer-
    exact waveform stats (waveform_stats_exact).  Probe and waveform
    stats join on asset_id -- both sides are already kilobyte rows, the
    blob never crosses a shuffle."""
    # ONE Arrow crossing for synth -> probe -> strip -> stats (r11,
    # guide 4.2): the probe and waveform branches each re-ran the whole
    # synth UDF (no shared exchange) and joined kilobyte rows that came
    # from the SAME input row.  The fused pass synthesises the blob
    # once, parses the header with the real chunk walk (_probe_one),
    # strips the container (extract_pcm_batch -- canonical-layout fast
    # path, original walk otherwise) and reduces the PCM
    # (pcm_stats_batch), all byte-identical to the operator chain; the
    # join disappears because both halves describe the same asset row.
    def _synth_probe_stats(it):
        import struct

        from ..multimodal.binary import _probe_one

        for pdf in it:
            ids: list[int] = []
            blobs: list[bytes] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                payload = (text or "").encode("utf-8")[:_WAV_BYTES]
                if len(payload) < _WAV_BYTES:
                    continue  # guarded by the upstream length filter
                rate = 8000 + 4000 * (did % 3)
                ids.append(int(did))
                blobs.append(
                    b"RIFF"
                    + struct.pack("<I", 36 + _WAV_BYTES)
                    + b"WAVEfmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", _WAV_BYTES)
                    + payload
                )
            if not ids:
                continue
            probes = [_probe_one(b) for b in blobs]
            stats = pcm_stats_batch(ids, extract_pcm_batch(blobs))
            stats.insert(1, "format", [p[0] for p in probes])
            stats.insert(2, "sample_rate", pd.array([p[3] for p in probes], dtype="Int32"))
            stats.insert(3, "channels", pd.array([p[4] for p in probes], dtype="Int32"))
            stats.insert(4, "bits", pd.array([p[5] for p in probes], dtype="Int32"))
            yield stats

    return _eligible_docs(spark, sf_dir, _WAV_BYTES).mapInPandas(
        _synth_probe_stats,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("format", StringType()),
                StructField("sample_rate", IntegerType()),
                StructField("channels", IntegerType()),
                StructField("bits", IntegerType()),
                StructField("n_samples", LongType()),
                StructField("zero_crossings", LongType()),
                StructField("sum_abs", LongType()),
                StructField("peak_abs", LongType()),
            ]
        ),
    )


_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_len", LongType()),
        StructField("frame_byte_sum", LongType()),
    ]
)


def _frame_stats(frames: DataFrame) -> DataFrame:
    """Reduce sampled frames to integer-exact (length, byte sum) in the
    same task that produced them -- frame payloads never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, i, blob in zip(
                pdf["asset_id"], pdf["frame_index"], pdf["frame_data"]
            ):
                arr = np.frombuffer(blob or b"", dtype=np.uint8)
                rows.append(
                    (int(aid), int(i), int(arr.size), int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_index", "frame_len", "frame_byte_sum"],
            )

    return frames.mapInPandas(batches, _FRAME_STATS_SCHEMA)


@register(
    "multimodal_frame_sample_manifest",
    tags=("multimodal", "mapinpandas", "video", "fan-out"),
    oracle=f"""
        WITH src AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents
            WHERE octet_length(encode(text)) >= 4
        ), w AS (
            SELECT doc_id, hx, n // 4 AS win FROM src
        ), idx AS (
            SELECT doc_id, hx, win, unnest(range(4 * win)) AS i FROM w
        ), b AS (
            SELECT doc_id, win, i // win AS frame_index,
                   {_byte_expr('hx', 'i')} AS byte
            FROM idx
        )
        SELECT doc_id AS asset_id,
               CAST(frame_index AS INT) AS frame_index,
               CAST(win AS BIGINT) AS frame_len,
               CAST(SUM(byte) AS BIGINT) AS frame_byte_sum
        FROM b GROUP BY doc_id, frame_index, win
    """,
)
def multimodal_frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video-path fan-out shape: deterministic 4-frame sampling over
    binary payloads (multimodal/binary.py::sample_frames -- one input row
    -> n output rows, equal byte windows of max(1, len // 4)), reduced to
    an integer-exact per-frame manifest.  With len >= 4 every frame is a
    full window, so the oracle re-derives each frame's length and byte
    sum directly from the payload byte positions."""
    docs = _eligible_docs(spark, sf_dir, 4)
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "utf-8").alias("data"),
    )
    return _frame_stats(sample_frames(media, n_frames=4))
