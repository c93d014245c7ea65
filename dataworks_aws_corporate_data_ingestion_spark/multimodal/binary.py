"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns plus a typed metadata struct; all
per-asset compute runs through `mapInPandas` so each Arrow batch is one
Python crossing and assets never round-trip through JVM row objects.

Codec-dependent steps (JPEG/PNG decode, resampling, frame extraction)
are STUBS in this container -- the image/audio libraries are not
installed -- gated behind import-tries that raise NotImplementedError
with the library named.  Formats whose layout is a public spec needing
no codec (uncompressed BMP, binary PPM, WAV/PNG/JPEG headers, raw PCM)
decode/parse for real in pure Python+numpy, so the decode -> pixel-stats
path runs end-to-end here.  Everything around the stubs (schemas,
batching, partitioning, the byte-level feature extractor) is real and
tested.

Scale notes: assets are large values; `rebalance_by_size` targets a bytes-
per-partition budget so one task never holds hundreds of 4K frames, and
metadata-only predicates (width/media_type) are plain columns that push
into the parquet scan without touching the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_METADATA = StructType(
    [
        StructField("media_type", StringType()),  # image/jpeg, audio/wav, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("data", BinaryType()),
        StructField("meta", MEDIA_METADATA),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
        StructField("byte_histogram", ArrayType(DoubleType())),
        # raw integer counts per 16-bin nibble bucket: the exact-arithmetic
        # twin of byte_histogram, and the driver-oracle-checkable surface
        # (entropy/ratios involve libm / division rounding; counts do not)
        StructField("byte_hist_counts", ArrayType(LongType())),
    ]
)


def _require(module: str, step: str):
    try:
        return __import__(module)
    except ImportError as exc:  # pragma: no cover - codec libs absent here
        raise NotImplementedError(
            f"{step} requires the '{module}' library, which is not installed "
            f"in this environment; the surrounding Spark plumbing (schema, "
            f"batching, partitioning) is functional"
        ) from exc


def rebalance_by_size(
    df: DataFrame, bytes_col: str = "data", target_partition_bytes: int = 512 << 20
) -> DataFrame:
    """Repartition so each task holds ~target bytes of media, not a fixed
    row count -- rows are wildly non-uniform in size."""
    total = df.select(F.sum(F.length(F.col(bytes_col)))).first()[0] or 0
    parts = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(parts)


def extract_byte_features(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Codec-free feature extraction: size, shannon entropy, and a
    normalised 16-bin byte histogram per asset.  Fully real (no stub) --
    the pattern for any decode-and-featurise stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf["data"]):
                arr = np.frombuffer(blob or b"", dtype=np.uint8)
                n = int(arr.size)
                if n:
                    counts = np.bincount(arr >> 4, minlength=16)
                    probs = counts.astype(np.float64) / n
                    nz = probs[probs > 0]
                    entropy = float(-(nz * np.log2(nz)).sum())
                    hist = probs.tolist()
                    raw = [int(c) for c in counts]
                else:
                    entropy, hist, raw = 0.0, [0.0] * 16, [0] * 16
                rows.append((int(aid), n, entropy, hist, raw))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "n_bytes",
                    "byte_entropy",
                    "byte_histogram",
                    "byte_hist_counts",
                ],
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),  # row-major RGB
    ]
)


def _decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """Uncompressed 24-bit BMP -> (width, height, row-major top-down RGB).
    Pure stdlib+numpy: the BMP container is a public fixed layout
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR rows padded to 4 bytes,
    bottom-up unless height is negative)."""
    import struct

    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    (data_offset,) = struct.unpack("<I", blob[10:14])
    width, height = struct.unpack("<ii", blob[18:26])
    (bpp,) = struct.unpack("<H", blob[28:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    raw = np.frombuffer(
        blob, dtype=np.uint8, count=row_bytes * height, offset=data_offset
    ).reshape(height, row_bytes)
    bgr = raw[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return width, height, bgr[:, :, ::-1].tobytes()  # BGR -> RGB


def _decode_ppm(blob: bytes) -> tuple[int, int, bytes]:
    """Binary PPM (P6, maxval 255) -> (width, height, row-major RGB).
    The header is whitespace-separated ASCII tokens with '#' comments;
    the payload is already row-major RGB."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM file")
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(blob):
        c = blob[pos]
        if c in b"#":
            pos = blob.index(b"\n", pos) + 1
        elif c in b" \t\r\n":
            pos += 1
        else:
            end = pos
            while end < len(blob) and blob[end] not in b" \t\r\n#":
                end += 1
            tokens.append(int(blob[pos:end]))
            pos = end
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported (got {maxval})")
    pos += 1  # single whitespace byte separates header from payload
    need = width * height * 3
    pixels = blob[pos : pos + need]
    if len(pixels) != need:
        raise ValueError("truncated PPM payload")
    return width, height, pixels


def decode_images(df: DataFrame) -> DataFrame:
    """Image decode to row-major RGB.  Uncompressed BMP and binary PPM
    decode end-to-end in pure Python/numpy (container layouts are public
    specs, no codec library needed); PNG/JPEG route through PIL, which is
    import-gated in this container (NotImplementedError naming the
    missing library)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["data"]):
                blob = bytes(blob or b"")
                if blob[:2] == b"BM":
                    w, h, px = _decode_bmp(blob)
                elif blob[:2] == b"P6":
                    w, h, px = _decode_ppm(blob)
                else:
                    pil = _require("PIL", "PNG/JPEG decode")
                    img = pil.Image.open(io.BytesIO(blob)).convert("RGB")
                    w, h, px = img.width, img.height, img.tobytes()
                rows.append((int(aid), w, h, px))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "pixels"]
            )

    return df.mapInPandas(batches, DECODED_IMAGE_SCHEMA)


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("min_luma", LongType()),
        StructField("max_luma", LongType()),
    ]
)


def pixel_stats(decoded: DataFrame) -> DataFrame:
    """Per-image channel statistics over decoded RGB buffers -- with the
    BMP/PPM decoders above this is a fully-real decode -> featurise path
    (no codec library).  Luma uses integer BT.601-ish weights (77R + 150G
    + 29B) >> 8 so min/max are exact."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, px in zip(pdf["asset_id"], pdf["pixels"]):
                arr = np.frombuffer(px or b"", dtype=np.uint8)
                arr = arr[: (arr.size // 3) * 3].reshape(-1, 3).astype(np.int64)
                n = int(arr.shape[0])
                if n:
                    means = arr.mean(axis=0)
                    luma = (77 * arr[:, 0] + 150 * arr[:, 1] + 29 * arr[:, 2]) >> 8
                    rows.append(
                        (
                            int(aid),
                            n,
                            float(means[0]),
                            float(means[1]),
                            float(means[2]),
                            int(luma.min()),
                            int(luma.max()),
                        )
                    )
                else:
                    rows.append((int(aid), 0, 0.0, 0.0, 0.0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_pixels", "mean_r", "mean_g", "mean_b",
                    "min_luma", "max_luma",
                ],
            )

    return decoded.mapInPandas(batches, PIXEL_STATS_SCHEMA)


PIXEL_STATS_EXACT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_pixels", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("min_luma", LongType()),
        StructField("max_luma", LongType()),
    ]
)


def pixel_stats_exact(decoded: DataFrame) -> DataFrame:
    """Integer-exact per-image statistics over decoded RGB buffers:
    channel SUMS instead of means, plus min/max integer luma ((77R +
    150G + 29B) >> 8).  Every output is a bigint, so the whole decode ->
    featurise path is driver-oracle-checkable bit-for-bit (means divide
    and are kept on pixel_stats, the analyst-facing variant)."""

    # Vectorised ACROSS rows, not per row (r10 optimization, guide
    # section 4.2): typical decoded thumbnails are tens of pixels, so a
    # per-row numpy pipeline (8+ array ops on a 16-element array) is
    # pure call overhead -- measured 24.8s of task time for 0.4s of
    # executor CPU on multimodal_image_decode_stats.  All rows of a
    # batch concatenate into ONE pixel array; per-row sums come from a
    # prefix-sum difference and per-row min/max luma from reduceat over
    # the row-start offsets (empty rows stay all-zero, exactly the old
    # per-row else-branch).  Results are bit-identical integer math.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            trimmed = [
                (bytes(px) if px is not None else b"")[: (len(px or b"") // 3) * 3]
                for px in pdf["pixels"]
            ]
            lens = np.fromiter(
                (len(t) // 3 for t in trimmed), dtype=np.int64, count=n_rows
            )
            sums = np.zeros((n_rows, 3), dtype=np.int64)
            min_l = np.zeros(n_rows, dtype=np.int64)
            max_l = np.zeros(n_rows, dtype=np.int64)
            if int(lens.sum()):
                arr = (
                    np.frombuffer(b"".join(trimmed), dtype=np.uint8)
                    .reshape(-1, 3)
                    .astype(np.int64)
                )
                starts = np.zeros(n_rows + 1, dtype=np.int64)
                np.cumsum(lens, out=starts[1:])
                cs = np.vstack(
                    [np.zeros((1, 3), dtype=np.int64), np.cumsum(arr, axis=0)]
                )
                sums = cs[starts[1:]] - cs[starts[:-1]]
                luma = (77 * arr[:, 0] + 150 * arr[:, 1] + 29 * arr[:, 2]) >> 8
                # a non-empty row's segment ends exactly where the next
                # non-empty row starts (empty rows contribute nothing),
                # so reduceat over non-empty starts is per-row min/max
                nz = np.flatnonzero(lens)
                min_l[nz] = np.minimum.reduceat(luma, starts[nz])
                max_l[nz] = np.maximum.reduceat(luma, starts[nz])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64").to_numpy(),
                    "n_pixels": lens,
                    "sum_r": sums[:, 0],
                    "sum_g": sums[:, 1],
                    "sum_b": sums[:, 2],
                    "min_luma": min_l,
                    "max_luma": max_l,
                }
            )

    return decoded.mapInPandas(batches, PIXEL_STATS_EXACT_SCHEMA)


def _row_pixel_stats(px: bytes) -> tuple[int, int, int, int, int, int]:
    """pixel_stats_exact's per-row math (bit-identical): n_pixels,
    channel sums, min/max integer luma for ONE decoded RGB buffer."""
    arr = np.frombuffer(px, dtype=np.uint8)
    arr = arr[: (arr.size // 3) * 3].reshape(-1, 3).astype(np.int64)
    n = int(arr.shape[0])
    if not n:
        return 0, 0, 0, 0, 0, 0
    sums = arr.sum(axis=0)
    luma = (77 * arr[:, 0] + 150 * arr[:, 1] + 29 * arr[:, 2]) >> 8
    return n, int(sums[0]), int(sums[1]), int(sums[2]), int(luma.min()), int(luma.max())


def image_stats_batch(ids, blobs) -> pd.DataFrame:
    """Container decode -> integer-exact pixel stats for one batch of
    image blobs, the BMP/PPM parse VECTORISED BY HEADER SHAPE (r11,
    guide 4.2 / r10 verdict #8): header fields for every BMP come from
    one numpy view over the stacked 54-byte headers, and every group of
    blobs sharing (offset, width, height) decodes as ONE reshaped
    array whose channel sums / luma min-max reduce per image along a
    single axis -- no per-row numpy pipeline, no intermediate per-row
    pixel buffers.  Rows with irregular containers (odd bpp,
    truncated payloads, PIL formats) take the EXACT per-row
    _decode_bmp/_decode_ppm/PIL path, so acceptance, rejection and
    error types are identical to decode_images + pixel_stats_exact
    (stats are pixel-order invariant, so the bottom-up flip is skipped;
    the BGR channel swap is applied via index order)."""
    import io
    import struct

    n_rows = len(ids)
    out_n = np.zeros(n_rows, dtype=np.int64)
    out_sum = np.zeros((n_rows, 3), dtype=np.int64)
    out_min = np.zeros(n_rows, dtype=np.int64)
    out_max = np.zeros(n_rows, dtype=np.int64)
    bmp_groups: dict = {}  # (offset, width, abs_height) -> [row indices]
    ppm_groups: dict = {}  # (pos, width, height) -> [row indices]
    blobs = [bytes(b or b"") for b in blobs]

    def _fallback(i: int, blob: bytes) -> None:
        if blob[:2] == b"BM":
            _, _, px = _decode_bmp(blob)
        elif blob[:2] == b"P6":
            _, _, px = _decode_ppm(blob)
        else:
            pil = _require("PIL", "PNG/JPEG decode")
            img = pil.Image.open(io.BytesIO(blob)).convert("RGB")
            px = img.tobytes()
        (
            out_n[i], out_sum[i, 0], out_sum[i, 1], out_sum[i, 2],
            out_min[i], out_max[i],
        ) = _row_pixel_stats(px)

    for i, blob in enumerate(blobs):
        head = blob[:2]
        if head == b"BM" and len(blob) >= 54:
            off, = struct.unpack("<I", blob[10:14])
            w, h = struct.unpack("<ii", blob[18:26])
            bpp, = struct.unpack("<H", blob[28:30])
            comp, = struct.unpack("<I", blob[30:34])
            ah = abs(h)
            need = ((w * 3 + 3) & ~3) * ah
            if (
                bpp == 24 and comp == 0 and w > 0 and ah > 0
                and len(blob) >= off + need
            ):
                bmp_groups.setdefault((off, w, ah), []).append(i)
            else:
                _fallback(i, blob)
        elif head == b"P6":
            # the header tokenizer is a bounded integer scan; payload
            # decode + stats stay vectorised per (pos, w, h) group
            try:
                pos, tokens = 2, []
                while len(tokens) < 3 and pos < len(blob):
                    c = blob[pos]
                    if c in b"#":
                        pos = blob.index(b"\n", pos) + 1
                    elif c in b" \t\r\n":
                        pos += 1
                    else:
                        end = pos
                        while end < len(blob) and blob[end] not in b" \t\r\n#":
                            end += 1
                        tokens.append(int(blob[pos:end]))
                        pos = end
                w, h, maxval = tokens
                pos += 1
                ok = maxval == 255 and w > 0 and h > 0 and len(blob) >= pos + w * h * 3
            except Exception:
                ok = False
            if ok:
                ppm_groups.setdefault((pos, w, h), []).append(i)
            else:
                _fallback(i, blob)  # raises exactly as _decode_ppm would
        else:
            _fallback(i, blob)

    def _group_stats(idx: list, pixels: np.ndarray, npix: int) -> None:
        # pixels: (g, npix, 3) int64 in RGB channel order
        rows = np.asarray(idx)
        out_n[rows] = npix
        out_sum[rows] = pixels.sum(axis=1)
        luma = (
            77 * pixels[:, :, 0] + 150 * pixels[:, :, 1] + 29 * pixels[:, :, 2]
        ) >> 8
        out_min[rows] = luma.min(axis=1)
        out_max[rows] = luma.max(axis=1)

    for (off, w, ah), idx in bmp_groups.items():
        row_bytes = (w * 3 + 3) & ~3
        need = row_bytes * ah
        raw = np.frombuffer(
            b"".join(blobs[i][off : off + need] for i in idx), dtype=np.uint8
        ).reshape(len(idx), ah, row_bytes)
        # BGR payload: reversing the channel axis IS the BGR->RGB swap;
        # the bottom-up row flip is a pure pixel permutation, invisible
        # to sums and min/max
        rgb = (
            raw[:, :, : w * 3]
            .reshape(len(idx), ah, w, 3)[:, :, :, ::-1]
            .astype(np.int64)
            .reshape(len(idx), ah * w, 3)
        )
        _group_stats(idx, rgb, ah * w)
    for (pos, w, h), idx in ppm_groups.items():
        need = w * h * 3
        rgb = (
            np.frombuffer(
                b"".join(blobs[i][pos : pos + need] for i in idx), dtype=np.uint8
            )
            .astype(np.int64)
            .reshape(len(idx), h * w, 3)
        )
        _group_stats(idx, rgb, h * w)

    return pd.DataFrame(
        {
            "asset_id": np.asarray([int(a) for a in ids], dtype=np.int64),
            "n_pixels": out_n,
            "sum_r": out_sum[:, 0],
            "sum_g": out_sum[:, 1],
            "sum_b": out_sum[:, 2],
            "min_luma": out_min,
            "max_luma": out_max,
        }
    )


def decode_image_stats_exact(df: DataFrame) -> DataFrame:
    """decode_images + pixel_stats_exact fused into ONE Arrow crossing
    (blobs cross to Python once, per-row pixel buffers never cross
    back), with the container parse vectorised by header shape -- see
    image_stats_batch.  Output and error behavior are bit-identical to
    pixel_stats_exact(decode_images(df)); pinned by
    tests/test_multimodal.py."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield image_stats_batch(pdf["asset_id"], pdf["data"])

    return df.mapInPandas(batches, PIXEL_STATS_EXACT_SCHEMA)


def extract_wav_pcm(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Strip the WAV container: RIFF chunk walk to the `data` chunk,
    returning (asset_id, data) where data is the raw PCM payload --
    the un-containerised input waveform_stats expects.  Pure stdlib
    (the RIFF layout is a public spec); non-WAV blobs yield empty PCM."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf["data"]):
                blob = bytes(blob or b"")
                pcm = b""
                if len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                    pos = 12
                    while pos + 8 <= len(blob):
                        cid = blob[pos : pos + 4]
                        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
                        if cid == b"data":
                            pcm = blob[pos + 8 : pos + 8 + size]
                            break
                        pos += 8 + size + (size % 2)  # chunks are word-aligned
                rows.append((int(aid), pcm))
            yield pd.DataFrame(rows, columns=["asset_id", "data"])

    return df.mapInPandas(
        batches,
        StructType(
            [StructField("asset_id", LongType()), StructField("data", BinaryType())]
        ),
    )


WAVEFORM_EXACT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("sum_abs", LongType()),
        StructField("peak_abs", LongType()),
    ]
)


def waveform_stats_exact(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Integer-exact waveform statistics over raw 16-bit LE mono PCM:
    sample count, zero crossings, sum of |sample| and peak |sample| --
    all bigints, so the audio path is driver-oracle-checkable (RMS
    needs a sqrt and stays on waveform_stats)."""

    # Vectorised across rows like pixel_stats_exact above (guide 4.2):
    # 64-sample clips make per-row numpy pure call overhead.  See
    # pcm_stats_batch for the math.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield pcm_stats_batch(
                    pdf[id_col].astype("int64").to_numpy(), pdf["data"]
                )

    return df.mapInPandas(batches, WAVEFORM_EXACT_SCHEMA)


def pcm_stats_batch(ids, pcms) -> pd.DataFrame:
    """waveform_stats_exact's batch math over raw PCM blobs: per-row
    |sample| sums and zero-crossing counts come from prefix-sum
    differences over the batch-concatenated sample array; the crossing
    prefix sum is over ADJACENT-pair sign changes indexed so row
    boundaries never bleed (a row [st, e) counts pairs
    csd[e-1] - csd[st]).  Bit-identical integer outputs."""
    n_rows = len(ids)
    trimmed = [
        (bytes(b) if b is not None else b"")[
            : len(b or b"") - (len(b or b"") % 2)
        ]
        for b in pcms
    ]
    lens = np.fromiter(
        (len(t) // 2 for t in trimmed), dtype=np.int64, count=n_rows
    )
    zc = np.zeros(n_rows, dtype=np.int64)
    sum_abs = np.zeros(n_rows, dtype=np.int64)
    peak = np.zeros(n_rows, dtype=np.int64)
    if int(lens.sum()):
        s = np.frombuffer(b"".join(trimmed), dtype="<i2").astype(np.int64)
        a = np.abs(s)
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        csa = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(a)])
        sum_abs = csa[starts[1:]] - csa[starts[:-1]]
        nz = np.flatnonzero(lens)
        peak[nz] = np.maximum.reduceat(a, starts[nz])
        if s.size > 1:
            sb = np.signbit(s)
            d = (sb[1:] != sb[:-1]).astype(np.int64)
            csd = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(d)])
            m2 = lens >= 2
            zc[m2] = csd[starts[1:][m2] - 1] - csd[starts[:-1][m2]]
    return pd.DataFrame(
        {
            "asset_id": np.asarray(ids, dtype=np.int64),
            "n_samples": lens,
            "zero_crossings": zc,
            "sum_abs": sum_abs,
            "peak_abs": peak,
        }
    )


def extract_pcm_batch(blobs) -> list:
    """extract_wav_pcm's per-row RIFF walk with the canonical-header
    fast path (r11, guide 4.2): a blob laid out as RIFF/WAVE + 16-byte
    'fmt ' chunk at 12 + 'data' chunk at 36 -- every standard PCM WAV
    writer's layout -- yields its payload by two slice comparisons and
    one unpack, exactly what the chunk walk would return (walk: pos=12
    is 'fmt ' size 16 -> pos=36 is 'data' -> pcm at 44).  Anything else
    takes the original chunk walk.  Non-WAV blobs yield b'' as before."""
    import struct

    out = []
    for b in blobs:
        blob = bytes(b or b"")
        pcm = b""
        if len(blob) >= 44 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            if blob[12:16] == b"fmt " and blob[16:20] == b"\x10\x00\x00\x00" and blob[36:40] == b"data":
                size = struct.unpack("<I", blob[40:44])[0]
                pcm = blob[44 : 44 + size]
            else:
                pos = 12
                while pos + 8 <= len(blob):
                    cid = blob[pos : pos + 4]
                    size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
                    if cid == b"data":
                        pcm = blob[pos + 8 : pos + 8 + size]
                        break
                    pos += 8 + size + (size % 2)  # chunks are word-aligned
        elif len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            pos = 12
            while pos + 8 <= len(blob):
                cid = blob[pos : pos + 4]
                size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
                if cid == b"data":
                    pcm = blob[pos + 8 : pos + 8 + size]
                    break
                pos += 8 + size + (size % 2)
        out.append(pcm)
    return out


def wav_waveform_stats_exact(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """extract_wav_pcm + waveform_stats_exact fused into ONE Arrow
    crossing (container blobs cross once; PCM payloads never cross
    back) -- bit-identical to waveform_stats_exact(extract_wav_pcm(df));
    pinned by tests/test_multimodal.py."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield pcm_stats_batch(
                    pdf[id_col].astype("int64").to_numpy(),
                    extract_pcm_batch(pdf["data"]),
                )

    return df.mapInPandas(batches, WAVEFORM_EXACT_SCHEMA)


WAVEFORM_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def waveform_stats(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Audio feature extraction over raw PCM: RMS level, peak, and
    zero-crossing count per asset.  The blob is interpreted as 16-bit
    little-endian mono PCM -- the post-decode layout every audio codec
    path produces -- so this stage is fully real; only the upstream
    codec decode (mp3/ogg -> PCM) is a stub in this container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf["data"]):
                blob = blob or b""
                usable = len(blob) - (len(blob) % 2)
                samples = np.frombuffer(blob[:usable], dtype="<i2").astype(np.float64)
                n = int(samples.size)
                if n:
                    norm = samples / 32768.0
                    rms = float(np.sqrt(np.mean(norm * norm)))
                    peak = float(np.abs(norm).max())
                    zc = int(np.count_nonzero(np.diff(np.signbit(samples))))
                else:
                    rms, peak, zc = 0.0, 0.0, 0
                rows.append((int(aid), n, rms, peak, zc))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_samples", "rms", "peak", "zero_crossings"],
            )

    return df.mapInPandas(batches, WAVEFORM_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """64-bit block-mean perceptual hash: split the payload into 64 equal
    byte blocks, bit i = (block i mean > global mean).  On decoded pixel
    buffers this IS block-mean pHash; on raw bytes it is a deterministic
    stand-in with identical schema and hamming-distance semantics, so
    downstream near-dup bucketing (simhash-style banding) is exercised
    for real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf["data"]):
                arr = np.frombuffer(blob or b"\x00", dtype=np.uint8)
                blocks = np.array_split(arr.astype(np.float64), 64)
                means = np.array([b.mean() if b.size else 0.0 for b in blocks])
                bits = (means > means.mean()).astype(np.uint64)
                weights = (1 << np.arange(64, dtype=np.uint64))
                rows.append((int(aid), int((bits * weights).sum().astype(np.int64))))
            yield pd.DataFrame(rows, columns=["asset_id", "phash"])

    return df.mapInPandas(batches, PHASH_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_data", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling.  Real video decode needs ffmpeg/
    pyav (absent); this samples n equal-offset byte windows per asset --
    a deterministic fake with the exact schema, fan-out shape (one input
    row -> n output rows), and batch behavior of the real operator."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["data"]):
                blob = blob or b""
                window = max(1, len(blob) // max(n_frames, 1))
                for i in range(n_frames):
                    start = i * window
                    rows.append((int(aid), i, blob[start : start + window]))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "frame_data"]
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
    ]
)


def _probe_one(blob: bytes):
    """Parse real container headers with stdlib struct -- WAV (RIFF chunk
    walk), PNG (IHDR), JPEG (SOF marker scan).  No codec library: header
    layout is public format spec, so this step is fully real even where
    the pixel/sample decode is stubbed."""
    import struct

    if len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        pos = 12
        while pos + 8 <= len(blob):
            cid, size = blob[pos : pos + 4], struct.unpack(
                "<I", blob[pos + 4 : pos + 8]
            )[0]
            if cid == b"fmt " and pos + 24 <= len(blob):
                _, ch, rate = struct.unpack("<HHI", blob[pos + 8 : pos + 16])
                bits = struct.unpack("<H", blob[pos + 22 : pos + 24])[0]
                return ("wav", None, None, rate, ch, bits)
            pos += 8 + size + (size % 2)  # chunks are word-aligned
        return ("wav", None, None, None, None, None)
    if len(blob) >= 24 and blob[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", blob[16:24])
        return ("png", w, h, None, None, None)
    if len(blob) >= 2 and blob[:2] == b"\xff\xd8":
        pos = 2
        while pos + 9 <= len(blob) and blob[pos] == 0xFF:
            marker, size = blob[pos + 1], struct.unpack(
                ">H", blob[pos + 2 : pos + 4]
            )[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                h, w = struct.unpack(">HH", blob[pos + 5 : pos + 9])
                return ("jpeg", w, h, None, None, None)
            pos += 2 + size
        return ("jpeg", None, None, None, None, None)
    return ("unknown", None, None, None, None, None)


def probe_container_metadata(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Typed metadata from binary media columns without decoding payloads:
    the downstream filters ("only 16 kHz mono", "images wider than X")
    then stay columnar over this frame instead of touching blobs again."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (int(aid), *_probe_one(blob or b""))
                for aid, blob in zip(pdf[id_col], pdf["data"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "format", "width", "height",
                    "sample_rate", "channels", "bits",
                ],
            )

    return df.mapInPandas(batches, PROBE_SCHEMA)
