"""Multimodal binary-column plumbing: schemas, batching, fan-out, and the
codec-free feature extractor are real; codec steps raise NotImplementedError
naming the missing library."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
    decode_images,
    extract_byte_features,
    rebalance_by_size,
    sample_frames,
)


def media_df(spark, n=6, blob_size=1000):
    rows = [
        (i, bytes((i * 7 + j) % 256 for j in range(blob_size * (1 + i % 3))), None)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "asset_id bigint, data binary, meta struct<media_type:string>"
    )


class TestByteFeatures:
    def test_matches_numpy_reference(self, spark):
        import numpy as np

        df = media_df(spark)
        got = {r["asset_id"]: r for r in extract_byte_features(df).collect()}
        for row in df.collect():
            arr = np.frombuffer(bytes(row["data"]), dtype=np.uint8)
            counts = np.bincount(arr >> 4, minlength=16).astype(float)
            probs = counts / arr.size
            nz = probs[probs > 0]
            want_entropy = float(-(nz * np.log2(nz)).sum())
            g = got[row["asset_id"]]
            assert g["n_bytes"] == arr.size
            assert math.isclose(g["byte_entropy"], want_entropy, rel_tol=1e-12)
            assert len(g["byte_histogram"]) == 16
            assert math.isclose(sum(g["byte_histogram"]), 1.0, rel_tol=1e-9)

    def test_empty_blob(self, spark):
        df = spark.createDataFrame(
            [(1, b"", None)], "asset_id bigint, data binary, meta struct<media_type:string>"
        )
        row = extract_byte_features(df).collect()[0]
        assert row["n_bytes"] == 0 and row["byte_entropy"] == 0.0


class TestFrameSampling:
    def test_fanout_shape_and_determinism(self, spark):
        df = media_df(spark, n=3)
        frames = sample_frames(df, n_frames=4)
        rows = frames.collect()
        assert len(rows) == 12  # 3 assets x 4 frames
        by_asset = {}
        for r in rows:
            by_asset.setdefault(r["asset_id"], []).append(r)
        for aid, fs in by_asset.items():
            assert sorted(f["frame_index"] for f in fs) == [0, 1, 2, 3]
        # deterministic across runs
        again = {(r["asset_id"], r["frame_index"]): bytes(r["frame_data"]) for r in frames.collect()}
        first = {(r["asset_id"], r["frame_index"]): bytes(r["frame_data"]) for r in rows}
        assert again == first


class TestCodecStubs:
    def test_decode_images_names_missing_library(self, spark):
        df = media_df(spark, n=1)
        with pytest.raises(Exception) as err:
            decode_images(df).collect()
        assert "PIL" in str(err.value)


class TestRebalance:
    def test_partition_count_scales_with_bytes(self, spark):
        df = media_df(spark, n=8, blob_size=1000)
        out = rebalance_by_size(df, target_partition_bytes=4000)
        assert out.rdd.getNumPartitions() >= 2


class TestWaveformStats:
    def test_matches_numpy_on_known_signal(self, spark):
        import numpy as np

        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import waveform_stats

        # a square wave: +/-16384 alternating every sample
        samples = np.tile([16384, -16384], 100).astype("<i2")
        df = spark.createDataFrame(
            [(1, bytearray(samples.tobytes()))], "asset_id bigint, data binary"
        )
        r = waveform_stats(df).collect()[0]
        assert r["n_samples"] == 200
        assert abs(r["rms"] - 0.5) < 1e-9
        assert abs(r["peak"] - 0.5) < 1e-9
        assert r["zero_crossings"] == 199

    def test_empty_and_odd_length(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import waveform_stats

        df = spark.createDataFrame(
            [(1, bytearray(b"")), (2, bytearray(b"\x01\x02\x03"))],
            "asset_id bigint, data binary",
        )
        rows = {r["asset_id"]: r for r in waveform_stats(df).collect()}
        assert rows[1]["n_samples"] == 0 and rows[1]["rms"] == 0.0
        assert rows[2]["n_samples"] == 1  # trailing odd byte dropped


class TestPerceptualHash:
    def test_deterministic_and_similarity_ordering(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import perceptual_hash

        base = bytes(range(256)) * 8
        near = bytearray(base)
        near[0] ^= 0xFF  # tiny perturbation
        far = bytes(reversed(base))
        df = spark.createDataFrame(
            [(1, bytearray(base)), (2, near), (3, bytearray(far))],
            "asset_id bigint, data binary",
        )
        h = {r["asset_id"]: r["phash"] for r in perceptual_hash(df).collect()}
        h2 = {r["asset_id"]: r["phash"] for r in perceptual_hash(df).collect()}
        assert h == h2  # deterministic
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        assert ham(h[1], h[2]) <= ham(h[1], h[3])


class TestContainerProbe:
    """probe_container_metadata parses REAL format headers (stdlib-built
    WAV via the wave module; spec-conformant PNG/JPEG header bytes)."""

    def _probe(self, spark, blobs):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            probe_container_metadata,
        )

        df = spark.createDataFrame(
            [(i, b) for i, b in enumerate(blobs)],
            "asset_id bigint, data binary",
        )
        return {
            r["asset_id"]: r.asDict()
            for r in probe_container_metadata(df).collect()
        }

    def test_wav_png_jpeg_and_unknown(self, spark):
        import io
        import struct
        import wave
        import zlib

        # real WAV written by the stdlib encoder
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(b"\x00\x00" * 64)
        wav = buf.getvalue()

        # minimal spec-conformant PNG: signature + IHDR (37x21)
        ihdr = struct.pack(">II", 37, 21) + b"\x08\x02\x00\x00\x00"
        png = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )

        # JPEG: SOI, APP0 (skipped by the scan), SOF0 with 480x640
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
            ">HH", 480, 640
        ) + b"\x03" + b"\x00" * 9
        jpeg = b"\xff\xd8" + app0 + sof0

        got = self._probe(spark, [wav, png, jpeg, b"plain text"])
        assert got[0]["format"] == "wav"
        assert (got[0]["sample_rate"], got[0]["channels"], got[0]["bits"]) == (
            16000, 2, 16,
        )
        assert got[1]["format"] == "png"
        assert (got[1]["width"], got[1]["height"]) == (37, 21)
        assert got[2]["format"] == "jpeg"
        assert (got[2]["width"], got[2]["height"]) == (640, 480)
        assert got[3]["format"] == "unknown"

    def test_truncated_headers_do_not_crash(self, spark):
        got = self._probe(
            spark, [b"RIFF\x04\x00\x00\x00WAVE", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b""]
        )
        assert got[0]["format"] == "wav" and got[0]["sample_rate"] is None
        assert got[1]["format"] == "unknown"  # PNG needs the full IHDR
        assert got[2]["format"] == "jpeg" and got[2]["width"] is None
        assert got[3]["format"] == "unknown"


def _make_bmp(width, height, pixels_rgb):
    """Minimal uncompressed 24-bit bottom-up BMP from a row-major
    top-down RGB pixel list."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - width * 3)
    body = b""
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = b""
        for x in range(width):
            r, g, b = pixels_rgb[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        body += row + pad
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + dib + body


def _make_ppm(width, height, pixels_rgb, comment=True):
    head = b"P6\n"
    if comment:
        head += b"# synthetic fixture\n"
    head += f"{width} {height}\n255\n".encode()
    return head + b"".join(bytes(p) for p in pixels_rgb)


class TestPurePythonDecode:
    PIXELS = [
        (255, 0, 0), (0, 255, 0), (0, 0, 255),
        (10, 20, 30), (40, 50, 60), (70, 80, 90),
    ]  # 3x2 top-down row-major

    def _decode(self, spark, blob):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            decode_images,
        )

        df = spark.createDataFrame([(1, bytearray(blob))], "asset_id long, data binary")
        return decode_images(df).collect()[0]

    def test_bmp_roundtrip(self, spark):
        row = self._decode(spark, _make_bmp(3, 2, self.PIXELS))
        assert (row.width, row.height) == (3, 2)
        assert bytes(row.pixels) == b"".join(bytes(p) for p in self.PIXELS)

    def test_bmp_row_padding_is_stripped(self, spark):
        """Width 3 -> 9-byte rows pad to 12 on disk; padding must not
        leak into the pixel buffer (this is the classic BMP bug)."""
        row = self._decode(spark, _make_bmp(3, 2, self.PIXELS))
        assert len(row.pixels) == 3 * 2 * 3

    def test_ppm_roundtrip_with_comment(self, spark):
        row = self._decode(spark, _make_ppm(3, 2, self.PIXELS))
        assert (row.width, row.height) == (3, 2)
        assert bytes(row.pixels) == b"".join(bytes(p) for p in self.PIXELS)

    def test_decode_to_pixel_stats_end_to_end(self, spark):
        """The full real path: container bytes -> decode -> channel
        stats, no codec library anywhere."""
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            decode_images,
            pixel_stats,
        )

        df = spark.createDataFrame(
            [
                (1, bytearray(_make_bmp(3, 2, self.PIXELS))),
                (2, bytearray(_make_ppm(3, 2, self.PIXELS))),
            ],
            "asset_id long, data binary",
        )
        got = {r.asset_id: r for r in pixel_stats(decode_images(df)).collect()}
        import numpy as np

        arr = np.array(self.PIXELS, dtype=np.int64)
        want_means = arr.mean(axis=0)
        luma = (77 * arr[:, 0] + 150 * arr[:, 1] + 29 * arr[:, 2]) >> 8
        for aid in (1, 2):  # both containers decode to identical pixels
            r = got[aid]
            assert r.n_pixels == 6
            assert (r.mean_r, r.mean_g, r.mean_b) == tuple(want_means)
            assert (r.min_luma, r.max_luma) == (int(luma.min()), int(luma.max()))

    def test_png_still_import_gated(self, spark):
        import pytest as _pytest
        from py4j.protocol import Py4JJavaError

        png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
        with _pytest.raises(Exception) as exc:
            self._decode(spark, png_magic)
        assert "PIL" in str(exc.value) or "NotImplementedError" in str(exc.value)


class TestExactOperators:
    """Integer-exact multimodal reducers (r10): the driver-oracle-checkable
    twins of pixel_stats / waveform_stats."""

    PIXELS = [
        (10, 20, 30), (200, 100, 0), (255, 255, 255),
        (0, 0, 0), (1, 2, 3), (90, 180, 45),
    ]

    def test_pixel_stats_exact_matches_numpy(self, spark):
        import numpy as np

        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            decode_images,
            pixel_stats_exact,
        )

        df = spark.createDataFrame(
            [
                (1, bytearray(_make_bmp(3, 2, self.PIXELS))),
                (2, bytearray(_make_ppm(3, 2, self.PIXELS))),
            ],
            "asset_id long, data binary",
        )
        got = {r.asset_id: r for r in pixel_stats_exact(decode_images(df)).collect()}
        arr = np.array(self.PIXELS, dtype=np.int64)
        sums = arr.sum(axis=0)
        luma = (77 * arr[:, 0] + 150 * arr[:, 1] + 29 * arr[:, 2]) >> 8
        for aid in (1, 2):
            r = got[aid]
            assert r.n_pixels == 6
            assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(s) for s in sums)
            assert (r.min_luma, r.max_luma) == (int(luma.min()), int(luma.max()))

    def test_wav_pcm_extraction_and_exact_stats(self, spark):
        """Real WAV (stdlib wave module) -> extract_wav_pcm strips the
        container byte-exactly -> waveform_stats_exact matches numpy."""
        import io
        import wave as wavemod

        import numpy as np

        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            extract_wav_pcm,
            waveform_stats_exact,
        )

        samples = np.array([100, -200, 300, -400, 0, 32767, -32768, 5],
                           dtype="<i2")
        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(samples.tobytes())
        blob = buf.getvalue()
        df = spark.createDataFrame(
            [(7, bytearray(blob))], "asset_id long, data binary"
        )
        pcm = extract_wav_pcm(df)
        assert bytes(pcm.collect()[0]["data"]) == samples.tobytes()
        r = waveform_stats_exact(pcm).collect()[0]
        s = samples.astype(np.int64)
        assert r.n_samples == 8
        assert r.sum_abs == int(np.abs(s).sum())
        assert r.peak_abs == 32768
        assert r.zero_crossings == int(
            np.count_nonzero(np.diff(np.signbit(s)))
        )

    def test_extract_wav_pcm_non_wav_is_empty(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import extract_wav_pcm

        df = spark.createDataFrame(
            [(1, bytearray(b"not a riff file"))], "asset_id long, data binary"
        )
        assert bytes(extract_wav_pcm(df).collect()[0]["data"]) == b""


class TestMetadataPushdownWithoutBlobs:
    """Pins the 100 TB-critical layout property (r9 verdict #2): width /
    media_type predicates over the typed metadata struct reach the
    parquet scan as pushed filters, and a metadata-only projection prunes
    the blob column out of ReadSchema entirely -- filtering a media lake
    never touches the bytes."""

    def _write_media(self, spark, tmp_path):
        import random

        rnd = random.Random(7)
        rows = [
            (
                i,
                bytes(rnd.getrandbits(8) for _ in range(64)),
                ("image/bmp" if i % 2 else "audio/wav",
                 100 + i, 80 + i, 16000, 1000, "raw"),
            )
            for i in range(50)
        ]
        path = str(tmp_path / "media_lake")
        spark.createDataFrame(
            rows,
            "asset_id bigint, data binary, meta struct<media_type:string,"
            "width:int,height:int,sample_rate:int,duration_ms:bigint,"
            "codec:string>",
        ).write.mode("overwrite").parquet(path)
        return path

    def test_metadata_filter_pushes_and_prunes_blob(self, spark, tmp_path):
        path = self._write_media(spark, tmp_path)
        q = (
            spark.read.parquet(path)
            .filter(
                (F.col("meta.width") > 120)
                & (F.col("meta.media_type") == "image/bmp")
            )
            .select("asset_id", "meta.width", "meta.media_type")
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
        assert scan, plan
        scan_line = scan[0]
        # the struct-field predicates reach the scan
        assert "PushedFilters: [" in scan_line
        assert "width" in scan_line.split("PushedFilters:")[1].split("]")[0]
        # and the blob column is pruned out of the read schema
        read_schema = scan_line.split("ReadSchema:")[1]
        assert "data" not in read_schema
        assert "width" in read_schema
        # correctness of the pruned plan
        rows = q.collect()
        assert rows and all(r["width"] > 120 for r in rows)

    def test_rebalance_by_size_respects_byte_budget(self, spark, tmp_path):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import rebalance_by_size

        path = self._write_media(spark, tmp_path)
        df = spark.read.parquet(path)  # 50 x 64-byte blobs = 3200 bytes
        out = rebalance_by_size(df, target_partition_bytes=1000)
        assert out.rdd.getNumPartitions() == 4  # 3200/1000 + 1


class TestFusedDecodeStats:
    """r11 fused single-crossing operators must stay bit-identical --
    rows, values, and error behavior -- to the chained operator form
    (decode_images + pixel_stats_exact; extract_wav_pcm +
    waveform_stats_exact), including on irregular containers that force
    the per-row fallback path."""

    def _image_cases(self):
        import struct

        pix6 = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                (10, 20, 30), (40, 50, 60), (70, 80, 90)]
        cases = [
            _make_bmp(3, 2, pix6),          # padded rows, bottom-up
            _make_ppm(3, 2, pix6),          # comment header
            _make_bmp(1, 1, [(7, 8, 9)]),   # different shape: new group
            _make_bmp(3, 2, pix6) + b"tail",  # oversized blob, same decode
            b"P6\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6]),
        ]
        # top-down BMP (negative height): fallback path, same stats
        bmp = bytearray(_make_bmp(3, 2, pix6))
        h = struct.unpack("<i", bmp[22:26])[0]
        bmp[22:26] = struct.pack("<i", -h)
        cases.append(bytes(bmp))
        return cases

    def test_image_fused_matches_chain(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            decode_image_stats_exact,
            decode_images,
            pixel_stats_exact,
        )

        rows = [(i, bytearray(b)) for i, b in enumerate(self._image_cases())]
        df = spark.createDataFrame(rows, "asset_id long, data binary")
        chained = {
            r.asset_id: r
            for r in pixel_stats_exact(decode_images(df)).collect()
        }
        fused = {r.asset_id: r for r in decode_image_stats_exact(df).collect()}
        assert chained.keys() == fused.keys()
        for k in chained:
            assert chained[k].asDict() == fused[k].asDict(), k

    def test_image_fused_rejects_like_chain(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            decode_image_stats_exact,
        )

        # 8-bit BMP: ValueError from _decode_bmp, exactly as the chain
        import struct

        blob = bytearray(_make_bmp(2, 1, [(1, 2, 3), (4, 5, 6)][:2]))
        blob[28:30] = struct.pack("<H", 8)
        df = spark.createDataFrame(
            [(1, bytearray(bytes(blob)))], "asset_id long, data binary"
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="24-bit BMP"):
            decode_image_stats_exact(df).collect()

    def test_wav_fused_matches_chain(self, spark):
        import struct

        from dataworks_aws_corporate_data_ingestion_spark.multimodal.binary import (
            extract_wav_pcm,
            wav_waveform_stats_exact,
            waveform_stats_exact,
        )

        pcm = struct.pack("<8h", 0, 5, -3, 7, -1, 0, 2, -9)

        def wav(extra_chunk: bool) -> bytes:
            fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
                "<HHIIHH", 1, 1, 8000, 16000, 2, 16
            )
            mid = b"LIST" + struct.pack("<I", 4) + b"INFO" if extra_chunk else b""
            data = b"data" + struct.pack("<I", len(pcm)) + pcm
            body = b"WAVE" + fmt + mid + data
            return b"RIFF" + struct.pack("<I", len(body)) + body

        rows = [
            (1, bytearray(wav(False))),   # canonical layout: fast path
            (2, bytearray(wav(True))),    # extra chunk: original walk
            (3, bytearray(b"notwav")),    # non-WAV -> empty PCM
            (4, bytearray(pcm)),          # raw bytes, no container
        ]
        df = spark.createDataFrame(rows, "asset_id long, data binary")
        chained = {
            r.asset_id: r.asDict()
            for r in waveform_stats_exact(extract_wav_pcm(df)).collect()
        }
        fused = {
            r.asset_id: r.asDict() for r in wav_waveform_stats_exact(df).collect()
        }
        assert chained == fused
