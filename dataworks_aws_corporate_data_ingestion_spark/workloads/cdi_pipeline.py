"""The flagship CDI parity operator as an oracle-checked query.

Runs the reference's whole daily-ingest chain (reference
steps/ingesters.py:108-120,505-539) end-to-end on synthetic data:

  events -> envelope JSONL (AES-CTR-encrypted fixture, built in-flight)
         -> envelope parse -> cached-key decrypt -> validate -> sanitise
         -> canonical serialise -> daily row shaping

The fixture payloads are constructed so the byte-exact canonical output is
reproducible by pure string concatenation in ANSI SQL, making the full
pipeline -- crypto included -- value-hash checkable against DuckDB.
Integer amounts (no float formatting), millisecond timestamps (both
engines truncate), and pre-sorted JSON keys keep the two byte streams
identical.

Scale notes: fixture encryption and the decrypt+validate pass are the only
Python crossings (Arrow-batched pandas UDFs); envelope assembly, id/bucket
derivation, and row shaping are JVM column expressions.  32 distinct data
keys across the corpus exercise the per-worker key cache exactly as the
reference's DKS cache is exercised (hit rate ~= 1 - 32/N).
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.crypto import IdentityKeyService
from ..operators.ingest import (
    decrypt_and_process,
    quarantine_missing_db_object,
    to_daily_rows,
)
from ..functions.udfs import envelope_udf
from ..partitioning import fan_out
from ..sources.tables import load_table
from ..workload import register

N_DATA_KEYS = 32
EXPORT_DATE = "2024-01-15"

_MATERIALS_STRUCT = StructType(
    [
        StructField("db_object", StringType()),
        StructField("encrypted_encryption_key", StringType()),
        StructField("initialisation_vector", StringType()),
        StructField("key_encryption_key_id", StringType()),
    ]
)


def _data_key_raw(selector: int) -> bytes:
    """Deterministic 128-bit data key for fixture generation (the identity
    key service treats the 'encrypted' key as the plaintext key, mirroring
    the reference's mocked DKS, steps/tests.py:49-73)."""
    return hashlib.blake2b(f"cdi-key-{selector}".encode(), digest_size=16).digest()


def _encrypt_fixture_udf():
    """Encrypt each payload under one of N_DATA_KEYS deterministic keys,
    emitting the envelope's EncryptionMaterials struct (the engine-side
    analogue of the reference's test-vector generator,
    steps/tests.py:23-46).

    Hot-path shape: records are grouped by key selector within each
    Arrow batch and encrypted via the batched-keystream path (CTR mode
    is symmetric, so aes_ctr_decrypt_batch IS the encryptor) -- one
    cipher operation per data key per batch instead of one per record,
    the same discipline the decrypt side uses.  The IV is the event_id
    as a 128-bit big-endian counter (unique per record, no hash
    needed); base64 is applied once on the way out -- fixture
    generation must not dominate the benchmark it feeds."""

    @pandas_udf(_MATERIALS_STRUCT)
    def _encrypt(payloads: pd.Series, event_ids: pd.Series) -> pd.DataFrame:
        # imported inside the batch fn: module objects in the closure are
        # not picklable
        import numpy as np

        from dataworks_aws_corporate_data_ingestion_spark.functions.crypto import (
            aes_ctr_decrypt_batch,
        )

        keys_raw = [_data_key_raw(i) for i in range(N_DATA_KEYS)]
        keys_b64 = [base64.b64encode(k).decode("ascii") for k in keys_raw]
        keks = [f"kek-{i}" for i in range(N_DATA_KEYS)]
        b64 = base64.b64encode

        n = len(payloads)
        ids = event_ids.to_numpy(dtype=np.int64)
        sels = ids % N_DATA_KEYS
        ivs = [int(e).to_bytes(16, "big") for e in ids]
        pts = [p.encode("utf8") for p in payloads]
        cts: list[bytes | None] = [None] * n
        for sel in np.unique(sels):
            idx = np.nonzero(sels == sel)[0]
            out = aes_ctr_decrypt_batch(
                [pts[i] for i in idx], keys_raw[sel], [ivs[i] for i in idx]
            )
            for i, ct in zip(idx, out):
                cts[i] = ct
        rows = [
            (
                b64(cts[i]).decode("ascii"),
                keys_b64[sels[i]],
                b64(ivs[i]).decode("ascii"),
                keks[sels[i]],
            )
            for i in range(n)
        ]
        return pd.DataFrame(rows, columns=[f.name for f in _MATERIALS_STRUCT.fields])

    return _encrypt


def envelope_lines_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the encrypted kafka-envelope JSONL corpus from `events`.

    Payload key order is irrelevant (canonicalisation sorts), but every
    value is chosen for cross-engine byte-stability: hex ids, integer
    amounts, millisecond timestamps."""
    # the events file is one parquet split; without an explicit
    # repartition the whole per-row crypto chain would run on a single
    # core.  CPU-bound Python stages must be spread across every core --
    # the shuffle of the small input is noise next to the per-row work
    # (on a real cluster the same holds: partition count follows input
    # splits, not CPU budget, so a pre-UDF repartition is load-bearing).
    e = fan_out(load_table(spark, "events", sf_dir))
    # md5-derived hex id: uniform over the 256 id_part buckets (a
    # zero-padded sequential hex id would put every row in bucket "00" --
    # the reference's ids are random hex, so first-2-chars bucketing
    # assumes uniformity, docs/data-storage.md:94-103)
    id_str = F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 12)
    lm = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("+0000")
    )
    is_del = F.col("event_type") == "purchase"
    payload = F.to_json(
        F.struct(
            F.struct(id_str.alias("id")).alias("_id"),
            lm.alias("_lastModifiedDateTime"),
            # null for non-deletes -> to_json omits the field entirely
            F.when(is_del, lm).alias("_removedDateTime"),
            F.floor(F.col("value") * 100).alias("amount"),
            F.col("event_type").alias("event_type"),
        )
    )
    enc = (
        e.select(
            F.col("event_id"),
            id_str.alias("id_str"),
            lm.alias("lm"),
            payload.alias("payload"),
        )
        .withColumn("mat", _encrypt_fixture_udf()(F.col("payload"), F.col("event_id")))
    )
    line = F.to_json(
        F.struct(
            F.struct(
                F.struct(F.col("id_str").alias("id")).alias("_id"),
                F.lit("calculator").alias("db"),
                F.lit("calculationParts").alias("collection"),
                F.struct(
                    F.lit("").alias("encryptionKeyId"),
                    F.col("mat.encrypted_encryption_key").alias(
                        "encryptedEncryptionKey"
                    ),
                    F.col("mat.initialisation_vector").alias("initialisationVector"),
                    F.col("mat.key_encryption_key_id").alias("keyEncryptionKeyId"),
                ).alias("encryption"),
                F.col("mat.db_object").alias("dbObject"),
                F.col("lm").alias("_lastModifiedDateTime"),
            ).alias("message")
        )
    )
    return enc.select(line.alias("value"))


@register(
    "cdi_audit_pipeline",
    tags=("cdi", "ingest", "audit", "udf"),
    oracle="""
        WITH base AS (
            SELECT
                lpad(to_hex(event_id), 10, '0') AS id_str,
                strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') AS lm,
                event_type
            FROM events
        )
        SELECT
            id_str AS id,
            '{"AUDIT_EVENT":"' || event_type
              || '","TIME_STAMP":{"d_date":"' || lm || 'Z"}'
              || ',"TIME_STAMP_ORIG":{"d_date":"' || lm || 'Z"}'
              || ',"_lastModifiedDateTime":{"d_date":"1980-01-01T00:00:00.000Z"}'
              || ',"userId":"u-' || id_str || '"}' AS val,
            CAST(0 AS BOOLEAN) AS is_delete
        FROM base
    """,
)
def cdi_audit_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The businessAudit variant of the CDI chain: the payload's `context`
    element becomes the whole record, stamped with AUDIT_EVENT (from
    auditType) and TIME_STAMP/TIME_STAMP_ORIG from the envelope's
    _lastModifiedDateTime (reference steps/data.py:98-121).

    The oracle spells out three downstream quirks the chain must
    reproduce byte-for-byte: validate adds the epoch-fallback
    _lastModifiedDateTime to a context that has none (reference
    steps/data.py:178-198), the date-shaped TIME_STAMP strings get
    $date-wrapped and UTC-normalised by the recursive walk, and sanitise
    renames every $date to d_date.  Key order is the canonical ASCII
    sort: AUDIT_EVENT < TIME_STAMP < TIME_STAMP_ORIG <
    _lastModifiedDateTime < userId."""
    e = fan_out(load_table(spark, "events", sf_dir))
    id_str = F.lpad(F.hex(F.col("event_id")), 10, "0")
    lm = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("+0000")
    )
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("auditType"),
            F.struct(
                F.concat(F.lit("u-"), id_str).alias("userId"),
            ).alias("context"),
        )
    )
    enc = (
        e.select(
            F.col("event_id"),
            id_str.alias("id_str"),
            lm.alias("lm"),
            payload.alias("payload"),
        )
        .withColumn("mat", _encrypt_fixture_udf()(F.col("payload"), F.col("event_id")))
    )
    line = F.to_json(
        F.struct(
            F.struct(
                F.col("id_str").alias("_id"),
                F.lit("data").alias("db"),
                F.lit("businessAudit").alias("collection"),
                F.struct(
                    F.lit("").alias("encryptionKeyId"),
                    F.col("mat.encrypted_encryption_key").alias(
                        "encryptedEncryptionKey"
                    ),
                    F.col("mat.initialisation_vector").alias("initialisationVector"),
                    F.col("mat.key_encryption_key_id").alias("keyEncryptionKeyId"),
                ).alias("encryption"),
                F.col("mat.db_object").alias("dbObject"),
                F.col("lm").alias("_lastModifiedDateTime"),
            ).alias("message")
        )
    )
    lines = enc.select(line.alias("value"))
    # env stays packed through the quarantine split -- expanding first
    # would double-evaluate the whole Python chain (see ingest.py)
    env = lines.withColumn(
        "env", envelope_udf("data:businessAudit")(F.col("value"))
    )
    good, _quarantined = quarantine_missing_db_object(env)
    processed = decrypt_and_process(good, IdentityKeyService(), audit=True)
    return processed.select("id", "val", "is_delete")


@register(
    "cdi_ingest_pipeline",
    bench=True,
    tags=("cdi", "ingest", "crypto", "udf"),
    oracle="""
        WITH base AS (
            SELECT
                substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS id_str,
                strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') AS lm,
                event_type = 'purchase' AS is_del,
                CAST(FLOOR(value * 100) AS BIGINT) AS amount,
                event_type
            FROM events
        )
        SELECT
            '{"id":"' || id_str || '"}' AS id,
            substr(id_str, 1, 2) AS id_part,
            2024 AS export_year,
            1 AS export_month,
            15 AS export_day,
            CASE WHEN is_del THEN 'DELETE' ELSE 'INSERT' END AS db_type,
            '{"_id":{"id":"' || id_str || '"},"_lastModifiedDateTime":{"d_date":"'
              || lm || 'Z"}'
              || CASE WHEN is_del
                      THEN ',"_removedDateTime":{"d_date":"' || lm || 'Z"}'
                      ELSE '' END
              || ',"amount":' || amount
              || ',"event_type":"' || event_type || '"}' AS val
        FROM base
    """,
)
def cdi_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDI daily-ingest chain over in-flight-encrypted envelopes.

    The oracle reproduces the expected canonical JSON per record by string
    concatenation -- so a hash match proves envelope parsing, AES-CTR
    decryption, date wrapping/UTC normalisation, the sanitise '$'->'d_'
    quirk, delete-flag derivation, canonical key-sorted serialisation, and
    id_part bucketing all at once (reference steps/data.py + steps/dks.py +
    steps/ingesters.py:505-522)."""
    lines = envelope_lines_from_events(spark, sf_dir)
    # env stays packed through the quarantine split -- expanding first
    # would double-evaluate the whole Python chain (see ingest.py)
    env = lines.withColumn(
        "env", envelope_udf("calculator:calculationParts")(F.col("value"))
    )
    good, _quarantined = quarantine_missing_db_object(env)
    processed = decrypt_and_process(good, IdentityKeyService())
    return to_daily_rows(processed, EXPORT_DATE)
