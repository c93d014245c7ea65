"""Daily ingest pipeline: JSONL envelopes -> decrypted, validated,
canonical records, as a DataFrame lineage.

DataFrame-native re-expression of the reference's RDD map chains
(reference steps/ingesters.py:108-120 audit, :526-539 calcParts):
text scan -> envelope UDF -> decrypt UDF -> payload UDF -> column exprs.
Two Arrow crossings total; everything else is JVM columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import (
    decrypt_process_udf,
    decrypt_udf,
    envelope_udf,
    payload_udf,
)
from ..functions.crypto import KeyService


def read_envelopes(
    spark: SparkSession,
    source_path: str,
    collection: str | None = None,
    expand: bool = True,
    permissive: bool = False,
) -> DataFrame:
    """Line-oriented scan of JSONL (gz auto-decompressed by the Hadoop
    codec) plus envelope parse (reference steps/ingesters.py:30-31 +
    steps/data.py:63-89).

    ``expand=False`` keeps the parsed envelope as the single ``env``
    struct column -- REQUIRED when a filter follows (see
    quarantine_missing_db_object): filtering on an expanded field
    re-derives the UDF expression and Catalyst evaluates the whole
    upstream Python chain twice.

    ``permissive=True`` diverts unparseable lines (all-null envelope,
    null db_object) into the quarantine branch instead of failing the
    day -- see envelope_udf.  A truncated gzip MEMBER still fails at the
    Hadoop codec layer (file-level corruption is not a row-level
    concern)."""
    df = spark.read.text(source_path).withColumn(
        "env", envelope_udf(collection, permissive=permissive)(F.col("value"))
    )
    return df.select("value", "env.*") if expand else df


def quarantine_missing_db_object(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split rows with a null dbObject into a quarantine branch instead of
    failing the whole job (the reference hard-raises per record,
    steps/dks.py:142-143; a 100 TB run should not die on one bad row).

    Pass the UNEXPANDED frame (``env`` struct still packed): the split
    then filters on the struct attribute and the envelope UDF -- plus
    everything upstream of it -- evaluates exactly once.  Filtering an
    expanded ``db_object`` column instead duplicates the UDF expression
    into the Filter node, and the round-3 plan audit measured the whole
    Python chain (fixture encrypt + envelope parse) running twice."""
    if "env" in df.columns:
        good = df.filter(F.col("env.db_object").isNotNull()).select("value", "env.*")
        bad = df.filter(F.col("env.db_object").isNull()).select("value", "env.*")
        return good, bad
    good = df.filter(F.col("db_object").isNotNull())
    bad = df.filter(F.col("db_object").isNull())
    return good, bad


def decrypt_records(
    df: DataFrame,
    key_service: KeyService,
    hit_acc=None,
    miss_acc=None,
) -> DataFrame:
    """Attach the decrypted payload column (reference steps/dks.py:119-157)."""
    dec = decrypt_udf(key_service, hit_acc=hit_acc, miss_acc=miss_acc)
    return df.withColumn(
        "decrypted",
        dec(
            F.col("db_object"),
            F.col("encrypted_encryption_key"),
            F.col("initialisation_vector"),
            F.col("key_encryption_key_id"),
        ),
    )


def process_payloads(df: DataFrame, audit: bool = False) -> DataFrame:
    """Apply (audit transform ->) validate -> sanitise -> canonicalise,
    yielding `val` and `is_delete` (reference steps/ingesters.py:112-115)."""
    proc = payload_udf(audit=audit)
    out = df.withColumn(
        "payload",
        proc(F.col("decrypted"), F.col("db"), F.col("collection"), F.col("last_modified")),
    )
    return out.select(
        *[c for c in df.columns if c not in ("decrypted", "value")],
        F.col("payload.val").alias("val"),
        F.col("payload.is_delete").alias("is_delete"),
    )


def decrypt_and_process(
    df: DataFrame,
    key_service: KeyService,
    audit: bool = False,
    hit_acc=None,
    miss_acc=None,
    permissive: bool = False,
) -> DataFrame:
    """Fused decrypt + transform + validate + sanitise + canonicalise:
    one Arrow crossing instead of decrypt_records |> process_payloads'
    two.  Same output columns as process_payloads.

    ``permissive=True``: per-record decrypt/transform failures yield
    val=NULL rows instead of failing the task (see decrypt_process_udf),
    and the raw ``value`` line is KEPT so the caller can divert failures
    to the quarantine branch with the envelope-quarantine schema."""
    proc = decrypt_process_udf(
        key_service,
        audit=audit,
        hit_acc=hit_acc,
        miss_acc=miss_acc,
        permissive=permissive,
    )
    out = df.withColumn(
        "payload",
        proc(
            F.col("db_object"),
            F.col("encrypted_encryption_key"),
            F.col("initialisation_vector"),
            F.col("key_encryption_key_id"),
            F.col("db"),
            F.col("collection"),
            F.col("last_modified"),
        ),
    )
    keep = (
        df.columns if permissive else [c for c in df.columns if c != "value"]
    )
    return out.select(
        *keep,
        F.col("payload.val").alias("val"),
        F.col("payload.is_delete").alias("is_delete"),
    )


def to_daily_rows(df: DataFrame, export_date: str) -> DataFrame:
    """Shape the calcParts daily-delta rows as pure column expressions
    (reference steps/ingesters.py:505-522 built these tuples in Python):

      id_part      first 2 chars of the inner id -> 256 buckets
      db_type      DELETE when the record carried _removedDateTime
      export_y/m/d partition columns from the run date
    """
    year, month, day = (int(p) for p in export_date.split("-"))
    inner_id = F.get_json_object(F.col("id"), "$.id")
    return df.select(
        F.col("id"),
        # primitive ids have no {"id": ...} wrapper; fall back to the raw
        # prefix rather than failing the row (the reference assumed the
        # wrapped form, steps/ingesters.py:505-508)
        F.coalesce(F.substring(inner_id, 1, 2), F.substring(F.col("id"), 1, 2)).alias(
            "id_part"
        ),
        F.lit(year).alias("export_year"),
        F.lit(month).alias("export_month"),
        F.lit(day).alias("export_day"),
        F.when(F.col("is_delete"), F.lit("DELETE"))
        .otherwise(F.lit("INSERT"))
        .alias("db_type"),
        F.col("val"),
    )


def observe_ingest(df: DataFrame, observation) -> DataFrame:
    """Attach observable metrics to an ingest output (the DataFrame-native
    evolution of the reference's accumulators, SURVEY.md A1): row count,
    delete count, distinct-bucket estimate.  `observation` is a
    pyspark.sql.Observation (read `.get` after the action) or a string
    name for listener-based collection; unlike accumulators these are
    computed exactly once per action (no task-retry double counting)."""
    return df.observe(
        observation,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("db_type") == "DELETE", 1).otherwise(0)).alias("n_deletes"),
        F.approx_count_distinct("id_part").alias("n_buckets"),
    )


def ingest_daily(
    spark: SparkSession,
    source_path: str,
    collection: str,
    key_service: KeyService,
    export_date: str,
    audit: bool = False,
    hit_acc=None,
    miss_acc=None,
    observation=None,
    permissive: bool = False,
    decrypt_observation=None,
) -> tuple[DataFrame, DataFrame]:
    """Full daily pipeline; returns (rows, quarantined_envelopes).

    For audit collections the caller writes `val` as JSONL
    (reference steps/ingesters.py:116-119); for keyed collections the
    caller feeds the rows to sinks.writers.write_daily (reference
    steps/ingesters.py:526-539).

    ``observation``: a pyspark.sql.Observation attached BELOW the
    good/quarantine split, so the caller's single write action also yields
    `n_envelopes` and `n_quarantined` counts -- no second scan of the
    day's input to count the (near-empty) quarantine branch.  At 100 TB
    the alternative -- an action on the quarantine DataFrame -- re-reads
    and re-parses every record for a counter.

    ``permissive``: unparseable lines join the quarantine branch (raw
    line preserved in its ``value`` column, counted in
    ``n_quarantined``) instead of failing the day -- and so do records
    that fail DECRYPT or transform (bad base64 ciphertext/key/IV, DKS
    refusing one record's key, non-UTF-8 or invalid payload): the fused
    pass yields val=NULL for them and they are diverted into the same
    quarantine schema, counted as ``n_undecryptable`` on
    ``decrypt_observation`` (a second Observation -- the parse-level one
    rides the pre-split frame and cannot be observed twice).  Clean rows
    stay byte-identical to the strict run."""
    env = read_envelopes(
        spark, source_path, collection, expand=False, permissive=permissive
    )
    if observation is not None:
        env = env.observe(
            observation,
            F.count(F.lit(1)).alias("n_envelopes"),
            F.count(F.when(F.col("env.db_object").isNull(), 1)).alias(
                "n_quarantined"
            ),
        )
    good, quarantined = quarantine_missing_db_object(env)
    processed = decrypt_and_process(
        good,
        key_service,
        audit=audit,
        hit_acc=hit_acc,
        miss_acc=miss_acc,
        permissive=permissive,
    )
    if permissive:
        if decrypt_observation is not None:
            processed = processed.observe(
                decrypt_observation,
                F.count(F.when(F.col("val").isNull(), 1)).alias(
                    "n_undecryptable"
                ),
            )
        ok = processed.filter(F.col("val").isNotNull()).drop("value")
        undecryptable = processed.filter(F.col("val").isNull()).select(
            *quarantined.columns
        )
        quarantined = quarantined.unionByName(undecryptable)
        return to_daily_rows(ok, export_date), quarantined
    return to_daily_rows(processed, export_date), quarantined
