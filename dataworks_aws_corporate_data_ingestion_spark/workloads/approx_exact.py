"""Sketch-pruned EXACT queries: bounded-state candidate generation with
exact verification, so the output hash-matches a plain-SQL oracle while
the heavy shuffle never happens.

Two families, same contract:

* Misra-Gries heavy hitters (operators/heavyhitters.py): the candidate
  pass keeps <= k counters per partition; only candidates are exactly
  recounted.  Result == GROUP BY ... HAVING count*(k+1) > n.
* Bloom-pruned semi/anti joins (operators/bloomjoin.py): the big side
  is filtered map-side by a broadcast bitset with no false negatives;
  only bloom-positives pay the exact join.  Result == plain semi/anti.

These differ from workloads/sketches.py's certificates: there the
sketch ANSWER is approximate and the certificate bounds its error; here
the sketch only PRUNES and the answer itself is exact -- which is why
these entries hash-match their oracles directly with no error envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloomjoin import bloom_anti_join, bloom_semi_join
from ..operators.heavyhitters import heavy_hitters_exact
from ..sources.tables import load_table
from ..workload import register

# Heavy-hitter sketch width: keys with share > 1/(k+1) = ~0.78% qualify.
_MG_K = 127

# Returning-user cutoff: last week of the fixed January 2024 event range.
_CUTOFF = "2024-01-24"

_REF_SOURCES = [f"src{i}" for i in range(10)]
_REF_SOURCES_SQL = ", ".join(f"'{s}'" for s in _REF_SOURCES)


@register(
    "heavy_hitters_mg_exact",
    tags=("sketch", "heavy-hitters", "misra-gries", "approx-prune-exact-verify",
          "scale-path"),
    oracle=f"""
        WITH tot AS (SELECT COUNT(*) AS n FROM events),
        c AS (
            SELECT event_type,
                   CAST(user_id % 16 AS BIGINT) AS user_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type, user_bucket, n_events,
               CAST(n_events * 10000 // n AS BIGINT) AS share_bps
        FROM c, tot
        WHERE n_events * {_MG_K + 1} > n
        ORDER BY event_type, user_bucket
    """,
)
def heavy_hitters_mg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, user-bucket) cells holding more than 1/128 of all
    events, found by per-partition Misra-Gries candidate generation and
    certified EXACT by recounting only the candidate sliver -- the
    output is bit-identical to the full GROUP BY + HAVING the oracle
    runs, but the aggregation shuffle carries at most k keys per
    partition instead of the whole distinct-key space.

    Scale notes: at 100 TB the naive form shuffles every distinct
    (type, bucket, ...) key; the MG pass is one mapInPandas scan with
    <= 127 counters of state per task, the verify pass a broadcast
    semi-join + map-side-combined count over <= 127 x n_partitions
    keys.  This is the hot-key detector that feeds the salted-join
    machinery (operators/skew.py).  The share_bps column is integer
    cross-multiplied (DIV) so both engines compute it exactly."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(16)).cast("bigint").alias("user_bucket"),
    )
    n = e.count()
    return (
        heavy_hitters_exact(e, ["event_type", "user_bucket"], _MG_K)
        .withColumnRenamed("n_rows", "n_events")
        .withColumn("share_bps", F.expr(f"n_events * 10000 DIV {n}"))
        .orderBy("event_type", "user_bucket")
    )


@register(
    "returning_users_bloom_semi",
    tags=("bloom", "semi-join", "approx-prune-exact-verify", "scale-path"),
    oracle=f"""
        WITH recent AS (
            SELECT user_id FROM events WHERE ts >= TIMESTAMP '{_CUTOFF}'
        ),
        prior AS (
            SELECT user_id FROM events WHERE ts < TIMESTAMP '{_CUTOFF}'
        ),
        r AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_recent_events
              FROM recent GROUP BY 1),
        p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_prior_events
              FROM prior GROUP BY 1)
        SELECT r.user_id, r.n_recent_events, p.n_prior_events
        FROM r JOIN p USING (user_id)
        ORDER BY user_id
    """,
)
def returning_users_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in the last week of the range who were also seen
    before it, with exact activity counts on both sides -- the identity
    resolution / retention shape, run as a BIDIRECTIONAL bloom-pruned
    semi-join: recent events are filtered by a bitset over prior users
    (map-side, before any exchange), prior events symmetrically by a
    bitset over recent users, and only the surviving slivers are
    exactly counted and joined.  Bit-identical to the plain semi-join
    query the oracle runs (bloom filters have no false negatives; false
    positives die in the exact verify join).

    Scale notes: at 100 TB "recent" is a day slice and "prior" is the
    full history -- the bloom over the day's users (bounded) lets the
    history scan drop non-returning rows in the scan stage instead of
    shuffling 100 TB on user_id.  m ~ 10 bits/key, h=5 => ~1% sliver
    overhead, documented ceiling 1.25 GB broadcast per 1e9 keys."""
    e = load_table(spark, "events", sf_dir)
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    recent = e.filter(F.col("ts") >= cutoff).select("user_id")
    prior = e.filter(F.col("ts") < cutoff).select("user_id")
    r = (
        bloom_semi_join(recent, prior, "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_recent_events"))
    )
    p = (
        bloom_semi_join(prior, recent, "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_prior_events"))
    )
    return r.join(p, "user_id").orderBy("user_id")


@register(
    "cross_corpus_dedup_bloom",
    tags=("bloom", "dedup", "anti-join", "approx-prune-exact-verify",
          "scale-path"),
    oracle=f"""
        WITH nrm AS (
            SELECT doc_id, source,
                   md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp
            FROM documents
        ),
        ref AS (SELECT * FROM nrm WHERE source IN ({_REF_SOURCES_SQL})),
        delta AS (
            SELECT doc_id, source, fp FROM nrm
            WHERE source NOT IN ({_REF_SOURCES_SQL})
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, 'recrawl' AS source, fp
            FROM ref WHERE doc_id % 5 = 0
        ),
        rfp AS (SELECT DISTINCT fp FROM ref)
        SELECT d.doc_id, d.source,
               (rfp.fp IS NOT NULL) AS is_dup
        FROM delta d LEFT JOIN rfp ON d.fp = rfp.fp
        ORDER BY d.doc_id
    """,
)
def cross_corpus_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact dedup: classify every document of an incoming
    delta corpus (the non-reference sources plus a planted 'recrawl'
    batch that verbatim-copies every fifth reference doc under a fresh
    doc_id) as duplicate-of-reference or new, by normalised-text
    fingerprint (the same lower/collapse-space/trim/md5 canonicalisation
    `documents_normalized_fingerprints` certifies).  The dup set is a
    bloom-pruned SEMI join, the new set a bloom-pruned ANTI join, so
    delta rows whose fingerprint is provably absent from the reference
    never reach an exchange; both halves are exactly verified, making
    the union bit-identical to the oracle's plain left-join
    classification.

    Scale notes: this is the "dedup the new crawl against the frozen
    corpus" step of a training-data pipeline -- at 100 TB the delta is
    the huge side and the reference fingerprint set the bounded one, so
    the anti-join path (most of a fresh crawl is new) passes
    bloom-negatives through with zero shuffle; only the ~dup-rate +
    ~1%-fp sliver pays the verify join.  Fingerprints, not full text,
    are what the bitset and the verify join carry: 16 bytes/doc."""
    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " ")))
    nrm = docs.select("doc_id", "source", fp.alias("fp"))
    ref = nrm.filter(F.col("source").isin(_REF_SOURCES))
    delta = nrm.filter(~F.col("source").isin(_REF_SOURCES)).unionByName(
        ref.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.lit("recrawl").alias("source"),
            "fp",
        )
    )
    ref_fp = ref.select("fp")
    dups = bloom_semi_join(delta, ref_fp, "fp").withColumn(
        "is_dup", F.lit(True)
    )
    news = bloom_anti_join(delta, ref_fp, "fp").withColumn(
        "is_dup", F.lit(False)
    )
    return (
        dups.unionByName(news)
        .select("doc_id", "source", "is_dup")
        .orderBy("doc_id")
    )
