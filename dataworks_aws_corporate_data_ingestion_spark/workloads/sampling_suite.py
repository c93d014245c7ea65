"""Deterministic sampling, dataset-split, and sequence-packing workload
(training-data ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.packing import pack_sequences
from ..operators.sampling import assign_split, deterministic_sample
from ..sources.tables import load_table
from ..workload import register

# ~10%: buckets 0000..1999 hex of 65536
_SAMPLE_NUM = 0x1A00


@register(
    "documents_deterministic_sample",
    tags=("sampling", "training-data"),
    oracle=f"""
        SELECT doc_id, source, n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_SAMPLE_NUM:04x}'
    """,
)
def documents_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% document sample by content-key hash: stable across runs,
    partition layouts, and engines (the oracle IS another engine
    recomputing membership).  Contrast df.sample: partition-layout
    dependent, unauditable.

    Scale notes: a pure per-row filter -- no shuffle, pushes nothing but
    md5 work into the scan stage, trivially parallel at any size."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    return deterministic_sample(d, "doc_id", _SAMPLE_NUM)


@register(
    "dataset_split_stats",
    tags=("sampling", "training-data", "aggregation"),
    oracle="""
        SELECT
            CASE
                WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < '0ccd'
                    THEN 'val'
                WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
                    THEN 'test'
                ELSE 'train'
            END AS split,
            COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
)
def dataset_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment (~90/5/5) from salted row-identity
    hash, with per-split size stats.  A row's split never changes as the
    corpus grows -- the anti-leak property for persistent eval sets."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    return (
        assign_split(d, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "packed_training_sequences",
    tags=("packing", "training-data", "applyInPandas", "invariant-oracle"),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_packed,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs,
               CAST(SUM(CAST(len(string_split(lower(text), ' ')) AS BIGINT))
                   AS BIGINT) AS total_tokens,
               CAST(0 AS BIGINT) AS n_multi_doc_packs_over_budget
        FROM documents
    """,
)
def packed_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 512-token training sequences via bucketed
    first-fit-decreasing (operators/packing.py), registered as the
    packing's INVARIANT CERTIFICATE: the greedy pack assignment itself is
    ordering-dependent (and bucket-count-dependent), so its rows have no
    relational oracle -- but its conservation laws do.  The oracle states
    them over the raw corpus: every doc packed exactly once (n_docs_packed
    == n_distinct_docs == corpus count), token mass conserved
    (sum of pack totals == sum of per-doc whitespace token counts), and
    no multi-doc pack exceeds the 512 budget (single oversized docs get
    their own pack by design -- truncation is the tokeniser's job).  Any
    packing bug -- dropped doc, double placement, over-stuffed pack,
    token miscount -- flips a column and hash-mismatches.  Consumers of
    the actual pack rows call operators/packing.pack_sequences; the
    per-bucket fill-ratio quality bar lives in pytest
    (test_packing_sampling.py)."""
    from ..caching import tracked_persist

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = tracked_persist(
        pack_sequences(d, budget=512, residual_threshold=0.85)
    )
    pack_stats = packed.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs_packed"),
        F.sum("total_tokens").cast("bigint").alias("total_tokens"),
        F.sum(
            ((F.col("n_docs") >= 2) & (F.col("total_tokens") > 512)).cast("int")
        )
        .cast("bigint")
        .alias("n_multi_doc_packs_over_budget"),
    )
    distinct_docs = packed.select(F.explode("doc_ids").alias("d")).agg(
        F.count_distinct("d").cast("bigint").alias("n_distinct_docs")
    )
    return pack_stats.crossJoin(distinct_docs).select(
        "n_docs_packed",
        "n_distinct_docs",
        "total_tokens",
        "n_multi_doc_packs_over_budget",
    )


@register(
    "token_budget_mixture",
    tags=("sampling", "mixture", "training-data", "tokens"),
    oracle="""
        WITH d AS (
            SELECT doc_id, source,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                       AS n_tokens
            FROM documents
        ), totals AS (
            SELECT source, SUM(n_tokens) AS toks FROM d GROUP BY source
        ), rates AS (
            SELECT source,
                   (CAST(CASE source
                        WHEN 'src0' THEN 2000
                        WHEN 'src1' THEN 800
                        ELSE 500
                    END AS BIGINT) * 65536) // toks AS thr
            FROM totals
        )
        SELECT d.doc_id, d.source, d.n_tokens
        FROM d JOIN rates r ON r.source = d.source
        WHERE r.thr >= 65536
           OR substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 4)
              < lpad(lower(to_hex(r.thr)), 4, '0')
    """,
)
def token_budget_mixture_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting by token budget (operators/sampling.py::
    token_budget_mixture): src0 targets 2000 tokens (whole at small SFs, sampled at
    sf0.1), src1 800, every other source 500 -- both the pass-through
    and sampled branches are exercised at every SF.  The per-source sampling rate derives from exact bigint
    token totals via integer division into the md5 bucket space, so the
    oracle recomputes the identical kept set -- the whole mixing decision
    is cross-engine auditable, not a black-box sampler."""
    from ..operators.sampling import token_budget_mixture

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    return token_budget_mixture(
        d, budgets={"src0": 2000, "src1": 800}, default_budget=500
    ).select("doc_id", "source", "n_tokens")


@register(
    "documents_stratified_sample",
    tags=("sampling", "stratified", "training-data"),
    oracle="""
        SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE source
                  WHEN 'src0' THEN 'e000'
                  WHEN 'src1' THEN '8000'
                  ELSE '4000'
              END
    """,
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing via per-stratum deterministic sampling: src0
    keeps ~87.5%, src1 ~50%, every other source ~25% -- the upweight-rare
    / downweight-common move of dataset curation, decided per row by an
    md5 bucket so any engine can audit membership.

    Scale notes: a single CASE-compare filter inside the scan stage --
    no shuffle, no per-stratum passes (operators/sampling.py)."""
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    return stratified_sample(
        docs,
        key="doc_id",
        stratum="source",
        fractions={"src0": 0xE000, "src1": 0x8000},
        default_num=0x4000,
    )


_N_SHARDS = 16


@register(
    "training_shards",
    bench=True,
    tags=("sharding", "shuffle", "training-data", "window"),
    oracle=f"""
        WITH k AS (
            SELECT doc_id, source,
                   md5('shard' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        )
        SELECT doc_id, source,
               CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % {_N_SHARDS}
                   AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY CAST('0x' || substr(h, 1, 8) AS BIGINT)
                       % {_N_SHARDS}
                   ORDER BY h, doc_id
               ) AS BIGINT) AS pos
        FROM k
    """,
)
def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 16 numbered shards
    (operators/sharding.py::shuffle_shards): shard membership and
    within-shard position are pure functions of md5('shard'||doc_id), so
    the 'random' training order is stable across runs, partition
    layouts, and engines -- the oracle recomputes the identical (shard,
    pos) for every document.

    Scale notes: ONE hash exchange on shard + per-shard local sorts; no
    global sort ever (orderBy(rand()) would range-sort the world and be
    unreproducible).  The writer twin (write_training_shards) gives each
    shard its own reducer/output directory; at 100 TB, n_shards sized to
    ~4 GB/shard keeps every sort local and every file training-loader
    sized."""
    from ..operators.sharding import shuffle_shards

    d = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    return shuffle_shards(d, "doc_id", _N_SHARDS).select(
        "doc_id", "source", "shard", "pos"
    )


@register(
    "documents_k_per_source",
    tags=("sampling", "k-per-group", "training-data", "window"),
    oracle="""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5('kps' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        ) WHERE rk <= 20
    """,
)
def documents_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k docs per source (k=20), chosen by hash order -- the
    fixed-size eval-set / few-shot-pool primitive where rate-based
    sampling (documents_stratified_sample) can't promise a count.
    Selection is the k smallest md5('kps'||doc_id) per source: stable
    under reruns and engine-auditable, and an existing member is only
    ever displaced when a new doc hashes below the current k-th -- the
    same minwise property the minhash sketch relies on.

    Scale notes: one hash exchange on source + per-group sort for the
    rank; groups are source-sized, never corpus-global.  For very few
    very large groups, a two-phase top-k (per-partition heads, then
    merge) would cut the sort -- at normal source cardinalities the
    window IS the right plan."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    from pyspark.sql import Window

    from ..operators.sharding import _order_hash

    h = _order_hash(F.col("doc_id"), "kps")
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "source")
    )


@register(
    "documents_length_weighted_sample",
    tags=("sampling", "weighted", "training-data"),
    oracle="""
        SELECT doc_id, source, n_chars FROM documents
        WHERE n_chars >= 400
           OR substr(md5('lw' || CAST(doc_id AS VARCHAR)), 1, 4)
              < lpad(lower(to_hex((n_chars * 65536) // 400)), 4, '0')
    """,
)
def documents_length_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-ROW weighted sampling: each document's keep probability is
    proportional to its OWN length (n_chars/400, capped at 1) -- the
    downweight-short-junk move, where per-source rates
    (documents_stratified_sample) are too blunt.  The row's weight
    becomes an exact integer threshold ((n_chars*65536) div 400) in the
    md5 bucket space, so membership is a pure function of (key, weight)
    any engine recomputes -- no rand(), no layout dependence.

    Scale notes: one per-row hash + integer compare inside the scan
    stage; no shuffle, no aggregate (the weight is row-local, unlike
    token_budget_mixture's corpus-derived rates).  The 65536 product
    stays under 2^32 for any plausible n_chars; cap the weight column
    upstream if weights can exceed the bucket-space ratio."""
    from ..operators.sampling import length_weighted_sample

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "n_chars"
    )
    return length_weighted_sample(d, "doc_id", "n_chars", full_weight=400)


@register(
    "event_value_robust_stats",
    tags=("aggregation", "percentile", "robust-stats", "outliers"),
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med_value
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, m.med_value,
                   quantile_cont(ABS(e.value - m.med_value), 0.5) AS mad_value
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type, m.med_value
        )
        SELECT d.event_type, d.med_value, d.mad_value,
               CAST(COUNT(*) FILTER (
                   WHERE ABS(e.value - d.med_value) > 3 * d.mad_value
               ) AS BIGINT) AS n_outliers
        FROM events e JOIN dev d USING (event_type)
        GROUP BY d.event_type, d.med_value, d.mad_value
    """,
)
def event_value_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group location/scale + outlier count: median, median
    absolute deviation, and how many values sit outside the 3-MAD
    fence -- the outlier screen that, unlike mean/stddev z-scores, is
    not dragged by the outliers it is trying to find.  Exact
    interpolated percentiles match DuckDB quantile_cont bit-for-bit
    (verify-skill invariant), and |x - med| / 3*mad are single IEEE
    ops on identically-derived doubles, so even the fence comparison
    reproduces exactly.

    Scale notes: three passes over events (median, MAD, fence count),
    each a map-side-partial aggregate with the tiny per-type stats
    broadcast back -- no window, no sort of the corpus.  At 100 TB,
    swap percentile for approx_percentile and keep the shape (the
    sketch twin pattern approx_percentiles_by_flag certifies)."""
    e = load_table(spark, "events", sf_dir).select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med_value")
    )
    dev = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med_value")
        .agg(
            F.percentile(
                F.abs(F.col("value") - F.col("med_value")), F.lit(0.5)
            ).alias("mad_value")
        )
    )
    return (
        e.join(F.broadcast(dev), "event_type")
        .groupBy("event_type", "med_value", "mad_value")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med_value"))
                    > 3 * F.col("mad_value"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )


def _profile_oracle() -> str:
    return " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM documents
        """
        for c in ("doc_id", "lang", "source", "n_chars")
    )


@register(
    "profile_documents",
    tags=("profiling", "data-quality", "aggregation"),
    oracle=_profile_oracle(),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the documents table
    (operators/profile.py): one pass, one row per column with
    null/exact-distinct/min/max -- the report an ingestion gate diffs
    against yesterday's batch to catch schema/content drift before it
    reaches training."""
    from ..operators.profile import profile_columns

    return profile_columns(
        load_table(spark, "documents", sf_dir),
        ["doc_id", "lang", "source", "n_chars"],
    )


@register(
    "documents_expectation_report",
    tags=("data-quality", "expectations", "contract", "aggregation"),
    oracle="""
        WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM documents)
        SELECT r.rule, b.n_rows, r.n_violations,
               r.n_violations = 0 AS passed
        FROM base b CROSS JOIN (
            SELECT 'doc_id_positive' AS rule,
                   CAST(COUNT(*) FILTER (WHERE doc_id IS NULL OR doc_id < 0)
                       AS BIGINT) AS n_violations FROM documents
            UNION ALL
            SELECT 'text_nonempty',
                   CAST(COUNT(*) FILTER (WHERE text IS NULL OR length(text) = 0)
                       AS BIGINT) FROM documents
            UNION ALL
            SELECT 'n_chars_matches_text',
                   CAST(COUNT(*) FILTER (WHERE n_chars IS NULL OR text IS NULL
                        OR n_chars <> length(text)) AS BIGINT) FROM documents
            UNION ALL
            SELECT 'source_known',
                   CAST(COUNT(*) FILTER (WHERE source IS NULL
                        OR source NOT LIKE 'src%') AS BIGINT) FROM documents
            UNION ALL
            SELECT 'unique(doc_id)',
                   CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
            FROM documents
        ) r
    """,
)
def documents_expectation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract gate over `documents`
    (operators/profile.py::expectation_report): five expectations --
    positive ids, non-empty text, n_chars consistent with text, known
    source prefix, unique ids -- evaluated in ONE aggregate pass, each
    reported as (rule, n_rows, n_violations, passed).  The report an
    ingestion job diffs before promoting a batch to training; a NULL in
    any predicate counts as a violation, never a silent pass."""
    from ..operators.profile import expectation_report

    d = load_table(spark, "documents", sf_dir)
    rules = [
        ("doc_id_positive", F.col("doc_id") >= 0),
        ("text_nonempty", F.length("text") > 0),
        ("n_chars_matches_text", F.col("n_chars") == F.length("text")),
        ("source_known", F.col("source").startswith("src")),
    ]
    return expectation_report(d, rules, unique_keys=["doc_id"])


@register(
    "epoch_shuffle_decorrelation",
    tags=("sharding", "shuffle", "training-data", "multi-epoch"),
    oracle=f"""
        WITH k AS (
            SELECT doc_id,
                   md5('epoch1' || CAST(doc_id AS VARCHAR)) AS h1,
                   md5('epoch2' || CAST(doc_id AS VARCHAR)) AS h2
            FROM documents
        ), assigned AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(h1, 1, 8) AS BIGINT) % {_N_SHARDS}
                       AS INTEGER) AS s1,
                   CAST(CAST('0x' || substr(h2, 1, 8) AS BIGINT) % {_N_SHARDS}
                       AS INTEGER) AS s2,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY CAST('0x' || substr(h1, 1, 8) AS BIGINT)
                           % {_N_SHARDS}
                       ORDER BY h1, doc_id) AS BIGINT) AS p1,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY CAST('0x' || substr(h2, 1, 8) AS BIGINT)
                           % {_N_SHARDS}
                       ORDER BY h2, doc_id) AS BIGINT) AS p2
            FROM k
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN s1 = s2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_same_shard,
               CAST(SUM(CASE WHEN s1 = s2 AND p1 = p2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_same_slot,
               SUM(CASE WHEN s1 = s2 THEN 1 ELSE 0 END) * {_N_SHARDS}
                   < COUNT(*) * 2 AS decorrelated
        FROM assigned
    """,
)
def epoch_shuffle_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training order certificate: shuffling the corpus
    under two different epoch salts must give INDEPENDENT orders --
    same-shard collisions near the 1/N chance rate and (shard, pos)
    slot collisions near zero.  Columns are exact integers (both
    engines recompute both shuffles bit-for-bit) plus a cross-
    multiplied boolean bound (same-shard rate < 2/N), so either a
    broken salt (epochs identical: n_same_shard == n_docs flips the
    bound) or a broken hash hash-mismatches.

    Scale notes: two hash exchanges (one per epoch's shard window) and
    a doc-keyed join of two corpus-sized frames; everything downstream
    is a scalar aggregate.  The per-epoch salts are the whole
    mechanism -- epoch k trains in shuffle_shards(df, key, N,
    salt=f'epoch{{k}}') order with no state carried between epochs."""
    from ..operators.sharding import shuffle_shards

    d = load_table(spark, "documents", sf_dir).select("doc_id")
    e1 = shuffle_shards(d, "doc_id", _N_SHARDS, salt="epoch1").select(
        "doc_id", F.col("shard").alias("s1"), F.col("pos").alias("p1")
    )
    e2 = shuffle_shards(d, "doc_id", _N_SHARDS, salt="epoch2").select(
        "doc_id", F.col("shard").alias("s2"), F.col("pos").alias("p2")
    )
    j = e1.join(e2, "doc_id")
    same_shard = F.sum(F.when(F.col("s1") == F.col("s2"), 1).otherwise(0)).cast(
        "bigint"
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        same_shard.alias("n_same_shard"),
        F.sum(
            F.when(
                (F.col("s1") == F.col("s2")) & (F.col("p1") == F.col("p2")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_same_slot"),
        (same_shard * _N_SHARDS < F.count(F.lit(1)) * 2).alias("decorrelated"),
    )


@register(
    "temperature_sampling_rates",
    tags=("sampling", "mixture", "temperature", "training-data"),
    oracle="""
        WITH d AS (
            SELECT source,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        totals AS (
            SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS toks
            FROM d GROUP BY source
        ),
        g AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM totals)
        SELECT t.source, t.toks,
               CAST(t.toks AS DOUBLE) / CAST(g.total AS DOUBLE) AS share,
               sqrt(CAST(t.toks AS DOUBLE) / CAST(g.total AS DOUBLE))
                   AS rate_t2
        FROM totals t, g
    """,
)
def temperature_sampling_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weights (the multilingual/multi-source
    rebalancing move: sample source s proportionally to share^(1/T)):
    per-source exact token totals, natural share, and the T=2 weight
    sqrt(share).  T=2 is the classic mBERT/XLM-R exponent alpha=0.5 --
    and the ONE temperature whose weight is cross-engine hash-exact,
    because IEEE sqrt is correctly rounded while pow(x, 0.3) is libm-
    dependent; other temperatures follow downstream from these shares.
    The normalising constant (sum of weights) is a SMALL per-source
    vector any consumer folds driver-side; summing doubles across groups
    inside the query would be association-order-dependent and break the
    hash (module convention).

    Scale notes: token counting rides the scan stage; the aggregate
    shuffles one row per source.  The grand total is a broadcast
    singleton join, same as token_budget_mixture."""
    d = load_table(spark, "documents", sf_dir).select(
        "source", token_count(F.col("text")).alias("n_tokens")
    )
    totals = d.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("toks")
    )
    g = totals.agg(F.sum("toks").cast("bigint").alias("total"))
    share = F.col("toks").cast("double") / F.col("total").cast("double")
    return totals.crossJoin(F.broadcast(g)).select(
        "source",
        "toks",
        share.alias("share"),
        F.sqrt(share).alias("rate_t2"),
    )
