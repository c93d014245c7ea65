"""End-to-end training-data curation: the showcase composition query.

A real LLM-data pipeline is not one operator but a chain: language
filter -> quality gate -> near-dup cluster collapse -> deterministic
subsample -> corpus accounting.  This module registers that chain as a
single oracle-checked query, composed entirely from operators that each
hash-match their own oracles (text stats, minhash clusters, md5
sampling) -- so the pipeline's oracle certifies the COMPOSITION, the
thing a user actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.dedup import near_dup_pairs_minhash
from ..operators.graph import connected_components, flag_oversize_components
from ..operators.sampling import deterministic_sample
from ..sources.tables import load_table
from ..workload import register
from .dedup_suite import _PAIRS_JACCARD_ORACLE
from .text_analysis import _LANG_SCORES, _STOP_SQL

# keep ~90% after curation: md5 prefix < 0xe666 (58982/65536)
_KEEP_NUM = 0xE666

# giant-cluster policy cap: a near-dup cluster larger than this is treated
# as a degenerate artifact (boilerplate/template chaining), not organic
# duplication -- its members are surfaced for review and EXCLUDED from the
# curated corpus instead of silently collapsing to one representative
_CLUSTER_CAP = 100


def collapse_near_dup_clusters(
    df,
    clusters,
    id_col: str = "doc_id",
    cap: int = _CLUSTER_CAP,
):
    """Keep one representative (the cluster-minimum id) per near-dup
    cluster; rows in clusters LARGER than ``cap`` are dropped entirely --
    the surface-not-collapse policy of
    :func:`...operators.graph.flag_oversize_components`.

    ``clusters`` is a (node, component) assignment (isolated rows absent
    -- they pass through untouched via the left join).  The join is left
    un-hinted on purpose: cluster membership is proportional to the
    corpus's DUPLICATED fraction, which at 100 TB with a 20-30% dup rate
    is billions of rows -- far past any broadcast threshold -- so AQE
    picks broadcast only when runtime stats say the assignment fits.
    """
    flagged = flag_oversize_components(clusters, cap).select(
        F.col("node").alias(id_col),
        F.col("component").alias("__cluster_id"),
        "oversize",
    )
    return (
        df.join(flagged, id_col, "left")
        .filter(
            F.col("__cluster_id").isNull()
            | ((~F.col("oversize")) & (F.col("__cluster_id") == F.col(id_col)))
        )
        .drop("__cluster_id", "oversize")
    )


@register(
    "curation_pipeline",
    bench=True,
    tags=("training-data", "composition", "dedup", "text", "sampling"),
    oracle=f"""
        WITH RECURSIVE tokd AS (
            SELECT doc_id, source, string_split(lower(text), ' ') AS toks
            FROM documents
        ), scored AS (
            SELECT doc_id, source,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_distinct,
                   len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS n_stop,
                   {_LANG_SCORES}
            FROM tokd
        ), graded AS (
            SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
                   (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5
                     + LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.3
                     + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.2 AS quality,
                   (s_en = GREATEST(s_en, s_es, s_fr, s_de, s_zh) AND s_en > 0)
                       AS is_en
            FROM scored
        ), pairs AS (
            SELECT a, b FROM ({_PAIRS_JACCARD_ORACLE}) t
        ), sym AS (
            SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach AS (
            SELECT a AS node, b AS r FROM sym
            UNION
            SELECT reach.node, sym.b AS r FROM reach JOIN sym ON reach.r = sym.a
        ), clusters AS (
            SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster_id
            FROM reach GROUP BY node
        ), sized AS (
            SELECT cluster_id, COUNT(*) AS cluster_size
            FROM clusters GROUP BY cluster_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM graded
        LEFT JOIN clusters USING (doc_id)
        LEFT JOIN sized USING (cluster_id)
        WHERE is_en
          AND quality >= 0.5
          AND (cluster_id IS NULL
               OR (cluster_id = doc_id AND cluster_size <= {_CLUSTER_CAP}))
          AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_KEEP_NUM:04x}'
        GROUP BY source
        ORDER BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate `documents` for training: English-only, quality >= 0.5,
    one representative per near-dup cluster (the smallest doc_id) with
    clusters larger than the policy cap surfaced-and-dropped rather than
    collapsed, ~90% deterministic keep-sample; report kept docs and
    tokens per source.

    The quality threshold is safe cross-engine because the score is
    IEEE arithmetic on identically-derived exact integers (the
    text_stats oracle already proves bit-equality); cluster membership
    and sampling reuse the proven minhash-CC and md5-bucket paths.

    Scale notes: text grading is pure JVM column work in the scan
    stage; the cluster-collapse join is un-hinted (membership scales
    with the duplicated fraction of the corpus -- AQE broadcasts only
    when it actually fits); sampling is a per-row filter; the only
    corpus-sized shuffle is the final per-source aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.lower(F.col("text"))
    graded = docs.select(
        "doc_id",
        "source",
        T.token_count(t).cast("bigint").alias("n_tokens"),
        T.quality_score(t).alias("quality"),
        T.lang_id(t).alias("lang_guess"),
    )
    clusters = connected_components(near_dup_pairs_minhash(docs), src="a", dst="b")
    kept = collapse_near_dup_clusters(
        graded.filter((F.col("lang_guess") == "en") & (F.col("quality") >= 0.5)),
        clusters,
    )
    sampled = deterministic_sample(kept, "doc_id", _KEEP_NUM)
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )
