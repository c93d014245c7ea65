"""Provenance analytics: cross-source vocabulary overlap and n-gram
novelty.

The corpus-composition questions a curation run answers before mixing
sources: how lexically similar are two feeds (near-identical vocabulary
suggests a mirrored crawl), and how much of a source's phrasing is
unique to it (low 8-gram novelty = heavy templating or syndication).
Both are set statistics over vocabulary-bounded frames, so they stay
cheap at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.spandedup import ngram_positions
from ..partitioning import fan_out
from ..sources.tables import load_table
from ..workload import register


@register(
    "source_vocabulary_overlap",
    tags=("provenance", "vocabulary", "jaccard", "corpus-analytics"),
    oracle="""
        WITH vocab AS (
            SELECT DISTINCT source, unnest(string_split(lower(text), ' '))
                       AS tok
            FROM documents
        ),
        sizes AS (
            SELECT source, count(*) AS n FROM vocab GROUP BY source
        ),
        inter AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_common
            FROM vocab a JOIN vocab b
              ON a.tok = b.tok AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT i.source_a, i.source_b,
               CAST(i.n_common AS BIGINT) AS n_common,
               CAST(sa.n + sb.n - i.n_common AS BIGINT) AS n_union,
               CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
                   AS jaccard
        FROM inter i
        JOIN sizes sa ON i.source_a = sa.source
        JOIN sizes sb ON i.source_b = sb.source
        ORDER BY source_a, source_b
    """,
)
def source_vocabulary_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources.  SPARSE: pairs
    sharing zero tokens emit no row (jaccard 0 by absence) -- at real
    source counts the dense pair matrix is almost entirely zeros.

    Scale notes: the frame collapses to DISTINCT (source, token) before
    any join, so everything downstream is vocabulary x source bounded
    regardless of corpus size; the token self-join fans out at most
    |sources|^2 per shared token."""
    docs = load_table(spark, "documents", sf_dir)
    # token explode amplifies before the DISTINCT exchange: fan_out
    # guards the one-file-one-partition trap
    vocab = fan_out(docs).select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(
        F.col("source").alias("source_a"), F.col("tok").alias("tok")
    )
    b = vocab.select(
        F.col("source").alias("source_b"), F.col("tok").alias("tok")
    )
    inter = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n").alias("nb")
    )
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (F.col("na") + F.col("nb") - F.col("n_common"))
            .cast("bigint")
            .alias("n_union"),
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "per_source_ngram_novelty",
    tags=("provenance", "span-dedup", "novelty", "corpus-analytics"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, source, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT source,
                   ('0x' || substr(md5(array_to_string(
                        list_slice(t, i, i + 7), ' ')), 1, 15))::BIGINT
                       AS gram_key
            FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        ),
        spread AS (
            SELECT gram_key, count(*) AS n_sources
            FROM grams GROUP BY gram_key
        )
        SELECT g.source AS source,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN s.n_sources = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unique,
               CAST(SUM(CASE WHEN s.n_sources = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS novelty
        FROM grams g JOIN spread s ON g.gram_key = s.gram_key
        GROUP BY g.source
        ORDER BY g.source
    """,
)
def per_source_ngram_novelty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source 8-gram novelty: the fraction of a source's distinct
    8-grams that appear in NO other source.  Low novelty flags
    syndicated/mirrored feeds before they flood a training mix.

    Scale notes: reuses the span-dedup gram enumeration (8 B keys) and
    collapses to DISTINCT (source, gram_key) map-side before the
    spread count -- both aggregations are gram-universe bounded."""
    docs = load_table(spark, "documents", sf_dir)
    grams = (
        ngram_positions(fan_out(docs).select(F.col("source").alias("doc_id"), "text"))
        .select(F.col("doc_id").alias("source"), "gram_key")
        .distinct()
    )
    spread = grams.groupBy("gram_key").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    return (
        grams.join(spread, "gram_key")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("n_sources") == 1).cast("long"))
            .cast("bigint")
            .alias("n_unique"),
            (
                F.sum((F.col("n_sources") == 1).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
        .orderBy("source")
    )
