"""Text-analysis workload: every functions.text operator over documents,
with a formula-identical DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.tables import load_table
from ..workload import register

_STOP_SQL = "['a','the','and','of','to']"
_MARKER_SQL = {
    "en": "['a','the','and','of','to']",
    "es": "['el','la','los','de','que']",
    "fr": "['le','la','les','des','et']",
    "de": "['der','die','das','und','nicht']",
    "zh": "['de5','shi4','le5','zai4','you3']",
}

_LANG_SCORES = ",\n".join(
    f"len(list_filter(toks, t -> list_contains({m}, t))) AS s_{code}"
    for code, m in _MARKER_SQL.items()
)


@register(
    "text_stats",
    bench=True,
    tags=("text", "scalar-functions"),
    oracle=f"""
        WITH tokd AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        ), scored AS (
            SELECT doc_id, toks,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_distinct,
                   len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS n_stop,
                   {_LANG_SCORES}
            FROM tokd
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
               CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
               (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5
                 + LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.3
                 + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.2 AS quality,
               CASE
                 WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de, s_zh) AND s_en > 0 THEN 'en'
                 WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de, s_zh) AND s_es > 0 THEN 'es'
                 WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de, s_zh) AND s_fr > 0 THEN 'fr'
                 WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de, s_zh) AND s_de > 0 THEN 'de'
                 WHEN s_zh = GREATEST(s_en, s_es, s_fr, s_de, s_zh) AND s_zh > 0 THEN 'zh'
                 ELSE 'und'
               END AS lang_guess,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(toks, t -> CAST(len(t)*256 + ascii(t) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000000007
               ) AS fingerprint
        FROM scored
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count, stopword/diversity ratios, quality score, language
    guess, and rolling-hash fingerprint -- all JVM column expressions in a
    single projection (one codegen stage, zero shuffles, zero Python)."""
    d = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        T.stopword_ratio(t).alias("stop_ratio"),
        T.distinct_token_ratio(t).alias("distinct_ratio"),
        T.quality_score(t).alias("quality"),
        T.lang_id(t).alias("lang_guess"),
        T.fingerprint(t).alias("fingerprint"),
    )


@register(
    "document_chunks_udtf",
    tags=("text", "udtf", "lateral", "chunking"),
    oracle="""
        SELECT doc_id,
               CAST(start // 40 AS BIGINT) AS chunk_idx,
               array_to_string(list_slice(toks, start + 1, start + 50), ' ')
                   AS chunk_text,
               CAST(len(list_slice(toks, start + 1, start + 50)) AS BIGINT)
                   AS n_tokens
        FROM (
            SELECT doc_id, toks, unnest(range(0, greatest(n, 1), 40)) AS start
            FROM (
                SELECT doc_id,
                       string_split(lower(text), ' ') AS toks,
                       len(string_split(lower(text), ' ')) AS n
                FROM documents
            )
        )
    """,
)
def document_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (50-token windows, stride 40)
    via a Python UDTF in a LATERAL join -- the standard pre-tokenise step
    of a training-data pipeline, and the engine's UDTF surface
    demonstration (the reference has none, SURVEY.md section 2.10).

    Scale notes: the UDTF is Arrow-optimised and runs inside the scan
    stage (no shuffle); output grows ~n_tokens/stride per document, which
    is the point -- chunking before a shuffle would multiply exchange
    volume ~25%, so keep it last in the per-row chain."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView(
        "documents_chunks_v"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM documents_chunks_v d, LATERAL chunk_document(d.text, 50, 40) c
        """
    )


@register(
    "quality_by_source",
    tags=("text", "aggregation"),
    oracle=f"""
        WITH tokd AS (
            SELECT source, string_split(lower(text), ' ') AS toks FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               -- BIGINT cast: DuckDB SUM(int) yields HUGEINT, which pandas
               -- renders as float and breaks the value hash
               CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
               CAST(SUM(len(list_distinct(toks))) AS DOUBLE) / SUM(len(toks))
                   AS distinct_ratio,
               CAST(SUM(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t)))) AS DOUBLE)
                   / SUM(len(toks)) AS stop_ratio
        FROM tokd GROUP BY source
    """,
)
def quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation roll-up: per-source token counts and corpus-level
    ratios.  Sums stay in exact integer space; the single double division
    at the end is bit-identical across engines (summing per-doc doubles
    would not be: double->decimal cast rounding differs by engine)."""
    d = load_table(spark, "documents", sf_dir)
    toks = T.tokens(F.col("text"))
    stop_set = F.array(*[F.lit(w) for w in T.STOPWORDS])
    return d.select(
        "source",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_dist"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_set, t)))
        .cast("bigint")
        .alias("n_stop"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.sum("n_dist").cast("double") / F.sum("n_tok")).alias("distinct_ratio"),
        (F.sum("n_stop").cast("double") / F.sum("n_tok")).alias("stop_ratio"),
    )
