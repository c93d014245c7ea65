"""TextRank keywords + bigram-LM familiarity workload.

Both queries are integer-exact by construction (fixed-point PageRank,
nano-unit smoothed probabilities), so DuckDB oracles reproduce them
bit-for-bit -- including the 5-round iterative PageRank, which the
oracle unrolls into five chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.ngram_lm import P_SCALE, score_documents_bigram_lm
from ..operators.textrank import (
    BASE,
    DAMPING_DEN,
    DAMPING_NUM,
    SCALE,
    textrank_keywords,
)
from ..sources.tables import load_table
from ..workload import register


def _textrank_oracle(iterations: int = 5, k: int = 20) -> str:
    """Unrolled fixed-point PageRank: r0..r{iterations} as chained
    CTEs, mirroring operators/textrank.py round for round."""
    its = []
    for t in range(1, iterations + 1):
        its.append(
            f"""r{t} AS (
            SELECT e.dst AS node,
                   {BASE} + ({DAMPING_NUM} * SUM(p.r // dg.d))
                       // {DAMPING_DEN} AS r
            FROM edges e
            JOIN r{t - 1} p ON e.src = p.node
            JOIN deg dg ON e.src = dg.src
            GROUP BY e.dst
        )"""
        )
    chain = ",\n        ".join(its)
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        directed AS (
            SELECT w1, w2 FROM (
                SELECT t[i] AS w1, t[i + 1] AS w2
                FROM toks, unnest(range(1, len(t))) AS u(i)
                WHERE t[i] <> t[i + 1]
            ) GROUP BY w1, w2 HAVING count(*) >= 2
        ),
        edges AS (
            SELECT DISTINCT src, dst FROM (
                SELECT w1 AS src, w2 AS dst FROM directed
                UNION ALL
                SELECT w2 AS src, w1 AS dst FROM directed
            )
        ),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, {SCALE}::BIGINT AS r FROM deg),
        {chain}
        SELECT node AS token, CAST(r AS BIGINT) AS rank_micro
        FROM r{iterations}
        ORDER BY rank_micro DESC, token ASC
        LIMIT {k}
    """


@register(
    "textrank_keywords",
    tags=("graph", "iterative", "pagerank", "textrank", "fixed-point"),
    oracle=_textrank_oracle(),
)
def textrank_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus keywords by 5-round fixed-point PageRank over the
    word co-occurrence graph (TextRank).  The iterative-algorithm
    family's oracle-exact representative: integer micro-unit ranks make
    the 5 chained join+aggregate rounds bit-reproducible in SQL (see
    operators/textrank.py for the arithmetic and the overflow
    envelope)."""
    return textrank_keywords(load_table(spark, "documents", sf_dir))


@register(
    "bigram_lm_familiarity",
    bench=True,
    tags=("text-quality", "language-model", "scoring", "fixed-point"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        bi AS (
            SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM toks, unnest(range(1, len(t))) AS u(i)
        ),
        uni AS (
            SELECT w1, count(*) AS c1 FROM (
                SELECT unnest(t) AS w1 FROM toks
            ) GROUP BY w1
        ),
        voc AS (SELECT count(*)::BIGINT AS v FROM uni),
        bc AS (
            SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2
        ),
        scored AS (
            SELECT b.doc_id,
                   coalesce(c.c12, 0) AS c12,
                   ({P_SCALE}
                    * (coalesce(c.c12, 0) + 1)) // (u.c1 + voc.v)
                       AS p_nano
            FROM bi b
            LEFT JOIN bc c ON b.w1 = c.w1 AND b.w2 = c.w2
            JOIN uni u ON b.w1 = u.w1
            CROSS JOIN voc
        ),
        per_doc AS (
            SELECT doc_id,
                   count(*) AS n_bigrams,
                   SUM(CASE WHEN c12 = 0 THEN 1 ELSE 0 END)
                       AS oov_bigrams,
                   SUM(p_nano) AS sum_p_nano
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id AS doc_id,
               CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(p.oov_bigrams, 0) AS BIGINT) AS oov_bigrams,
               CAST(coalesce(p.sum_p_nano, 0) AS BIGINT) AS sum_p_nano,
               CASE WHEN coalesce(p.n_bigrams, 0) > 0
                    THEN CAST(p.sum_p_nano AS DOUBLE) / p.n_bigrams
               END AS mean_p_nano
        FROM documents d
        LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
)
def bigram_lm_familiarity_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document bigram-LM familiarity: train add-one-smoothed
    bigram counts on the corpus, score every document's adjacent pairs
    in integer nano-units (exact cross-engine sums; see
    operators/ngram_lm.py for why not log-space).  The corpus-as-model
    quality-filter step of a curation pipeline."""
    return score_documents_bigram_lm(load_table(spark, "documents", sf_dir))
