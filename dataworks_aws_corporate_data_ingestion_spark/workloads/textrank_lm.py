"""TextRank keywords + bigram-LM familiarity workload.

Both queries are integer-exact by construction (fixed-point PageRank,
nano-unit smoothed probabilities), so DuckDB oracles reproduce them
bit-for-bit -- including the 5-round iterative PageRank, which the
oracle unrolls into five chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
from .text_analysis import _LANG_SCORES, _STOP_SQL


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


_BIGRAM_LM_ORACLE = f"""
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
"""


@register(
    "bigram_lm_familiarity",
    bench=True,
    tags=("text-quality", "language-model", "scoring", "fixed-point"),
    oracle=_BIGRAM_LM_ORACLE,
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


# the per-document feature matrix as one reusable oracle CTE body --
# document_feature_matrix certifies it directly and
# quality_model_certificate builds its weak-label ground truth on it
_FEATURE_MATRIX_ORACLE = f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source, t,
                   len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_distinct,
                   len(list_filter(t, x -> list_contains({{stop}}, x)))
                       AS n_stop,
                   {{lang}}
            FROM (SELECT doc_id, source, t, t AS toks FROM toks)
        ),
        pos_gram AS (
            SELECT doc_id, i - 1 AS pos,
                   ('0x' || substr(md5(array_to_string(
                        list_slice(t, i, i + 7), ' ')), 1, 15))::BIGINT
                       AS gram_key
            FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        ),
        dup AS (
            SELECT gram_key FROM pos_gram
            GROUP BY gram_key HAVING count(DISTINCT doc_id) >= 2
        ),
        dpos AS (
            SELECT p.doc_id, p.pos FROM pos_gram p JOIN dup USING (gram_key)
        ),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(max(pos + 8) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS b
            FROM dpos
        ),
        isl AS (
            SELECT doc_id, pos,
                   SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
            FROM brk
        ),
        spans AS (
            SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 8 AS e
            FROM isl GROUP BY doc_id, island
        ),
        span_agg AS (
            SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(e - s) AS dup_tokens
            FROM spans GROUP BY doc_id
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
        bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
        lm_scored AS (
            SELECT b.doc_id, coalesce(c.c12, 0) AS c12,
                   ({P_SCALE} * (coalesce(c.c12, 0) + 1))
                       // (u.c1 + voc.v) AS p_nano
            FROM bi b
            LEFT JOIN bc c ON b.w1 = c.w1 AND b.w2 = c.w2
            JOIN uni u ON b.w1 = u.w1
            CROSS JOIN voc
        ),
        lm_doc AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   SUM(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS oov,
                   SUM(p_nano) AS sum_p
            FROM lm_scored GROUP BY doc_id
        )
        SELECT s.doc_id AS doc_id, s.source AS source,
               CAST(s.n_tokens AS BIGINT) AS n_tokens,
               CAST(s.n_stop AS DOUBLE) / s.n_tokens AS stop_ratio,
               CAST(s.n_distinct AS DOUBLE) / s.n_tokens AS distinct_ratio,
               (CAST(s.n_distinct AS DOUBLE) / s.n_tokens) * 0.5
                 + LEAST(1.0, CAST(s.n_tokens AS DOUBLE) / 100.0) * 0.3
                 + (1.0 - CAST(s.n_stop AS DOUBLE) / s.n_tokens) * 0.2
                   AS quality,
               CASE
                 WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de, s_zh)
                      AND s_en > 0 THEN 'en'
                 WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de, s_zh)
                      AND s_es > 0 THEN 'es'
                 WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de, s_zh)
                      AND s_fr > 0 THEN 'fr'
                 WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de, s_zh)
                      AND s_de > 0 THEN 'de'
                 WHEN s_zh = GREATEST(s_en, s_es, s_fr, s_de, s_zh)
                      AND s_zh > 0 THEN 'zh'
                 ELSE 'und'
               END AS lang_guess,
               CAST(coalesce(sa.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(coalesce(sa.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(coalesce(sa.dup_tokens, 0) AS DOUBLE) / s.n_tokens
                   AS dup_ratio,
               CAST(coalesce(l.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(l.oov, 0) AS BIGINT) AS oov_bigrams,
               CASE WHEN coalesce(l.n_bigrams, 0) > 0
                    THEN CAST(l.sum_p AS DOUBLE) / l.n_bigrams
               END AS mean_p_nano
        FROM scored s
        LEFT JOIN span_agg sa ON s.doc_id = sa.doc_id
        LEFT JOIN lm_doc l ON s.doc_id = l.doc_id
""".replace("{stop}", _STOP_SQL).replace("{lang}", _LANG_SCORES)


@register(
    "document_feature_matrix",
    tags=(
        "training-data",
        "features",
        "text-quality",
        "span-dedup",
        "language-model",
    ),
    oracle=_FEATURE_MATRIX_ORACLE,
)
def document_feature_matrix_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document FEATURE MATRIX for training a quality classifier:
    the scalar text metrics (token/stopword/diversity/quality/lang),
    the span-dedup duplication profile, and the bigram-LM familiarity
    scores, joined into one frame -- the labeled-data prep step of a
    learned quality filter (each family hash-matches its own oracle;
    this query certifies the join).

    Scale notes: the scalar metrics ride the scan stage (zero
    shuffles); the span and LM branches are the linear shapes audited
    in PLANS.md; the three branches share one documents scan via Spark
    plan reuse and join on doc_id."""
    from ..functions import text as T
    from ..operators.ngram_lm import score_documents_bigram_lm
    from ..operators.spandedup import mask_duplicated_spans

    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    base = docs.select(
        "doc_id",
        "source",
        T.token_count(t).alias("n_tokens"),
        T.stopword_ratio(t).alias("stop_ratio"),
        T.distinct_token_ratio(t).alias("distinct_ratio"),
        T.quality_score(t).alias("quality"),
        T.lang_id(t).alias("lang_guess"),
    )
    spans = mask_duplicated_spans(docs).select(
        "doc_id", "n_dup_spans", "dup_tokens", "dup_ratio"
    )
    lm = score_documents_bigram_lm(docs).select(
        "doc_id", "n_bigrams", "oov_bigrams", "mean_p_nano"
    )
    return base.join(spans, "doc_id").join(lm, "doc_id")


@register(
    "quality_model_certificate",
    tags=("training-data", "quality-model", "recall-certificate", "ml"),
    oracle="WITH fm AS ("
    + _FEATURE_MATRIX_ORACLE
    + """
    ),
    lab AS (
        SELECT doc_id,
               CASE WHEN quality >= 0.5 AND dup_ratio <= 0.5
                    THEN 1 ELSE 0 END AS label
        FROM fm
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(label) AS BIGINT) AS n_weak_pos,
           TRUE AS agreement_ok,
           TRUE AS separation_ok,
           TRUE AS bounds_ok
    FROM lab
    """,
)
def quality_model_certificate_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-checkable certificate for the LEARNED quality filter
    (operators/quality_model.py): trains the logistic model on weak
    labels bootstrapped from the oracle-certified feature matrix, then
    states integer-exact behavioural claims -- label counts the DuckDB
    oracle recomputes independently from the same feature SQL, plus
    agreement/separation/bounds booleans that hold far outside LBFGS
    coefficient jitter (see quality_model_certificate).  This is the
    certificate pattern that lets a float-valued ML artifact join the
    hash-checked registry without cross-engine float comparison."""
    from ..operators.quality_model import quality_model_certificate

    return quality_model_certificate(
        document_feature_matrix_query(spark, sf_dir)
    )


@register(
    "bigram_lm_incremental",
    tags=("text-quality", "language-model", "scoring", "fixed-point",
          "incremental", "index-maintenance"),
    oracle=_BIGRAM_LM_ORACLE,
)
def bigram_lm_incremental_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LM-model MAINTENANCE certification: materialise the bigram-LM
    count tables from 90% of the corpus
    (operators/ngram_lm.py::materialize_bigram_lm), admit the remaining
    10% via append_to_bigram_lm (vocabulary-sized count merges -- the
    corpus is never re-read), then score EVERY document against the
    stored tables.  The oracle is the full-corpus self-trained LM, so a
    hash match proves append == retrain, bit for bit -- the same
    certification shape as bm25_search_appended and
    near_dup_pairs_indexed.  Daily corpus growth at 100 TB costs one
    delta tokenisation plus megabyte-scale count merges, not an LM
    retrain over history."""
    from ..operators.ngram_lm import (
        append_to_bigram_lm,
        materialize_bigram_lm,
        score_documents_against_lm,
    )

    docs = load_table(spark, "documents", sf_dir)
    materialize_bigram_lm(
        spark, docs.filter(F.col("doc_id") % 10 != 0), "lm_inc", n_buckets=8
    )
    append_to_bigram_lm(spark, docs.filter(F.col("doc_id") % 10 == 0), "lm_inc")
    return score_documents_against_lm(
        docs, spark.table("lm_inc_uni"), spark.table("lm_inc_bi")
    )


@register(
    "lm_admission_streaming_certificate",
    tags=("text-quality", "language-model", "scoring", "fixed-point",
          "streaming", "incremental", "index-maintenance"),
    oracle=_BIGRAM_LM_ORACLE,
)
def lm_admission_streaming_certificate_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming-admission certification: admit the corpus in three
    micro-batch-shaped slices through the REAL admission round
    (streaming/lm_admission.py::admit_lm_batch -- replay ledger,
    per-table batch_token commit markers, post-admission scoring),
    compact the partials mid-sequence (compact_lm_index), then score
    every document against the final stored model.  Hash-matching the
    full self-trained oracle proves N-batch streaming admission (+ a
    compaction in the middle) == one-shot retrain, bit for bit -- the
    oracle-certified twin of tests/test_streaming.py::TestLmAdmission.
    At 100 TB each batch costs its own tokenisation plus
    vocabulary-sized bucketed appends; compaction is a vocabulary-sized
    fold; the corpus is never rescanned."""
    from ..operators.ngram_lm import score_documents_against_lm
    from ..streaming.lm_admission import (
        admit_lm_batch,
        compact_lm_index,
        init_lm_index,
        read_lm_counts,
    )

    docs = load_table(spark, "documents", sf_dir)
    init_lm_index(spark, "lm_adm", n_buckets=8)
    admit_lm_batch(spark, docs.filter(F.col("doc_id") % 3 == 0), "lm_adm")
    admit_lm_batch(spark, docs.filter(F.col("doc_id") % 3 == 1), "lm_adm")
    compact_lm_index(spark, "lm_adm")
    admit_lm_batch(spark, docs.filter(F.col("doc_id") % 3 == 2), "lm_adm")
    uni, bi = read_lm_counts(spark, "lm_adm")
    return score_documents_against_lm(docs, uni, bi)
