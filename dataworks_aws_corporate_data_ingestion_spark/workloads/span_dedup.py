"""Span-level substring-dedup workload (duplicate n-gram masking).

The distributed analogue of the ExactSubstr pass in Lee et al. (ACL
2022): find every 8-token window that appears verbatim in >= 2 distinct
documents, merge overlapping windows into maximal spans per document,
and rebuild the text with those spans removed.  Complements the
doc-level dedup suite (dedup_suite.py), which can only keep or drop
whole documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.spandedup import (
    mask_duplicated_spans,
    mask_duplicated_spans_incremental,
    top_repeated_grams,
)
from ..sources.tables import load_table
from ..workload import register

# Shared oracle prelude: 0-based window positions and the portable
# 60-bit md5 gram key, exactly as operators/spandedup.py computes them.
_POSITIONS = """
    toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    pos_gram AS (
        SELECT doc_id, i - 1 AS pos,
               ('0x' || substr(md5(array_to_string(list_slice(t, i, i + 7),
                                                   ' ')), 1, 15))::BIGINT
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
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
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
    )
"""


@register(
    "dup_ngram_span_stats",
    bench=True,
    tags=("dedup", "span-dedup", "exact-substring", "masking"),
    oracle=f"""
        WITH {_POSITIONS},
        span_agg AS (
            SELECT doc_id, COUNT(*) AS n_dup_spans,
                   SUM(e - s) AS dup_tokens
            FROM spans GROUP BY doc_id
        ),
        tokpos AS (
            SELECT doc_id, unnest(t) AS tok,
                   generate_subscripts(t, 1) - 1 AS pos
            FROM toks
        ),
        clean AS (
            SELECT tp.doc_id,
                   string_agg(tp.tok, ' ' ORDER BY tp.pos) AS clean_text
            FROM tokpos tp
            WHERE NOT EXISTS (
                SELECT 1 FROM spans sp
                WHERE sp.doc_id = tp.doc_id
                  AND tp.pos >= sp.s AND tp.pos < sp.e)
            GROUP BY tp.doc_id
        )
        SELECT k.doc_id AS doc_id,
               CAST(len(k.t) AS BIGINT) AS total_tokens,
               CAST(coalesce(sa.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(coalesce(sa.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               coalesce(c.clean_text, '') AS clean_text,
               CAST(coalesce(sa.dup_tokens, 0) AS DOUBLE) / len(k.t)
                   AS dup_ratio
        FROM toks k
        LEFT JOIN span_agg sa ON k.doc_id = sa.doc_id
        LEFT JOIN clean c ON k.doc_id = c.doc_id
    """,
)
def dup_ngram_span_stats_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document duplicated-span report + masked clean text.

    Scale path (operators/spandedup.py): one linear gram-key shuffle
    (8 B keys), one doc_id-keyed island merge over duplicated positions
    only, and a codegen positional-filter rebuild -- never a pairwise
    comparison.  The reference engine has no span-level dedup at all
    (beyond-parity; its closest pass is whole-record latest-wins,
    steps/ingesters.py:448-457)."""
    return mask_duplicated_spans(load_table(spark, "documents", sf_dir))


@register(
    "dup_ngram_top_repeated",
    tags=("dedup", "span-dedup", "report", "top-k"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        pg AS (
            SELECT doc_id,
                   array_to_string(list_slice(t, i, i + 7), ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        )
        SELECT gram,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
               CAST(count(*) AS BIGINT) AS occurrences
        FROM pg
        GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2
        ORDER BY doc_freq DESC, occurrences DESC, gram ASC
        LIMIT 20
    """,
)
def dup_ngram_top_repeated_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 verbatim-repeated 8-grams by distinct-document frequency
    -- the audit view a curation run reads before deciding a masking
    threshold.  Bounded top-k (TakeOrderedAndProject), total ordering
    via the (doc_freq, occurrences, gram) tiebreak."""
    return top_repeated_grams(load_table(spark, "documents", sf_dir))


@register(
    "dup_ngram_spans_incremental",
    tags=("dedup", "span-dedup", "exact-substring", "incremental"),
    oracle=f"""
        WITH {_POSITIONS},
        span_agg AS (
            SELECT doc_id, COUNT(*) AS n_dup_spans,
                   SUM(e - s) AS dup_tokens
            FROM spans GROUP BY doc_id
        ),
        tokpos AS (
            SELECT doc_id, unnest(t) AS tok,
                   generate_subscripts(t, 1) - 1 AS pos
            FROM toks
        ),
        clean AS (
            SELECT tp.doc_id,
                   string_agg(tp.tok, ' ' ORDER BY tp.pos) AS clean_text
            FROM tokpos tp
            WHERE NOT EXISTS (
                SELECT 1 FROM spans sp
                WHERE sp.doc_id = tp.doc_id
                  AND tp.pos >= sp.s AND tp.pos < sp.e)
            GROUP BY tp.doc_id
        )
        SELECT k.doc_id AS doc_id,
               CAST(len(k.t) AS BIGINT) AS total_tokens,
               CAST(coalesce(sa.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(coalesce(sa.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               coalesce(c.clean_text, '') AS clean_text,
               CAST(coalesce(sa.dup_tokens, 0) AS DOUBLE) / len(k.t)
                   AS dup_ratio
        FROM toks k
        LEFT JOIN span_agg sa ON k.doc_id = sa.doc_id
        LEFT JOIN clean c ON k.doc_id = c.doc_id
        WHERE k.doc_id % 10 = 0
    """,
)
def dup_ngram_spans_incremental_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily-delta span dedup: docs with doc_id % 10 == 0 play the
    incoming batch, the rest the standing corpus; output = the batch
    masking report where duplication counts distinct docs across
    corpus+delta.  Identical numbers to running the full batch pass and
    filtering to the delta (the oracle does exactly that) -- but only
    delta positions ever reach the span merge, and the corpus side
    collapses to one gram-count aggregation (or zero work against the
    materialised gram index; see operators/spandedup.py)."""
    d = load_table(spark, "documents", sf_dir)
    return mask_duplicated_spans_incremental(
        corpus=d.filter(F.col("doc_id") % 10 != 0),
        delta=d.filter(F.col("doc_id") % 10 == 0),
    )


@register(
    "curation_pipeline_spanlm",
    tags=(
        "training-data",
        "composition",
        "span-dedup",
        "language-model",
        "masking",
    ),
    oracle=f"""
        WITH {_POSITIONS},
        span_agg AS (
            SELECT doc_id, SUM(e - s) AS dup_tokens
            FROM spans GROUP BY doc_id
        ),
        doc_gate AS (
            -- dup_tokens * 2 <= total_tokens (integer compare, no ratio)
            SELECT k.doc_id, k.t
            FROM toks k LEFT JOIN span_agg sa ON k.doc_id = sa.doc_id
            WHERE coalesce(sa.dup_tokens, 0) * 2 <= len(k.t)
        ),
        tokpos AS (
            SELECT doc_id, unnest(t) AS tok,
                   generate_subscripts(t, 1) - 1 AS pos
            FROM doc_gate
        ),
        kept AS (
            SELECT tp.doc_id, tp.tok, tp.pos
            FROM tokpos tp
            WHERE NOT EXISTS (
                SELECT 1 FROM spans sp
                WHERE sp.doc_id = tp.doc_id
                  AND tp.pos >= sp.s AND tp.pos < sp.e)
        ),
        clean_len AS (
            SELECT doc_id, COUNT(*) AS n_clean FROM kept GROUP BY doc_id
        ),
        bi AS (
            SELECT doc_id, tok AS w1,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM kept
        ),
        bi2 AS (SELECT doc_id, w1, w2 FROM bi WHERE w2 IS NOT NULL),
        uni AS (
            SELECT tok AS w1, COUNT(*) AS c1 FROM kept GROUP BY tok
        ),
        voc AS (SELECT COUNT(*)::BIGINT AS v FROM uni),
        bc AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM bi2 GROUP BY w1, w2
        ),
        scored AS (
            SELECT b.doc_id,
                   coalesce(c.c12, 0) AS c12,
                   (1000000000 * (coalesce(c.c12, 0) + 1))
                       // (u.c1 + voc.v) AS p_nano
            FROM bi2 b
            LEFT JOIN bc c ON b.w1 = c.w1 AND b.w2 = c.w2
            JOIN uni u ON b.w1 = u.w1
            CROSS JOIN voc
        ),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   SUM(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS oov,
                   SUM(p_nano) AS sum_p
            FROM scored GROUP BY doc_id
        ),
        final_docs AS (
            SELECT p.doc_id, cl.n_clean, p.n_bigrams, p.sum_p
            FROM per_doc p JOIN clean_len cl ON p.doc_id = cl.doc_id
            WHERE p.oov * 5 <= p.n_bigrams AND p.n_bigrams >= 8
        )
        SELECT d.source AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(f.n_clean) AS BIGINT) AS total_clean_tokens,
               CAST(SUM(f.sum_p) AS BIGINT) AS sum_p_nano,
               CAST(SUM(f.sum_p) AS DOUBLE) / SUM(f.n_bigrams)
                   AS mean_p_nano
        FROM final_docs f JOIN documents d ON f.doc_id = d.doc_id
        GROUP BY d.source
        ORDER BY d.source
    """,
)
def curation_pipeline_spanlm_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round-6 capstone composition: span-mask boilerplate -> drop docs
    that are majority duplicated passage (integer gate: dup_tokens*2 <=
    total_tokens) -> train the bigram LM on the MASKED survivor corpus
    -> gate on familiarity (oov*5 <= n_bigrams, n_bigrams >= 8) ->
    per-source accounting of the curated corpus.

    Every stage reuses an operator that hash-matches its own oracle
    (spandedup masking, ngram_lm scoring); this query certifies the
    COMPOSITION, incl. the subtlety that masking changes adjacency (the
    LM sees bigrams across excised spans) and that the LM trains on the
    post-mask, post-gate corpus -- exactly what a real curation run
    feeds the tokenizer.  All thresholds are cross-multiplied integers;
    the only doubles are final divisions of exact sums."""
    from ..operators.ngram_lm import score_documents_bigram_lm

    docs = load_table(spark, "documents", sf_dir)
    masked = mask_duplicated_spans(docs)
    gated = masked.filter(
        F.col("dup_tokens") * 2 <= F.col("total_tokens")
    )
    clean_docs = gated.select(
        "doc_id", F.col("clean_text").alias("text")
    )
    clean_len = clean_docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " "))
        .cast("bigint")
        .alias("n_clean"),
    )
    lm = score_documents_bigram_lm(clean_docs)
    final_docs = lm.filter(
        (F.col("oov_bigrams") * 5 <= F.col("n_bigrams"))
        & (F.col("n_bigrams") >= 8)
    )
    src = docs.select("doc_id", "source")
    return (
        final_docs.join(clean_len, "doc_id")
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_clean").cast("bigint").alias("total_clean_tokens"),
            F.sum("sum_p_nano").cast("bigint").alias("sum_p_nano"),
            (
                F.sum("sum_p_nano").cast("double")
                / F.sum("n_bigrams")
            ).alias("mean_p_nano"),
        )
        .orderBy("source")
    )


@register(
    "span_admission_streaming_certificate",
    tags=("dedup", "span-dedup", "exact-substring", "streaming",
          "incremental", "index-maintenance"),
    oracle=f"""
        WITH {_POSITIONS}
        SELECT gram_key,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM pos_gram
        GROUP BY gram_key
        HAVING count(DISTINCT doc_id) >= 2
    """,
)
def span_admission_streaming_certificate_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming span-admission INDEX-STATE certification: admit the
    corpus in three micro-batch-shaped slices through the REAL
    admission round (streaming/span_admission.py::admit_span_batch --
    replay ledger, batch_token commit markers), compact the gram
    partials mid-sequence (compact_span_index), then read back the
    accumulated index restricted to the decision-relevant keys
    (doc_freq >= MIN_DOCS -- the grams the masking rule fires on).
    Hash-matching the oracle's full-corpus gram doc-frequencies proves
    N-batch streaming admission (+ compaction) accumulates EXACTLY the
    one-shot index: per-batch countDistinct sums across disjoint
    ledgered batches to the corpus-wide distinct-doc count, bit for
    bit.  At 100 TB each batch appends batch-sized bucketed partials;
    compaction is an index-sized fold; the corpus is never rescanned."""
    from ..streaming.span_admission import (
        admit_span_batch,
        compact_span_index,
        init_span_index,
        read_gram_counts,
    )

    docs = load_table(spark, "documents", sf_dir)
    init_span_index(spark, "span_adm", n_buckets=8)
    admit_span_batch(spark, docs.filter(F.col("doc_id") % 3 == 0), "span_adm")
    admit_span_batch(spark, docs.filter(F.col("doc_id") % 3 == 1), "span_adm")
    compact_span_index(spark, "span_adm")
    admit_span_batch(spark, docs.filter(F.col("doc_id") % 3 == 2), "span_adm")
    return read_gram_counts(spark, "span_adm").filter(
        F.col("doc_freq") >= 2
    )
