"""Count-based bigram language model: train on the corpus, score every
document's n-gram familiarity.

The LM-quality-filter step of a training-data pipeline (CCNet/Gopher
style: score text against a language model, gate on the score) without
an external model artifact: the corpus itself is the model.  Training
is two aggregations (unigram counts, bigram counts); scoring is two
hash joins.

Why NOT log-probabilities in the oracle-checked output: log/exp differ
between JVM and C libm in the last ulp (repo convention: no
transcendentals in oracle-matched doubles), and boundary cases (exact
powers of two) WILL flip a fixed-point rounding.  Instead each bigram
scores an add-one-smoothed probability in integer NANO-units via pure
integer floor division:

    p_nano(w2 | w1) = (1e9 * (c(w1,w2) + 1)) div (c(w1) + V)

Integer sums of p_nano commute (order-independent), so per-document
totals are exact in both engines; the mean is a single final division
of two exact integers (IEEE-identical).  A downstream consumer wanting
log-space scores applies log to the per-bigram ratio locally -- the
ordering information is already in the integers.

Overflow envelope (int64, ANSI mode): the widest intermediate is
1e9 * (c(w1,w2) + 1), safe while no single bigram occurs more than
~9.2e9 times; past that (a ~1e12-token corpus of highly repetitive
text) drop the scale to 1e6 or route through DECIMAL(38,0).

100 TB scale notes: the count tables are vocabulary-sized (|V| and
|V|^2-bounded but Zipf-truncated in practice), far smaller than the
corpus; AQE broadcasts them when they fit, else they hash-join on the
token string.  Scoring explodes each document's bigrams once --
shuffle-linear in corpus tokens, the same order as tokenisation
itself.  Self-counting (each document contributes to the counts that
score it) is the standard corpus-LM setup and is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import fan_out

P_SCALE = 1_000_000_000  # nano-units


def _doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, w1, w2) for every adjacent token pair."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p")
    ).select("doc_id", "p.w1", "p.w2")


def score_documents_bigram_lm(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document bigram-LM familiarity report.

    Output: doc_id, n_bigrams, oov_bigrams (pairs never seen as a
    bigram anywhere in the corpus), sum_p_nano (exact integer total of
    smoothed bigram probabilities), mean_p_nano (double; null for
    documents with < 2 tokens).
    """
    docs = fan_out(docs)
    bi = _doc_bigrams(docs, text_col, id_col)

    toks = F.split(F.lower(F.col(text_col)), " ")
    unigrams = (
        docs.select(F.explode(toks).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = unigrams.agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )  # 1-row: broadcast
    bigram_counts = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )

    scored = (
        bi.join(bigram_counts, ["w1", "w2"], "left")
        .join(unigrams, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.col("c1"),
            F.col("v"),
        )
        .withColumn(
            "p_nano",
            F.expr(f"({P_SCALE} * (c12 + 1)) div (c1 + v)"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum((F.col("c12") == 0).cast("long")).alias("oov_bigrams"),
        F.sum("p_nano").alias("sum_p_nano"),
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            F.coalesce("oov_bigrams", F.lit(0)).cast("bigint").alias(
                "oov_bigrams"
            ),
            F.coalesce("sum_p_nano", F.lit(0)).cast("bigint").alias(
                "sum_p_nano"
            ),
        )
        .withColumn(
            "mean_p_nano",
            F.when(
                F.col("n_bigrams") > 0,
                F.col("sum_p_nano").cast("double") / F.col("n_bigrams"),
            ),
        )
    )
