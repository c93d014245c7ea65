"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation/benchmark set.

Training corpora must not contain eval data; the standard check
(GPT-3/PaLM/Llama reports all describe variants of it) is n-gram
collision -- a document is contaminated if any length-n token window
also appears in a benchmark document.  Exactness matters more than
fuzziness here (a single verbatim benchmark line is a leak), so this is
a set-intersection problem, not a similarity search: explode corpus
shingles, semi-join against the benchmark's distinct shingle universe,
count hits per document.

Scale notes (100 TB corpus, benchmark ~10^5 docs):

* The benchmark shingle universe is millions of rows at most --
  broadcast-sized.  The join is left un-hinted so AQE broadcasts it and
  the corpus-side explode never shuffles; the only corpus-sized
  exchange is the per-doc hit aggregate, and that is map-side combined
  on (doc_id) with hit rows only (the anti-join drop happens before the
  exchange).
* Shingle length n is the precision knob: short n-grams collide on
  boilerplate (false contamination), long ones miss paraphrase; n in
  8..13 is the published sweet spot.  The collision check hashes
  nothing -- exact string equality, so a flag is a proof, not a score.
* `decontaminate` (the subtractive form) is the same join as a
  left-anti, preserving every corpus column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles
from ..partitioning import fan_out


def benchmark_shingles(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """The benchmark's distinct shingle universe: one `shingle` column.
    Build once per benchmark release and cache/materialise it."""
    return (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, n_hits): distinct benchmark shingles each corpus doc
    contains.  Only contaminated docs appear (inner join semantics);
    clean docs are the overwhelming majority and materialising zero rows
    for them would dominate output volume at scale."""
    bench = benchmark_shingles(benchmark, text_col=text_col, n=n)
    # word_shingles is already distinct-per-doc, so the per-doc count
    # below is "distinct benchmark shingles present", not occurrences
    # shingle explode amplifies ~|tokens| x before the join: guard the
    # one-file-one-partition trap (no-op on already-parallel scans)
    corpus = fan_out(docs).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    return (
        corpus.join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """The subtractive form: corpus rows with NO benchmark shingle
    collision, all columns preserved -- one left-anti semi-structure
    against the hit set."""
    hits = contamination_hits(
        docs, benchmark, id_col=id_col, text_col=text_col, n=n
    ).select(id_col)
    return docs.join(hits, id_col, "left_anti")
