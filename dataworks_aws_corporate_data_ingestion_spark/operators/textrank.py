"""Fixed-point PageRank and the TextRank keyword graph.

The engine's iterative-algorithm family (alongside connected components
in operators/graph.py): PageRank over an arbitrary edge DataFrame, and
the classic TextRank application (Mihalcea & Tarau, EMNLP 2004) --
corpus-level keyword extraction over the word co-occurrence graph.

Why FIXED-POINT INTEGER arithmetic: float PageRank sums neighbor
contributions in partition order, so two engines (or two runs) disagree
in the last ulp and no exact oracle can exist.  Here ranks live in
integer micro-units (SCALE = 1e6) and every step is order-independent
integer math:

    r_0(v)     = SCALE
    r_{t+1}(v) = floor(0.15 * SCALE)
                 + (85 * sum_{u->v} (r_t(u) div d_u)) div 100

Integer sums commute, floor division is deterministic, and DuckDB's
`//` matches Spark's `div` on non-negative BIGINTs -- so a 5-iteration
unrolled SQL oracle reproduces the ranks BIT-EXACTLY.  The floor in
each division leaks < 1 micro-unit of mass per edge per iteration
(conservative, deterministic), which is noise at SCALE = 1e6 and the
price of exactness.

Overflow envelope (int64, ANSI mode): total rank mass is N * SCALE, and
a node's contribution sum is bounded by the total mass, so the widest
intermediate is 85 * N * SCALE -- safe for N up to ~1e11 nodes at
SCALE = 1e6.  Beyond that, lower SCALE or route the sum through
DECIMAL(38,0) (same pattern as the CC hash-sum signature,
operators/graph.py).

100 TB scale notes: each iteration is one hash join (ranks x edges on
src -- the edge table is pre-joined with degrees ONCE) plus one
groupBy(dst) with map-side partial sums; iterations are chained behind
eager localCheckpoint so the plan stays O(1) deep instead of doubling
per round.  For TextRank the graph is vocabulary-sized (|V| = distinct
tokens, |E| = distinct co-occurring pairs), orders of magnitude smaller
than the corpus that produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import fan_out

SCALE = 1_000_000
DAMPING_NUM = 85
DAMPING_DEN = 100
BASE = (DAMPING_DEN - DAMPING_NUM) * SCALE // DAMPING_DEN  # 150000


def word_cooccurrence_graph(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Undirected TextRank word graph: (src, dst) token pairs adjacent
    somewhere in the corpus at least min_count times (directed count),
    symmetrised and distinct.  Self-loops dropped."""
    docs = fan_out(docs)
    toks = F.split(F.lower(F.col(text_col)), " ")
    # arrays_zip of two slices, not transform(sequence, element_at):
    # the per-index lambda form measured 2.3x slower on the sf0.1
    # adjacent-pair count (see operators/ngram_lm.py::_doc_bigrams --
    # r11, guide 1.2 step 2); identical pair multiset
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    directed = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .filter(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("w1", "w2")
    )
    return (
        directed.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionAll(
            directed.select(
                F.col("w2").alias("src"), F.col("w1").alias("dst")
            )
        )
        .distinct()
    )


def pagerank_fixed_point(
    edges: DataFrame, iterations: int = 5, scale: int = SCALE
) -> DataFrame:
    """(node, rank_micro) after `iterations` rounds of integer-exact
    PageRank over a symmetric edge set (every node has in-edges, so no
    dangling-mass term).  Generic: works over ANY (src, dst) DataFrame
    -- the dup-candidate graph, the word graph, a citation graph."""
    base = (DAMPING_DEN - DAMPING_NUM) * scale // DAMPING_DEN
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # degrees ride along with the edges so the loop never re-joins them
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(scale).cast("long").alias("r")
    )
    for _ in range(iterations):
        contrib = edges_deg.join(
            ranks, edges_deg["src"] == ranks["node"]
        ).select(
            F.col("dst").alias("node"),
            F.expr("r div d").alias("c"),
        )
        ranks = contrib.groupBy("node").agg(
            (
                F.lit(base)
                + F.expr(
                    f"({DAMPING_NUM} * sum(c)) div {DAMPING_DEN}"
                )
            ).alias("r")
        )
        # eager checkpoint: keeps the lineage O(1) instead of doubling
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_micro"))


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    iterations: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k corpus keywords by TextRank score (integer micro-units);
    total ordering via the (rank desc, token asc) tiebreak."""
    graph = word_cooccurrence_graph(docs, text_col, min_count)
    ranks = pagerank_fixed_point(graph, iterations)
    return (
        ranks.select(F.col("node").alias("token"), "rank_micro")
        .orderBy(F.desc("rank_micro"), F.asc("token"))
        .limit(k)
    )
