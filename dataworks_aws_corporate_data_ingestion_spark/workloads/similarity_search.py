"""Similarity-search workload over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..operators.similarity import (
    brute_force_topk,
    knn_label_vote,
    ivf_topk,
    lsh_near_dup_pairs,
    lsh_topk,
    pq_topk,
)
from ..sources.tables import load_table
from ..workload import register

_COS_SQL = (
    "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
)

# Pair-scan scaffold for the N x N oracles (r9 verdict #3): materialise
# the DOUBLE[] cast and the norm ONCE per vector, so each candidate pair
# pays a single dot product and two scalar multiplies instead of the
# inline _COS_SQL's six dot products and four list casts (~10x, measured
# -- the difference between the sf1.0 sweep finishing and dying).  Bit-
# identical to _COS_SQL: same cast arrays, same left-to-right dot fold,
# same sqrt operands, same a-side*b-side multiplication order, one IEEE
# division.
_V_CTE = """v AS MATERIALIZED (
            SELECT vec_id,
                   CAST(embedding AS DOUBLE[]) AS ev,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings
        )"""


def _pair_cos(x: str, y: str) -> str:
    return f"list_dot_product({x}.ev, {y}.ev) / ({x}.nrm * {y}.nrm)"


@register(
    "ann_cosine_topk",
    bench=True,
    tags=("similarity", "topk", "vectors", "small-scale-only", "ground-truth-twin"),
    oracle=f"""
        WITH {_V_CTE}
        SELECT query_id, neighbor_id, cosine_sim FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_pair_cos("q", "c")} AS cosine_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_pair_cos("q", "c")} DESC,
                                c.vec_id ASC
                   ) AS rn
            FROM v q, v c
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
        ) WHERE rn <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbours for the first 10 vectors: the
    brute-force ANN baseline and GROUND-TRUTH TWIN.  Small-scale only:
    cost is |queries| x corpus; at 100 TB use ann_lsh_topk / ann_ivf_topk
    (both recall-certified against this baseline).

    Scale notes: broadcast queries + corpus linear scan; dot products are
    sequential folds (bit-identical to the oracle), ranked per query with
    neighbor_id tiebreaks."""
    emb = load_table(spark, "embeddings", sf_dir)
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _recall_certificate(
    exact: DataFrame, approx: DataFrame, recall_pct: int
) -> DataFrame:
    """One-row recall certificate comparing an approximate top-k against
    the exact baseline: (n_queries, n_exact_pairs, recall_ok).  The
    threshold compare is cross-multiplied INTEGER counts (hits*100 >=
    exact*pct), so the claim is bit-stable cross-engine -- this is how an
    approximate operator gets a driver-checkable value-hash oracle: the
    oracle states the contract (all queries present, k pairs each,
    recall holds), and a recall regression flips recall_ok to false and
    hash-mismatches."""
    # NOT cached on purpose (r10 optimization note): the exact side is
    # consumed twice (hit join + pair-count agg), but its two identical
    # window subtrees share one exchange that AQE's runtime exchange
    # reuse executes once -- measured: a tracked_persist here read 0.3s
    # SLOWER on ann_ivf_topk (cache build on top of free stage reuse).
    ex = exact.select("query_id", "neighbor_id")
    hits = approx.select("query_id", "neighbor_id").join(
        ex, ["query_id", "neighbor_id"]
    )
    return (
        ex.agg(
            F.count_distinct("query_id").cast("bigint").alias("n_queries"),
            F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs"),
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("__n_hits")))
        .select(
            "n_queries",
            "n_exact_pairs",
            (
                F.col("__n_hits") * 100 >= F.col("n_exact_pairs") * recall_pct
            ).alias("recall_ok"),
        )
    )


_RECALL_ORACLE = """
        SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
               CAST(COUNT(DISTINCT vec_id) * 5 AS BIGINT) AS n_exact_pairs,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 10
"""


@register(
    "ann_lsh_topk",
    tags=("similarity", "lsh", "approximate", "recall-certificate"),
    oracle=_RECALL_ORACLE,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 for the first 10 vectors,
    registered as its RECALL CERTIFICATE against the (hash-matched green)
    brute-force baseline: the oracle-checkable claim is `recall >= 0.85
    over all queries at k=5` (the same bound the pytest pins), because
    the approximate result rows themselves have no cross-engine oracle
    by construction.  Consumers of the actual neighbour rows call
    operators/similarity.lsh_topk."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_certificate(
        brute_force_topk(emb, queries, k=5),
        lsh_topk(emb, queries, dim=64, k=5),
        recall_pct=85,
    )


@register(
    "ann_ivf_topk",
    bench=True,  # r10: the ANN family's SCALE-PATH benched representative
    # (ann_cosine_topk stays benched as the brute-force twin, but it is
    # small-scale-only by contract; the IVF path is what runs at corpus
    # scale -- r9 verdict #7)
    tags=("similarity", "ivf", "approximate", "recall-certificate"),
    oracle=_RECALL_ORACLE,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for the first 10 vectors (spherical-k-means
    inverted lists, n_probe candidate lists, exact re-rank), registered
    as its RECALL CERTIFICATE >= 0.85 against the brute-force baseline
    (see ann_lsh_topk for the pattern; consumers of neighbour rows call
    operators/similarity.ivf_topk).

    The synthetic embeddings are nearly isotropic (top-1 cosine ~0.35),
    the worst case for IVF.  The round-6 recall sweep
    (tools/ann_recall_sweep.py, curves in ROUND_NOTES.md) measured at
    sf0.1: (16 lists, 8 probes) -> 0.88, (16, 12) -> 0.98; the cert
    pins (16, 12) so the >= 0.85 floor carries a measured ~13% margin.
    Probing 12/16 lists concedes that isotropic data defeats partition
    pruning -- a genuinely clustered corpus gets >0.95 from 2-4 probes,
    and the LSH variant is the better fit for this corpus (see
    operators/similarity.ivf_topk scale notes)."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_certificate(
        brute_force_topk(emb, queries, k=5),
        ivf_topk(emb, queries, dim=64, k=5, n_lists=16, n_probe=12),
        recall_pct=85,
    )


@register(
    "ann_pq_topk",
    tags=("similarity", "pq", "approximate", "recall-certificate"),
    oracle=_RECALL_ORACLE,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (asymmetric-distance scan over m-byte
    codes + exact re-rank of the ADC top candidates), registered as its
    RECALL CERTIFICATE >= 0.85 against the brute-force baseline.  The
    round-6 sweep (tools/ann_recall_sweep.py, curves in ROUND_NOTES.md)
    measured at sf0.1: m=8/cand=256 -> 0.88, m=16/cand=256 -> 1.00; the
    cert pins m=16 so the >= 0.85 floor carries real margin on PQ's
    worst case (isotropic corpus).  PQ's 100 TB win is BANDWIDTH: the
    corpus scan reads m bytes per vector instead of 256 bytes of floats
    (16x at m=16, 32x at the m=8 operator default) -- the compression
    IVF/LSH don't give.  Consumers of neighbour rows call
    operators/similarity.pq_topk."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_certificate(
        brute_force_topk(emb, queries, k=5),
        pq_topk(emb, queries, dim=64, k=5, m=16, n_candidates=256),
        recall_pct=85,
    )


@register(
    "ann_pq_indexed",
    tags=("similarity", "pq", "approximate", "recall-certificate",
          "index-maintenance"),
    oracle=_RECALL_ORACLE,
)
def ann_pq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN in steady state: codebooks + m-byte codes live as catalog
    tables (materialize_pq_index; parameters pinned as TBLPROPERTIES),
    the ADC scan reads stored codes -- the corpus is never re-encoded --
    and new vectors enter by append under the STORED codebooks
    (append_to_pq_index; appending must not shift existing codes).  Here
    the index is built from 90% of the corpus and the remaining 10%
    appended before querying, so the registration certifies build +
    append + query together under the same recall bound as ann_pq_topk
    -- the third index family (minhash, BM25, PQ) with the same
    delta-only maintenance story."""
    from ..operators.similarity import (
        append_to_pq_index,
        materialize_pq_index,
        pq_topk_indexed,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    materialize_pq_index(
        spark, emb.filter(F.col("vec_id") % 10 != 0), "pq_index", dim=64, m=16
    )
    append_to_pq_index(spark, emb.filter(F.col("vec_id") % 10 == 0), "pq_index")
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_certificate(
        brute_force_topk(emb, queries, k=5),
        pq_topk_indexed(spark, emb, queries, "pq_index", k=5, n_candidates=256),
        recall_pct=85,
    )


@register(
    "embedding_cosine_near_dups",
    tags=("dedup", "vectors", "small-scale-only", "ground-truth-twin"),
    oracle=f"""
        WITH {_V_CTE}
        SELECT a, b, cosine_sim FROM (
            SELECT a.vec_id AS a, b.vec_id AS b,
                   {_pair_cos("a", "b")} AS cosine_sim
            FROM v a, v b
            WHERE a.vec_id < b.vec_id
        ) WHERE cosine_sim >= 0.4
    """,
)
def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs (cosine >= 0.4).

    SMALL-SCALE ONLY (tagged): the exact all-pairs O(n^2) form, kept as
    the ground-truth oracle twin; the 100 TB path is
    embedding_near_dups_lsh below, which hash-matches this output.

    The streamed side is fan_out'ed: a single-file embeddings parquet
    arrives as ONE partition, which would serialise the whole n^2
    cosine evaluation onto one task (measured at sf1.0: the 2e8-pair
    nested-loop pinned a single core for 10+ min; fanned out it rides
    every core)."""
    from ..partitioning import fan_out

    emb = load_table(spark, "embeddings", sf_dir)
    a = fan_out(emb).select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("ea"), F.col("eb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.4)
    )


def _exact_cos_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """The fan_out'ed exact all-pairs cosine twin (see
    embedding_cosine_near_dups): ground truth for the certificates and
    the policy entries below.  O(n^2) by contract -- feasible through
    sf1.0 (~3 min for 2e8 pairs on 10 threads), tagged small-scale-only
    wherever it rides."""
    from ..partitioning import fan_out

    a = fan_out(emb).select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("ea"), F.col("eb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


@register(
    "embedding_near_dups_lsh",
    tags=("dedup", "vectors", "lsh", "recall-certificate"),
    oracle=f"""
        WITH {_V_CTE}
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
               TRUE AS subset_ok, TRUE AS recall_ok
        FROM (
            SELECT {_pair_cos("a", "b")} AS cosine_sim
            FROM v a, v b
            WHERE a.vec_id < b.vec_id
              AND a.vec_id < 5000 AND b.vec_id < 5000
        ) WHERE cosine_sim >= 0.4
    """,
)
def embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-vs-corpus LSH scale path, registered as its RECALL
    CERTIFICATE: (exact pair count, emitted-pairs-are-a-subset,
    recall >= 99%), all integer-exact claims.

    Re-registered in r10: through sf0.1 the LSH pair set happened to
    EQUAL the cross-join ground truth and this entry claimed a full
    value-hash against it -- but at sf1.0 the documented per-pair miss
    probability (32 tables x 4 bits -> ~4e-3 at cos 0.4) finally had
    enough pairs to express itself: 270 of 96,548 missed, recall 99.72%.
    Exact-equality is NOT a scale-stable contract for a probabilistic
    candidate generator; the honest driver-checkable claim is the
    certificate (the fraction missed is scale-INVARIANT -- a per-pair
    expectation -- so the 99% threshold holds at every SF with 3x
    margin).  Precision is exact by construction (candidates are
    cosine-verified before emission), pinned by subset_ok.  Consumers
    of the actual pair rows call operators/similarity.lsh_near_dup_pairs;
    the keep-policy entry (semantic_dedup_survivors) consumes the exact
    twin so its output stays bit-deterministic.

    The certificate corpus is BOUNDED: the first 5,000 vectors (a no-op
    filter below sf0.25).  The per-pair miss probability is
    id-independent, so the bounded sample measures the same recall the
    full corpus would -- and the certificate's cost is capped at every
    SF.  Unbounded, the measurement degenerates on this corpus shape:
    uniform random 64-d unit vectors at cos 0.4 are LSH's worst case
    (4-bit buckets hold ~n/16 vectors, so the bucket self-join emits
    ~2n^2 candidate rows across 32 tables -- measured 25+ min at sf1.0,
    slower than the cross join it certifies against).

    Both pair sets are tracked-persisted: each feeds three consumers
    (hit join, stray join, count), and without the cache the pair
    lineage re-executes per consumer."""
    from ..caching import tracked_persist

    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < 5000
    )
    exact = tracked_persist(_exact_cos_pairs(emb).select("a", "b"))
    lsh = tracked_persist(
        lsh_near_dup_pairs(emb, dim=64, threshold=0.4).select("a", "b")
    )
    hits = lsh.join(exact, ["a", "b"])
    strays = lsh.join(exact, ["a", "b"], "left_anti")
    return (
        exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("__n_hits")))
        .crossJoin(strays.agg(F.count(F.lit(1)).alias("__n_strays")))
        .select(
            "n_exact_pairs",
            (F.col("__n_strays") == 0).alias("subset_ok"),
            (F.col("__n_hits") * 100 >= F.col("n_exact_pairs") * 99).alias(
                "recall_ok"
            ),
        )
    )


@register(
    "hybrid_search_rerank",
    tags=("search", "similarity", "rerank", "composition", "topk"),
    oracle=None,  # assigned below: composes the bm25 oracle builder
)
def hybrid_search_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the standard RAG/search shape: BM25 recalls
    the top-100 lexical candidates from the postings index, then a dense
    cosine rerank against a query embedding orders them and keeps 20.

    Both stages are individually oracle-proven (bm25_search_postings,
    ann_cosine_topk); this registration certifies the COMPOSITION --
    including that the candidate cut happens at the lexical stage, so
    the dense side scores 100 rows, not the corpus.

    Scale notes: stage 1 is the inverted-index search (shuffle ~ matched
    postings); stage 2 joins 100 ids against the embeddings table (AQE
    broadcasts the 100-row side) and the query vector is a broadcast
    single row -- the rerank is a scan-free, corpus-size-independent
    tail."""
    from ..workloads.text_analysis import _SEARCH_TERMS
    from ..operators.search import (
        bm25_search,
        build_postings,
        corpus_stats,
        term_stats,
    )

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    postings = build_postings(docs)
    top100 = bm25_search(
        postings, term_stats(postings), corpus_stats(postings), _SEARCH_TERMS, k=100
    )
    qv = emb.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("qv"))
    cand = top100.join(
        emb, top100["doc_id"] == emb["vec_id"]
    ).crossJoin(F.broadcast(qv))
    return (
        cand.select(
            "doc_id",
            "bm25",
            cosine(F.col("embedding"), F.col("qv")).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _install_hybrid_oracle() -> None:
    """The oracle composes the parameterised bm25 builder (limit=100)
    with the proven cosine formula; installed post-registration so the
    builder import cannot cycle at module-import time."""
    from ..workload import QUERIES, QuerySpec
    from .text_analysis import _SEARCH_TERMS_SQL, _bm25_postings_oracle

    spec = QUERIES["hybrid_search_rerank"]
    oracle = f"""
        WITH top100 AS (
            {_bm25_postings_oracle(_SEARCH_TERMS_SQL, limit=100)}
        ), q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 1
        ), cand AS (
            SELECT t.doc_id, t.bm25, e.embedding AS ev
            FROM top100 t JOIN embeddings e ON e.vec_id = t.doc_id
        )
        SELECT doc_id, bm25,
               {_COS_SQL.format(a="ev", b="qv")} AS cosine_sim
        FROM cand, q
        ORDER BY cosine_sim DESC, doc_id ASC
        LIMIT 20
    """
    QUERIES["hybrid_search_rerank"] = QuerySpec(
        fn=spec.fn, oracle=oracle, bench=spec.bench, tags=spec.tags
    )


_install_hybrid_oracle()


@register(
    "semantic_dedup_survivors",
    tags=("dedup", "vectors", "semantic-dedup", "graph"),
    oracle=f"""
        WITH RECURSIVE {_V_CTE}, pairs AS MATERIALIZED (
            -- MATERIALIZED: sym reads pairs twice and the recursive
            -- closure re-reads sym per iteration; inlined, the n^2
            -- cosine scan re-evaluates each time (r8 lesson -- measured
            -- 38+ CPU-min at sf1.0 before pinning vs ~20s for one scan)
            SELECT a, b FROM (
                SELECT a.vec_id AS a, b.vec_id AS b,
                       {_pair_cos("a", "b")} AS cosine_sim
                FROM v a, v b
                WHERE a.vec_id < b.vec_id
                  AND a.vec_id < 5000 AND b.vec_id < 5000
            ) WHERE cosine_sim >= 0.4
        ), sym AS MATERIALIZED (
            SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach AS (
            SELECT a AS node, b AS r FROM sym
            UNION
            SELECT reach.node, sym.b AS r FROM reach JOIN sym ON reach.r = sym.a
        ), clusters AS (
            SELECT node, LEAST(node, MIN(r)) AS component
            FROM reach GROUP BY node
        )
        SELECT e.vec_id, e.label
        FROM embeddings e
        LEFT JOIN clusters c ON c.node = e.vec_id
        WHERE e.vec_id < 5000
          AND (c.node IS NULL OR c.component = e.vec_id)
    """,
)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, arXiv:2303.09540): drop all but
    one representative (smallest vec_id) of every embedding-space
    near-duplicate component at cosine >= 0.4.

    Engine path: exact pair twin (fan_out'ed cross join -- r10: the LSH
    generator's per-pair miss probability is scale-invariant, so at
    sf1.0 even 48 tables expect ~17 missed pairs out of 96k and the
    keep policy AMPLIFIES each miss into a wrongly-kept document; a
    bit-deterministic policy entry therefore consumes the exact twin)
    -> star-contraction connected components -> keep-min survivors
    join.  The oracle recomputes survivors from the same exact closure,
    so the hash match certifies pairs, clustering, AND the keep policy
    end-to-end at every SF.  The sub-quadratic generators carry their
    own integer-exact claims: embedding_near_dups_lsh (corpus LSH
    recall certificate) and semantic_dedup_recall_certificate (the
    cluster-scoped SemDeDup candidate path).

    Scale notes: everything downstream of pair generation runs on the
    PAIR set; the survivors join is un-hinted for AQE.  At 100 TB the
    pair source swaps to lsh_near_dup_pairs under its certified recall
    bound -- the policy semantics certified here are source-agnostic.

    Bounded policy corpus (first 5,000 vectors, no-op below sf0.25),
    matching the certificates: the oracle's all-reachable recursive
    closure is quadratic in the giant component (at sf1.0 the full
    96k-edge graph ground 30+ CPU-min), while the POLICY being
    certified -- keep the min id per component, pass singletons -- is
    corpus-size-independent.  Connected components at full corpus scale
    stays certified by the jaccard-graph entries (duplicate_clusters et
    al., sf1.0-green on the 50k-doc corpus)."""
    from ..operators.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < 5000
    )
    pairs = _exact_cos_pairs(emb)
    return semantic_dedup(emb, pairs).select("vec_id", "label")


@register(
    "semantic_dedup_recall_certificate",
    tags=("dedup", "vectors", "semantic-dedup", "recall-certificate"),
    oracle=f"""
        WITH {_V_CTE}
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok
        FROM (
            SELECT {_pair_cos("a", "b")} AS cosine_sim
            FROM v a, v b
            WHERE a.vec_id < b.vec_id
              AND a.vec_id < 5000 AND b.vec_id < 5000
        ) WHERE cosine_sim >= 0.4
    """,
)
def semantic_dedup_recall_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cluster-scoped (SemDeDup-proper) candidate path's
    driver-checkable quality claim: within-cluster pairs at n_assign=4
    of n_lists=16 must recover >= 80% of the exact cosine>=0.4 pair set
    (measured 0.97-1.0 across sf0.001-0.1; this corpus's near-dup band
    sits at cosine 0.4-0.6, well below SemDeDup's usual eps, so boundary
    straddling is the worst case here).  The reference pair set is the
    exact cross-join twin (r10: previously the 48-table LSH generator,
    whose equality to the cross join breaks down at sf1.0 -- see
    embedding_near_dups_lsh); the oracle recomputes the exact pair
    count so a regression on either side flips the certificate.

    Bounded certificate corpus (first 5,000 vectors, a no-op filter
    below sf0.25): within-cluster candidate generation on uniform
    random vectors degenerates toward n^2 (n_assign=4 of n_lists=16
    puts ~n/4 vectors in each list), so the unbounded measurement
    costs more than the exact twin it grades; the recall FRACTION it
    certifies is id-independent, so the bounded sample measures the
    same number at capped cost."""
    from ..caching import tracked_persist
    from ..operators.similarity import cluster_candidate_pairs

    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < 5000
    )
    # two consumers (hit join + count): cache or the n^2 twin re-executes
    exact = tracked_persist(_exact_cos_pairs(emb).select("a", "b"))
    clustered = cluster_candidate_pairs(emb, dim=64, threshold=0.4).select("a", "b")
    hits = exact.join(clustered, ["a", "b"])
    return (
        exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("__n_hits")))
        .select(
            "n_exact_pairs",
            (F.col("__n_hits") * 100 >= F.col("n_exact_pairs") * 80).alias(
                "recall_ok"
            ),
        )
    )


@register(
    "embedding_centroids",
    tags=("vectors", "centroid", "clustering"),
    oracle="""
        SELECT label, CAST(pos AS INT) AS pos,
               CAST(n AS BIGINT) AS n,
               CAST(s AS DOUBLE) / CAST(n AS BIGINT) AS centroid
        FROM (
            SELECT label, pos, COUNT(*) AS n, CAST(SUM(vq) AS BIGINT) AS s
            FROM (
                SELECT e.label, t.pos,
                       CAST(FLOOR(CAST(e.embedding[t.pos + 1] AS DOUBLE) * 1e6)
                            AS BIGINT) AS vq
                FROM embeddings e,
                     LATERAL (SELECT unnest(range(len(e.embedding))) AS pos) t
            )
            GROUP BY label, pos
        )
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class centroids) in long form -- the
    building block of centroid classifiers, cluster summaries, and
    semantic-dedup seeding.  Components quantise to exact 1e-6 integers
    before summing so the cross-engine hash is bit-stable (double
    summation order is engine-dependent; bigint summation is not), and
    the mean is ONE deterministic double division at the end.

    Scale notes: posexplode multiplies rows by the dimension (64x here),
    but the groupBy(label, pos) partials combine map-side, so the
    shuffle carries n_labels x dim rows -- constant in corpus size.  For
    wide models prefer a Pandas-UDF vector mean (one row per label per
    partition); for 64-dim metadata embeddings the explode form stays
    all-JVM and oracle-checkable."""
    e = load_table(spark, "embeddings", sf_dir).select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    q = e.select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        F.floor(F.col("v").cast("double") * 1e6).cast("bigint").alias("vq"),
    )
    return q.groupBy("label", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("vq").cast("double") / F.count(F.lit(1)).cast("bigint")).alias(
            "centroid"
        ),
    )


@register(
    "embedding_l2_norms",
    tags=("vectors", "higher-order-functions"),
    oracle="""
        SELECT vec_id, ssq, sqrt(CAST(ssq AS DOUBLE)) * 1e-6 AS l2_norm
        FROM (
            SELECT vec_id,
                   CAST(list_sum(list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                            * CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)))
                       AS BIGINT) AS ssq
            FROM embeddings
        )
    """,
)
def embedding_l2_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via HIGHER-ORDER FUNCTIONS -- transform +
    aggregate fold entirely inside the row, no explode, no shuffle: the
    array stays one cell and the fold is a codegen'd loop.  Components
    quantise to exact 1e-6 integers first so the fold is bigint
    arithmetic (associativity-free); the only float ops are one sqrt
    (IEEE correctly-rounded, portable) and one scale-back multiply.

    Scale notes: this is the shape to prefer over posexplode whenever
    the per-row reduction needs no cross-row state -- zero exchange, and
    at 100 TB the difference between a scan-stage map and a 64x row
    amplification feeding a shuffle.  The long-form twin
    (embedding_centroids) exists precisely for the cross-row case."""
    q = lambda x: F.floor(x.cast("double") * 1e6).cast("long")  # noqa: E731
    ssq = F.aggregate(
        "embedding",
        F.lit(0).cast("long"),
        lambda acc, x: acc + q(x) * q(x),
    )
    return (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", ssq.alias("ssq"))
        .withColumn(
            "l2_norm", F.sqrt(F.col("ssq").cast("double")) * F.lit(1e-6)
        )
    )


@register(
    "knn_label_classification",
    tags=("similarity", "knn", "classification", "vectors"),
    oracle=f"""
        WITH topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_COS_SQL.format(a="q.embedding", b="c.embedding")} DESC,
                                    c.vec_id ASC
                       ) AS rn
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
            ) WHERE rn <= 5
        ),
        votes AS (
            SELECT t.query_id, e.label AS predicted_label,
                   count(*) AS votes,
                   ROW_NUMBER() OVER (
                       PARTITION BY t.query_id
                       ORDER BY count(*) DESC, e.label ASC
                   ) AS vr
            FROM topk t JOIN embeddings e ON t.neighbor_id = e.vec_id
            GROUP BY t.query_id, e.label
        )
        SELECT v.query_id AS query_id, v.predicted_label,
               CAST(v.votes AS BIGINT) AS votes,
               q.label AS true_label,
               v.predicted_label = q.label AS correct
        FROM votes v JOIN embeddings q ON v.query_id = q.vec_id
        WHERE v.vr = 1
    """,
)
def knn_label_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote label prediction for the 10 probe vectors,
    with correctness against each probe's own label -- the k-NN
    classification / auto-labeling application of the similarity stack.

    Scale notes: linear in the corpus for a bounded probe set
    (broadcast probes, one scan); the vote/argmax runs on k*|probes|
    rows.  Corpus-scale labeling swaps in lsh_topk/ivf_topk, which
    share the (query_id, neighbor_id) contract (see
    operators/similarity.py:knn_label_vote)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return knn_label_vote(emb, emb.filter(F.col("vec_id") < 10), k=5)
