"""Dedup workload: exact all-pairs jaccard, minhash+LSH, simhash.

The minhash+LSH query shares its oracle with the exact query: LSH
parameters are tuned so verified candidates equal the exact >=0.9 pair set
(see operators.dedup docstring for the recall math)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    near_dup_pairs_exact,
    near_dup_pairs_minhash,
    near_dup_pairs_minhash_incremental,
    simhash_near_dup_pairs,
)
from ..sources.tables import load_table
from ..workload import register

# BLOCKED exact-jaccard oracle (r9 verdict #3: the old `s x, s y` all-pairs
# form died at sf1.0, forcing 12 registry entries onto the exclusion list).
# Anchor-prune with a completeness PROOF, so the result set is bit-identical
# to the all-pairs scan at every scale:
#   For any fixed total order on shingles (plain string order here), let
#   m = min(A @ B) for a pair with jaccard(A,B) >= 0.9.  The elements of A
#   preceding m all lie in A\B, and |A\B| <= |AuB| - |AnB| <= 0.1|AuB|
#   <= |A|/9 (since |A| >= |AnB| >= 0.9|AuB|).  So m is among the
#   floor(|A|/9)+1 smallest shingles of A -- and symmetrically of B.
#   Hence every qualifying pair SHARES AN ANCHOR (one of its first
#   floor(n/9)+1 shingles), and joining anchor sets loses nothing.
# Candidates then pay the ORIGINAL intersect/union/filter expressions, so
# the emitted jaccard_sim doubles are the same divisions of the same
# integers as before.  Cost: anchor sets are ~n/9 of the inverted index,
# so the candidate join is ~1% of the full shingle-join blowup and nothing
# is ever corpus x corpus.  The final FROM keeps aliases x/y so callers'
# appended predicates (x.doc_id % 10 = 0 ...) still bind.
_PAIRS_JACCARD_ORACLE = """
    WITH s AS MATERIALIZED (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks)-1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    ),
    dict AS MATERIALIZED (
        -- dense integer ids for shingles: the verify intersects INT
        -- lists instead of string lists (~10x, measured -- 57s vs an
        -- unfinished 300s+ at sf1.0); jaccard depends only on counts,
        -- so the bijection changes nothing
        SELECT g, ROW_NUMBER() OVER (ORDER BY g) AS gid
        FROM (SELECT DISTINCT unnest(sh) AS g FROM s)
    ),
    sid AS MATERIALIZED (
        SELECT i.doc_id, list_sort(list(d.gid)) AS ids, COUNT(*) AS n
        FROM (SELECT doc_id, unnest(sh) AS g FROM s) i
        JOIN dict d USING (g)
        GROUP BY i.doc_id
    ),
    anch AS MATERIALIZED (
        -- the first floor(n/9)+1 ids in dictionary order: the anchor set
        SELECT doc_id, n, unnest(ids[1 : n // 9 + 1]) AS gid FROM sid
    ),
    cand AS MATERIALIZED (
        -- second complete prune: jaccard >= 0.9 forces
        -- 10*min(|A|,|B|) >= 9*max (|A| >= |AnB| >= 0.9|AuB| >= 0.9|B|),
        -- an exact integer compare
        SELECT DISTINCT ax.doc_id AS da, ay.doc_id AS db
        FROM anch ax JOIN anch ay
          ON ax.gid = ay.gid AND ax.doc_id < ay.doc_id
         AND 10 * LEAST(ax.n, ay.n) >= 9 * GREATEST(ax.n, ay.n)
    ),
    inter AS (
        SELECT sx.doc_id AS a, sy.doc_id AS b, sx.n AS nx, sy.n AS ny,
               len(list_intersect(sx.ids, sy.ids)) AS c
        FROM cand cd
        JOIN sid sx ON sx.doc_id = cd.da
        JOIN sid sy ON sy.doc_id = cd.db
    ),
    scored AS MATERIALIZED (
        -- same integers as len(list_intersect)/len(list_distinct(
        -- list_concat)) on the string lists, so the same IEEE division
        SELECT a, b, CAST(c AS DOUBLE) / (nx + ny - c) AS jaccard_sim
        FROM inter
    )
    SELECT t.a, t.b, t.jaccard_sim
    FROM scored t
    JOIN (SELECT DISTINCT doc_id FROM s) x ON x.doc_id = t.a
    JOIN (SELECT DISTINCT doc_id FROM s) y ON y.doc_id = t.b
    WHERE t.jaccard_sim >= 0.9
"""


@register(
    "near_dup_pairs_exact",
    tags=("dedup", "jaccard", "small-scale-only", "ground-truth-twin"),
    oracle=_PAIRS_JACCARD_ORACLE,
)
def near_dup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth 3-word-shingle jaccard pairs at >=0.9 via the
    inverted-index join, run here WITHOUT a shingle-frequency cap so its
    output is the exact oracle twin.  SMALL-SCALE ONLY in this form: a
    boilerplate shingle in f docs puts f^2 candidate pairs on one shuffle
    key.  The 100 TB paths are near_dup_pairs_minhash (sub-quadratic) or
    the same operator with max_shingle_freq set (bounded hot keys)."""
    return near_dup_pairs_exact(load_table(spark, "documents", sf_dir))


@register(
    "near_dup_pairs_minhash",
    bench=True,
    tags=("dedup", "minhash", "lsh"),
    oracle=_PAIRS_JACCARD_ORACLE,
)
def near_dup_minhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline; same verified output as the exact
    operator, found without the all-pairs scan.

    Scale notes: cost is O(n) signatures + bucket joins; this is the
    operator that survives a 100x corpus, where near_dup_pairs_exact's
    cross join cannot."""
    return near_dup_pairs_minhash(load_table(spark, "documents", sf_dir))


@register(
    "near_dup_pairs_incremental",
    bench=True,
    tags=("dedup", "minhash", "lsh", "incremental"),
    oracle=_PAIRS_JACCARD_ORACLE
    + """
      AND (x.doc_id % 10 = 0 OR y.doc_id % 10 = 0)
    """,
)
def near_dup_incremental_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-delta dedup: docs with doc_id % 10 == 0 play the incoming
    batch, the rest the standing corpus.  Output = every >=0.9 pair
    TOUCHING the delta (delta-vs-corpus + delta-vs-delta); the oracle is
    the exact-jaccard pair set restricted to pairs with a delta side --
    corpus-internal pairs must NOT appear, which is the point: admitting
    a 1% delta does not re-pay the corpus self-join."""
    d = load_table(spark, "documents", sf_dir)
    return near_dup_pairs_minhash_incremental(
        corpus=d.filter(F.col("doc_id") % 10 != 0),
        delta=d.filter(F.col("doc_id") % 10 == 0),
    )


@register(
    "near_dup_pairs_indexed",
    tags=("dedup", "minhash", "lsh", "incremental", "bucketing"),
    oracle=_PAIRS_JACCARD_ORACLE
    + """
      AND (x.doc_id % 10 = 0 OR y.doc_id % 10 = 0)
    """,
)
def near_dup_indexed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The steady-state form of near_dup_pairs_incremental: the corpus
    shingles + band buckets are MATERIALISED catalog tables (buckets
    bucketed by the band keys), so admitting the delta shingles/signs
    only the delta and joins against the stored layout.  Same delta
    split, same oracle, bit-identical output to the in-flight form."""
    from ..operators.dedup import (
        materialize_minhash_index,
        near_dup_pairs_against_index,
    )

    d = load_table(spark, "documents", sf_dir)
    materialize_minhash_index(
        spark, d.filter(F.col("doc_id") % 10 != 0), "minhash_index", n_buckets=8
    )
    return near_dup_pairs_against_index(
        spark, d.filter(F.col("doc_id") % 10 == 0), "minhash_index"
    )


@register(
    "benchmark_contamination",
    bench=True,
    tags=("decontamination", "training-data", "ngram"),
    oracle="""
        WITH s AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(toks)-3),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            || ' ' || toks[i+3] || ' ' || toks[i+4])) AS sh
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents)
        ), bench AS (
            SELECT DISTINCT unnest(sh) AS shingle FROM s WHERE doc_id % 7 = 0
        ), corpus AS (
            SELECT doc_id, unnest(sh) AS shingle FROM s WHERE doc_id % 7 <> 0
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM corpus JOIN bench USING (shingle)
        GROUP BY doc_id
    """,
)
def benchmark_contamination_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage check: docs with doc_id % 7 == 0 play the
    benchmark, the rest the training corpus; a corpus doc is flagged
    with the count of distinct 5-gram shingles it shares with ANY
    benchmark doc (operators/contamination.py).  Exact string collision,
    no hashing -- a flag is a proof of verbatim overlap."""
    from ..operators.contamination import contamination_hits

    d = load_table(spark, "documents", sf_dir)
    return contamination_hits(
        docs=d.filter(F.col("doc_id") % 7 != 0),
        benchmark=d.filter(F.col("doc_id") % 7 == 0),
        n=5,
    )


# Brute-force recomputation of the 60-bit md5 simhash + hamming<=3 pair
# set.  Signature: token hash = first 15 hex chars of md5(token) parsed as
# an integer; bit b of the signature is 1 iff the +/-1 sum over token
# instances of bit b is > 0.  Pure portable SQL -- the same math the Spark
# side evaluates as codegen'd expressions (operators/dedup.py::
# simhash_signatures_hex), so the driver hashes the actual pair VALUES,
# not just row counts.  The banding join needs no oracle twin: pigeonhole
# makes it exactly equivalent to this all-pairs popcount filter.
_SIMHASH_HEX_ORACLE = """
    WITH tv AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT AS v
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
    ),
    bitsum AS (
        SELECT doc_id, bits.b AS b,
               SUM(((v >> bits.b) & 1) * 2 - 1) AS s
        FROM tv, (SELECT unnest(range(60)) AS b) bits
        GROUP BY doc_id, bits.b
    ),
    sig AS (
        SELECT doc_id,
               SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                        ELSE 0 END) AS sig
        FROM bitsum GROUP BY doc_id
    )
    SELECT x.doc_id AS a, y.doc_id AS b,
           bit_count(xor(x.sig, y.sig)) AS hamming
    FROM sig x JOIN sig y ON x.doc_id < y.doc_id
    WHERE bit_count(xor(x.sig, y.sig)) <= 3
"""


@register(
    "simhash_near_dups",
    bench=True,
    tags=("dedup", "simhash"),
    oracle=_SIMHASH_HEX_ORACLE,
)
def simhash_near_dups_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-distance dedup (<=3 bits over 60), fully
    oracle-checkable: signatures are the all-JVM md5-based
    simhash_signatures_hex (portable SQL math the DuckDB oracle
    recomputes bit-for-bit), pair extraction is the hamming-banded
    equi-join (pigeonhole-exact vs the oracle's brute-force popcount).
    The blake2b signature variant remains pytest-pinned against a
    pure-Python reference and driver-exercised through
    simhash_recall_certificate below."""
    from ..operators.dedup import simhash_near_dup_pairs_hex

    return simhash_near_dup_pairs_hex(load_table(spark, "documents", sf_dir))


@register(
    "simhash_recall_certificate",
    tags=("dedup", "simhash", "recall-certificate"),
    oracle="WITH exact_pairs AS ("
    + _PAIRS_JACCARD_ORACLE
    + """
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS recall_ok
    FROM exact_pairs
    """,
)
def simhash_recall_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash's driver-checkable quality claim: hamming<=3 pairs must
    recover >= 60% of the exact jaccard>=0.9 pair set (measured
    0.72-0.74 across sf0.001-0.1 -- simhash measures a different, angular
    similarity, so full agreement is not expected and precision is not
    claimed).  Integer cross-multiplied compare; the oracle recomputes
    the exact pair count, so BOTH a simhash regression and an exact-pairs
    regression flip the certificate."""
    docs = load_table(spark, "documents", sf_dir)
    exact = near_dup_pairs_exact(docs).select("a", "b")
    sim = simhash_near_dup_pairs(docs).select("a", "b")
    hits = exact.join(sim, ["a", "b"])
    return (
        exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("__n_hits")))
        .select(
            "n_exact_pairs",
            (F.col("__n_hits") * 100 >= F.col("n_exact_pairs") * 60).alias(
                "recall_ok"
            ),
        )
    )


@register(
    "duplicate_clusters",
    tags=("dedup", "graph", "connected-components"),
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT a, b FROM (""" + _PAIRS_JACCARD_ORACLE + """) t
        ),
        sym AS (
            SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ),
        reach AS (
            SELECT a AS node, b AS r FROM sym
            UNION
            SELECT reach.node, sym.b AS r
            FROM reach JOIN sym ON reach.r = sym.a
        )
        SELECT node AS doc_id,
               CAST(LEAST(node, MIN(r)) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """,
)
def duplicate_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate CLUSTERS from near-dup pairs: the pair list
    (minhash emits A~B, B~C) collapses to components (A,B,C share one
    cluster_id = smallest doc_id) -- the unit dedup policy actually acts
    on ("keep one doc per cluster").

    Engine path: LSH-verified minhash pairs -> star-contraction connected
    components (operators/graph.py, O(log n) rounds).  The oracle walks
    the same >=0.9 exact-jaccard pair set with a recursive closure, so
    the hash match certifies pairs AND clustering.

    Scale notes: pair generation is the banded LSH join (no all-pairs);
    clustering is O(log n) two-shuffle rounds on the pair set, which is
    orders of magnitude smaller than the corpus."""
    from ..operators.graph import connected_components

    pairs = near_dup_pairs_minhash(load_table(spark, "documents", sf_dir))
    return connected_components(pairs, src="a", dst="b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@register(
    "duplicate_cluster_sizes",
    tags=("dedup", "graph", "guard"),
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT a, b FROM (""" + _PAIRS_JACCARD_ORACLE + """) t
        ),
        sym AS (
            SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ),
        reach AS (
            SELECT a AS node, b AS r FROM sym
            UNION
            SELECT reach.node, sym.b AS r
            FROM reach JOIN sym ON reach.r = sym.a
        ),
        clusters AS (
            SELECT node, CAST(LEAST(node, MIN(r)) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node
        )
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS cluster_size,
               COUNT(*) > 2 AS oversize
        FROM clusters GROUP BY cluster_id
    """,
)
def duplicate_cluster_sizes_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The giant-cluster guard over the real near-dup graph: per-cluster
    size plus the oversize flag (cap=2 here so the synthetic corpus
    exercises both flag values; production caps sit at ~100x the
    plausible duplication factor).

    A cluster past the cap nearly always means a degenerate feature
    (boilerplate shingle) chained unrelated docs -- the keep-one policy
    must quarantine it, not collapse it (see
    operators/graph.py::flag_oversize_components)."""
    from ..operators.graph import component_sizes, connected_components

    pairs = near_dup_pairs_minhash(load_table(spark, "documents", sf_dir))
    members = connected_components(pairs, src="a", dst="b")
    return component_sizes(members).select(
        F.col("component").alias("cluster_id"),
        F.col("size").cast("bigint").alias("cluster_size"),
        (F.col("size") > F.lit(2)).alias("oversize"),
    )


@register(
    "duplicate_graph_triangles",
    tags=("dedup", "graph", "triangles", "join"),
    oracle=f"""
        WITH pairs AS ({_PAIRS_JACCARD_ORACLE})
        SELECT e1.a, e1.b, e2.b AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.a = e1.b
        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def duplicate_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles (a<b<c mutually near-duplicate) in the duplicate graph
    -- the density probe that distinguishes a tight duplicate CLIQUE
    (template spam: everything similar to everything) from a CHAIN of
    pairwise-similar drift, which connected components alone cannot
    (both are one component).  Edges come from the sub-quadratic
    minhash path; edge orientation (a<b) makes each triangle appear
    exactly once via the a<b<c join pattern.

    Scale notes: both joins run on the PAIR set, orders of magnitude
    below corpus size -- one shuffle on the shared endpoint, one on
    (a, c); the corpus itself is touched only by the minhash pass.
    Degenerate hot vertices (a doc similar to millions) are the same
    boilerplate pathology the minhash frequency cap and the CC
    giant-cluster guard already bound."""
    pairs = near_dup_pairs_minhash(load_table(spark, "documents", sf_dir)).select(
        "a", "b"
    )
    e1 = pairs
    e2 = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = pairs.select(F.col("a"), F.col("b").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def _quality_sql() -> str:
    from .text_analysis import _STOP_SQL

    return f"""
        SELECT doc_id,
               (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
                 + LEAST(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.3
                 + (1.0 - CAST(len(list_filter(toks,
                       t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
                       / len(toks)) * 0.2 AS quality
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM documents)
    """


@register(
    "dedup_keep_best_quality",
    tags=("dedup", "graph", "keep-policy", "quality", "training-data"),
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT a, b FROM (""" + _PAIRS_JACCARD_ORACLE + """) t
        ),
        sym AS (
            SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ),
        reach AS (
            SELECT a AS node, b AS r FROM sym
            UNION
            SELECT reach.node, sym.b AS r
            FROM reach JOIN sym ON reach.r = sym.a
        ),
        clusters AS (
            SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster_id
            FROM reach GROUP BY node
        ),
        q AS (""" + _quality_sql() + """),
        ranked AS (
            SELECT c.cluster_id, c.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY q.quality DESC, c.doc_id ASC
                   ) AS rk
            FROM clusters c JOIN q ON q.doc_id = c.doc_id
        )
        SELECT q.doc_id, q.quality
        FROM q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEEP-BEST dedup policy: within each transitive duplicate cluster,
    keep the HIGHEST-QUALITY member (not the min-id, not drop-all) --
    what production curation actually wants when duplicates differ in
    cleanliness.  Singletons pass through untouched; the survivor set
    carries its quality score for downstream thresholding.

    Engine path: minhash pairs -> connected components -> per-cluster
    argmax by (quality desc, doc_id) -> anti-join the losers.  The
    oracle replays pairs, recursive closure, the same quality formula,
    and the same argmax, so the hash certifies the WHOLE keep decision
    (the quality doubles are bit-identical per text_stats).

    Scale notes: clustering and ranking run on the cluster-member set
    (corpus-sized only when everything is duplicated); the final
    anti-join is survivors-vs-losers with AQE free to broadcast the
    loser side, which scales with the duplicated fraction."""
    from pyspark.sql import Window

    from ..functions import text as T
    from ..operators.graph import connected_components

    docs = load_table(spark, "documents", sf_dir)
    q = docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))
    pairs = near_dup_pairs_minhash(docs)
    clusters = connected_components(pairs, src="a", dst="b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    ranked = clusters.join(q, "doc_id").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("quality").desc(), F.col("doc_id").asc()
            )
        ),
    )
    losers = ranked.filter(F.col("rk") > 1).select("doc_id")
    return q.join(losers, "doc_id", "left_anti").select("doc_id", "quality")


@register(
    "near_dup_pairs_edit_distance",
    tags=("dedup", "edit-distance", "simhash"),
    oracle="""
        WITH cand AS (""" + _SIMHASH_HEX_ORACLE + """
        )
        SELECT c.a, c.b,
               CAST(levenshtein(substr(da.text, 1, 120),
                                substr(db.text, 1, 120)) AS BIGINT)
                   AS edit_distance
        FROM cand c
        JOIN documents da ON da.doc_id = c.a
        JOIN documents db ON db.doc_id = c.b
        WHERE levenshtein(substr(da.text, 1, 120),
                          substr(db.text, 1, 120)) <= 30
    """,
)
def near_dup_pairs_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage near-dup with an EDIT-DISTANCE verifier: candidates from
    the oracle-exact hamming-banded md5 simhash (never all-pairs), then
    each candidate pair verified by levenshtein on a 120-char prefix --
    the character-level confirmation step set-similarity methods lack
    (token reorderings that fool jaccard fail the edit check).  Both
    engines implement classic Levenshtein over characters, so the
    distances -- and the kept pair set -- hash-match exactly.

    Scale notes: the quadratic-cost levenshtein runs ONLY on the
    banding's candidate pairs (|pairs| << n^2), on bounded prefixes, as
    a JVM scan-stage expression after two id-equi-joins that AQE
    broadcasts when the pair set is small."""
    from ..operators.dedup import simhash_near_dup_pairs_hex

    docs = load_table(spark, "documents", sf_dir)
    cand = simhash_near_dup_pairs_hex(docs).select("a", "b")
    texts = docs.select("doc_id", F.substring("text", 1, 120).alias("prefix"))
    dist = F.levenshtein(F.col("pa"), F.col("pb"))
    return (
        cand.join(
            texts.select(F.col("doc_id").alias("a"), F.col("prefix").alias("pa")),
            "a",
        )
        .join(
            texts.select(F.col("doc_id").alias("b"), F.col("prefix").alias("pb")),
            "b",
        )
        .select("a", "b", dist.cast("bigint").alias("edit_distance"))
        .filter(F.col("edit_distance") <= 30)
    )


@register(
    "leakage_safe_split",
    tags=("dedup", "graph", "split", "training-data"),
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT a, b FROM (""" + _PAIRS_JACCARD_ORACLE + """) t
        ),
        sym AS (
            SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ),
        reach AS (
            SELECT a AS node, b AS r FROM sym
            UNION
            SELECT reach.node, sym.b AS r
            FROM reach JOIN sym ON reach.r = sym.a
        ),
        comp AS (
            SELECT node AS doc_id,
                   CAST(LEAST(node, MIN(r)) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node
        ),
        all_docs AS (
            SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        )
        SELECT doc_id, cluster_id,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, cluster_id,
                   ('0x' || substr(md5('split' || CAST(cluster_id AS VARCHAR)),
                                   1, 8))::BIGINT % 100 AS bucket
            FROM all_docs
        )
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across
    splits: the split decision hashes the duplicate CLUSTER id, not the
    document id, so A and its near-copy B (same connected component)
    always land in the same split -- the eval-contamination failure mode
    of naive per-doc splits.  Singleton docs are their own cluster.
    80/10/10 by md5 bucket; the whole assignment (pairs, closure,
    bucket arithmetic) is engine-recomputable and hash-checked.

    Scale notes: pair generation is the banded LSH join; components are
    O(log n) rounds on the pair set; the split itself is a scan-stage
    hash -- and the left join against the (small) component map is the
    only touch the full corpus pays beyond dedup it already ran."""
    from ..operators.graph import connected_components

    docs = load_table(spark, "documents", sf_dir)
    pairs = near_dup_pairs_minhash(docs)
    comp = connected_components(pairs, src="a", dst="b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    assigned = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split"), F.col("cluster_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return assigned.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@register(
    "duplicate_source_matrix",
    tags=("dedup", "provenance", "analytics"),
    oracle="""
        WITH pairs AS (
            SELECT a, b FROM (""" + _PAIRS_JACCARD_ORACLE + """) t
        )
        SELECT LEAST(da.source, db.source) AS source_x,
               GREATEST(da.source, db.source) AS source_y,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs p
        JOIN documents da ON da.doc_id = p.a
        JOIN documents db ON db.doc_id = p.b
        GROUP BY 1, 2
    """,
)
def duplicate_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE duplication comes from: the near-dup pair set joined to each
    side's source, rolled up to an unordered source-pair matrix -- the
    provenance view that tells a curation team whether duplication is
    internal to a crawl (diagonal) or cross-source mirroring
    (off-diagonal), and which ingest to deprioritise.

    Scale notes: two id-equi-joins of the (small) pair set against the
    corpus (AQE broadcasts the pair side), then a tiny aggregate --
    nothing quadratic beyond what dedup already produced."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = near_dup_pairs_minhash(docs).select("a", "b")
    src = docs.select("doc_id", "source")
    joined = pairs.join(
        src.select(F.col("doc_id").alias("a"), F.col("source").alias("sa")), "a"
    ).join(
        src.select(F.col("doc_id").alias("b"), F.col("source").alias("sb")), "b"
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("source_x"),
            F.greatest("sa", "sb").alias("source_y"),
        )
        .groupBy("source_x", "source_y")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
