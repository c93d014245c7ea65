"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force top-k -- exact; broadcast the query set, fold-based dot
    products JVM-side, per-query top-k via window.  Linear scan of the
    corpus: right when the query set is small and the corpus is the big
    side (the 100 TB shape).
  * LSH (random hyperplane / signed random projection) -- each vector maps
    to a B-bit signature; same-bucket join gives candidates, exact cosine
    re-ranks.  Sub-linear candidate generation for corpus-vs-corpus jobs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

from ..functions.vectors import cosine
from ..partitioning import fan_out

_SEED = 0xA11CE


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours per query vector.

    Output: (query_id, neighbor_id, cosine_sim), k rows per query.
    Self-matches (same id) are excluded.

    Scale notes: `queries` is broadcast, so the corpus scan is
    shuffle-free; the window's partition key is query_id (small
    cardinality * k rows survive the rank filter).  Ties break on
    neighbor_id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # the broadcast cross join amplifies each corpus row by |queries|
    # before any exchange: guard against the one-file-one-partition trap
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def random_hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "lsh_sigs",
    seed: int = _SEED,
) -> DataFrame:
    """Signed-random-projection signatures for ALL hash tables in one
    vectorised pass: one (n, n_tables*n_bits) matmul per Arrow batch,
    packed into an array<bigint> of length n_tables.  Bit i of table t =
    sign(v . h_{t,i}); cosine-similar vectors collide in a table with
    probability (1 - theta/pi)^n_bits."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables * n_bits, dim))
    weights = np.tile(
        (1 << np.arange(n_bits, dtype=np.uint64)), n_tables
    ).reshape(n_tables, n_bits)

    @pandas_udf(ArrayType(LongType()))
    def _sigs(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        bits = (mat @ planes.T) > 0  # (n, n_tables*n_bits)
        per_table = bits.reshape(len(mat), n_tables, n_bits).astype(np.uint64)
        packed = (per_table * weights[None, :, :]).sum(axis=2).astype(np.int64)
        return pd.Series(list(packed))

    # the signature matmul is CPU-bound per row: spread the input over
    # every core even when it arrived as one parquet split (no-op on
    # already-parallel scans)
    return fan_out(df).withColumn(out_col, _sigs(F.col(vec_col)))


def lsh_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_bits: int = 4,
    n_tables: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-vs-corpus embedding near-duplicates without the cross
    join: one signature pass, self-join on (table, signature) buckets,
    exact cosine verification of the candidate pairs.

    The embedding analogue of near_dup_pairs_minhash: candidates ~
    bucket occupancy (sub-quadratic), verification exact, so output
    equals the cross-join form up to LSH recall -- P[miss] per pair =
    (1 - (1-theta/pi)^n_bits)^n_tables; at cosine 0.4 the defaults give
    ~0.996 recall, at 0.8 effectively 1.

    Scale notes: the self-join shuffles (table, sig, id) rows -- 32x12 B
    per vector, independent of dim; hot buckets (dense clusters) are the
    cost driver, so raise n_bits for clustered corpora.  Vectors are
    joined back only for surviving candidate pairs."""
    sigs = random_hyperplane_signatures(
        corpus, dim, n_bits, n_tables, id_col, vec_col
    ).select(F.col(id_col).alias("a"), F.posexplode("lsh_sigs").alias("t", "sig"))
    cand = (
        sigs.join(
            sigs.select(F.col("a").alias("b"), "t", "sig"), ["t", "sig"]
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_lists: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = _SEED,
) -> np.ndarray:
    """Spherical k-means centroids from a bounded corpus sample.

    The sample (not the corpus) comes to the driver -- training a
    kilobyte-scale model on a capped sample then broadcasting it is the
    standard small-model pattern; the corpus itself is never collected.

    Deterministic end-to-end: the sample is the sample_size rows with the
    SMALLEST md5(id) -- a pure function of row identity, identical across
    runs, partition counts, and file layouts (a bare limit() would take
    whichever partitions answered first).  Spark plans the orderBy+limit
    as TakeOrderedAndProject: each task keeps a size-bounded heap, no
    global sort materialises.  k-means itself uses a fixed seed and a
    fixed iteration count."""
    h = F.md5(F.concat(F.lit("ivf"), F.col(id_col).cast("string")).cast("binary"))
    rows = (
        corpus.select(F.col(vec_col), h.alias("__h"), F.col(id_col))
        .orderBy("__h", id_col)
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    return centroids


def _nearest_lists_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: the n_probe nearest centroid ids per vector (by cosine,
    vectors need not be pre-normalised -- argmax is norm-invariant)."""
    cents = centroids  # closure-captured ndarray (picklable)

    @pandas_udf(ArrayType(LongType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        sims = mat @ cents.T  # (n, n_lists)
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int64)
        return pd.Series(list(top))

    return _probe


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed into n_lists
    inverted lists by nearest centroid; each query probes its n_probe
    nearest lists and exact-cosine re-ranks only those candidates.

    Scale notes: the centroid model is trained once on a bounded sample
    and broadcast inside UDF closures; the corpus pass is one Arrow
    crossing for list assignment, then an equi-join on list id (AQE
    handles hot lists).  Expected candidate fraction ~= n_probe/n_lists
    of the corpus -- tune both to the recall/cost target; IVF beats
    hyperplane LSH when the corpus is cluster-structured (lists match
    real clusters), LSH when it is isotropic."""
    centroids = train_ivf_centroids(corpus, dim, n_lists, vec_col=vec_col, id_col=id_col)
    assign = _nearest_lists_udf(centroids, 1)
    probe = _nearest_lists_udf(centroids, n_probe)
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(assign(F.col(vec_col)), 1).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = _SEED,
) -> np.ndarray:
    """Product-quantization codebooks, shape (m, n_codes, dim/m): the
    vector space splits into m subspaces; each gets an independent
    k-means codebook over L2-normalised sample vectors.  Same bounded
    deterministic driver-sample pattern as train_ivf_centroids (smallest
    md5(id) rows; the corpus is never collected)."""
    assert dim % m == 0, "dim must divide evenly into m subspaces"
    sub = dim // m
    h = F.md5(F.concat(F.lit("pq"), F.col(id_col).cast("string")).cast("binary"))
    rows = (
        corpus.select(F.col(vec_col), h.alias("__h"), F.col(id_col))
        .orderBy("__h", id_col)
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        part = mat[:, j * sub : (j + 1) * sub]
        centers = part[rng.choice(len(part), size=n_codes, replace=False)]
        for _ in range(iters):
            d2 = ((part[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = part[assign == c]
                if len(members):
                    centers[c] = members.mean(axis=0)
        books[j] = centers
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Assign each (L2-normalised) vector its m nearest-codeword ids --
    the compressed representation ANN scans instead of raw vectors.  At
    dim=64/m=8 the code is 8 small ints vs 256 bytes of floats: the 100
    TB win is bandwidth, the scan reads ~1/30 the bytes."""
    books = codebooks
    m, n_codes, sub = books.shape

    @pandas_udf(ArrayType(LongType()))
    def _encode(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(mat), m), dtype=np.int64)
        for j in range(m):
            part = mat[:, j * sub : (j + 1) * sub]
            d2 = ((part[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    # CPU-bound per-row encode: spread the un-encoded vectors first
    return fan_out(df).withColumn(out_col, _encode(F.col(vec_col)))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    n_candidates: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k with asymmetric distance computation (ADC)
    and exact re-rank: corpus vectors are scanned as m-byte codes; each
    query precomputes an (m x n_codes) inner-product lookup table, so an
    approximate cosine is m table lookups instead of dim multiplies; the
    top n_candidates per query by ADC are re-ranked with true cosines.

    Scale notes: the codebooks train on a bounded driver sample and ride
    UDF closures; the corpus pass reads codes (1/30th the bytes of raw
    vectors at dim=64/m=8 -- at 100 TB of embeddings the scan IS the
    cost, so PQ's bandwidth compression is the win IVF/LSH don't give).
    `queries` is collected to the driver to build the LUTs -- the small
    side by contract, same as the broadcast in brute_force_topk.
    Candidate generation never shuffles the corpus: ADC scores + per-query
    top-n_candidates via window on (qidx), then only ~n_queries *
    n_candidates rows join back for exact re-rank."""
    books = train_pq_codebooks(
        corpus, dim, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col
    )
    sub = dim // m
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    # luts[j]: (n_codes, n_q) -- dot of each codeword with each query's
    # j-th subvector; ADC score = sum_j luts[j][code_j]
    luts = [
        books[j] @ q_mat[:, j * sub : (j + 1) * sub].T for j in range(m)
    ]
    n_q = len(q_ids)

    @pandas_udf(ArrayType(DoubleType()))
    def _adc(codes: pd.Series) -> pd.Series:
        C = np.array(codes.tolist(), dtype=np.int64)
        s = np.zeros((len(C), n_q))
        for j in range(m):
            s += luts[j][C[:, j]]
        return pd.Series(list(s))

    encoded = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    scored = encoded.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(_adc(F.col("pq_code"))).alias("qidx", "adc"),
    )
    w_adc = Window.partitionBy("qidx").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    qmap = corpus.sparkSession.createDataFrame(
        list(enumerate(q_ids)), f"qidx int, query_id {queries.schema[id_col].dataType.simpleString()}"
    )
    cand = (
        scored.withColumn("__r", F.row_number().over(w_adc))
        .filter(F.col("__r") <= n_candidates)
        .join(F.broadcast(qmap), "qidx")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    exact = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def materialize_pq_index(
    spark,
    corpus: DataFrame,
    prefix: str,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the PQ index as catalog tables: `{prefix}_codes`
    (vec_id, pq_code -- the m-byte scan side) and `{prefix}_codebooks`
    (subspace, code, centroid array -- kilobytes), with (dim, m,
    n_codes) pinned as table properties so the query/append paths can
    never mix parameters (the minhash-index lesson).  The corpus-sized
    encode pass is paid once; daily growth appends codes only."""
    books = train_pq_codebooks(
        corpus, dim, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col
    )
    from ..sinks.bucketing import _clear_orphan_location

    rows = [
        (j, c, [float(v) for v in books[j, c]])
        for j in range(m)
        for c in range(n_codes)
    ]
    _clear_orphan_location(spark, f"{prefix}_codebooks")
    spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).write.mode("overwrite").saveAsTable(f"{prefix}_codebooks")
    _clear_orphan_location(spark, f"{prefix}_codes")
    pq_encode(corpus, books, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col), "pq_code"
    ).write.mode("overwrite").saveAsTable(f"{prefix}_codes")
    spark.sql(
        f"ALTER TABLE {prefix}_codes SET TBLPROPERTIES ("
        f"'pq.dim'='{dim}', 'pq.m'='{m}', 'pq.n_codes'='{n_codes}')"
    )


def _pq_index_params(spark, prefix: str) -> tuple[int, int, int]:
    try:
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {prefix}_codes").collect()
        }
        return int(props["pq.dim"]), int(props["pq.m"]), int(props["pq.n_codes"])
    except Exception as exc:
        raise ValueError(
            f"cannot read PQ parameters for {prefix}_codes; rebuild with"
            " materialize_pq_index"
        ) from exc


def _load_codebooks(spark, prefix: str, m: int, n_codes: int, sub: int) -> np.ndarray:
    books = np.empty((m, n_codes, sub))
    for r in spark.table(f"{prefix}_codebooks").collect():
        books[r["subspace"], r["code"]] = r["centroid"]
    return books


def append_to_pq_index(
    spark,
    new_vectors: DataFrame,
    prefix: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Admit new vectors: encode with the STORED codebooks (no
    retraining -- codebooks are a model, appends must not shift existing
    codes) and append the code rows.  Cost scales with the delta."""
    dim, m, n_codes = _pq_index_params(spark, prefix)
    books = _load_codebooks(spark, prefix, m, n_codes, dim // m)
    pq_encode(new_vectors, books, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col), "pq_code"
    ).write.mode("append").saveAsTable(f"{prefix}_codes")


def pq_topk_indexed(
    spark,
    corpus: DataFrame,
    queries: DataFrame,
    prefix: str,
    k: int = 5,
    n_candidates: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_topk against the materialised index: the ADC scan reads the
    stored m-byte codes (never re-encoding the corpus); `corpus` supplies
    raw vectors ONLY for the exact re-rank of ~n_queries x n_candidates
    survivors.  Output matches pq_topk over the same codebooks."""
    dim, m, n_codes = _pq_index_params(spark, prefix)
    sub = dim // m
    books = _load_codebooks(spark, prefix, m, n_codes, sub)
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    luts = [books[j] @ q_mat[:, j * sub : (j + 1) * sub].T for j in range(m)]
    n_q = len(q_ids)

    @pandas_udf(ArrayType(DoubleType()))
    def _adc(codes: pd.Series) -> pd.Series:
        C = np.array(codes.tolist(), dtype=np.int64)
        s = np.zeros((len(C), n_q))
        for j in range(m):
            s += luts[j][C[:, j]]
        return pd.Series(list(s))

    scored = spark.table(f"{prefix}_codes").select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(_adc(F.col("pq_code"))).alias("qidx", "adc"),
    )
    w_adc = Window.partitionBy("qidx").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    qmap = spark.createDataFrame(
        list(enumerate(q_ids)),
        f"qidx int, query_id {queries.schema[id_col].dataType.simpleString()}",
    )
    cand = (
        scored.withColumn("__r", F.row_number().over(w_adc))
        .filter(F.col("__r") <= n_candidates)
        .join(F.broadcast(qmap), "qidx")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    exact = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any of n_tables
    hyperplane-LSH buckets with the query; exact cosine re-rank on the
    candidate set.  Recall grows with n_tables; cost ~ bucket occupancy
    instead of corpus size.

    Physical shape: ONE corpus scan and one Arrow crossing (all tables'
    signatures in a single UDF), posexplode to (table, sig) keys, one
    broadcast join, then per-pair dedup via max() over scalar keys --
    a hash aggregate (arrays never enter a grouping key, which would
    force a sort aggregate).

    Parameter choice is data-dependent: collision probability per bit is
    1 - theta/pi.  The defaults (4 bits x 16 tables, ~0.95 recall) suit
    weakly-clustered corpora like the synthetic one (top-1 cosine ~0.35,
    so ~0.63/bit); for real embedding corpora where near-duplicates sit at
    cosine >= 0.8 (~0.8/bit), raise n_bits to 12-16 for far smaller
    candidate sets at the same recall."""
    sig_c = random_hyperplane_signatures(
        corpus, dim, n_bits, n_tables, id_col, vec_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.posexplode("lsh_sigs").alias("t", "sig"),
    )
    sig_q = random_hyperplane_signatures(
        queries, dim, n_bits, n_tables, id_col, vec_col
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.posexplode("lsh_sigs").alias("t", "sig"),
    )
    scored = (
        sig_c.join(F.broadcast(sig_q), ["t", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def cluster_candidate_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_lists: int = 16,
    n_assign: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style candidate generation (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with spherical
    k-means, then look for near-duplicate pairs only WITHIN clusters.

    Multi-assignment (`n_assign` nearest centroids per vector, the
    paper's eps-ball-overlap mitigation) catches pairs that straddle a
    cluster boundary; every candidate is exact-cosine verified, so
    precision is exact and only recall depends on the clustering.
    Companion of `lsh_near_dup_pairs`: the cluster route wins when the
    corpus is cluster-structured (candidate count ~ sum of squared
    CLUSTER sizes, far below LSH bucket collisions on clustered data);
    LSH wins on isotropic corpora.  Recall at this corpus's settings is
    driver-certified by semantic_dedup_recall_certificate.

    Scale notes: centroids come from a bounded deterministic sample and
    broadcast in the UDF closure (train_ivf_centroids); one Arrow
    crossing assigns lists; the self-join shuffles on list_id and AQE
    splits hot lists.  Bound per-list cost by raising n_lists with
    corpus size (candidates ~ n^2/n_lists for balanced lists)."""
    centroids = train_ivf_centroids(
        corpus, dim, n_lists, vec_col=vec_col, id_col=id_col
    )
    probe = _nearest_lists_udf(centroids, n_assign)
    assigned = fan_out(corpus).select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(probe(F.col(vec_col))).alias("list_id"),
    )
    left = assigned.select(
        F.col("list_id"),
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("__va"),
    )
    right = assigned.select(
        F.col("list_id"),
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("__vb"),
    )
    return (
        left.join(right, "list_id")
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])  # a pair can share several lists
        .select("a", "b", cosine(F.col("__va"), F.col("__vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Collapse semantic near-duplicates to one representative: connect
    the verified pair graph, keep the smallest id per component plus
    every isolated row.  `pairs` is any (a, b) near-dup pair frame --
    cluster_candidate_pairs for the SemDeDup shape, lsh_near_dup_pairs
    when recall must not depend on cluster structure.

    Scale notes: components run on the PAIR set (orders of magnitude
    below corpus size); the survivors join is un-hinted so AQE
    broadcasts the assignment only when it fits."""
    from .graph import connected_components

    clusters = connected_components(pairs.select("a", "b"), src="a", dst="b")
    assignment = clusters.select(
        F.col("node").alias(id_col), F.col("component").alias("__component")
    )
    return (
        corpus.join(assignment, id_col, "left")
        .filter(
            F.col("__component").isNull() | (F.col("__component") == F.col(id_col))
        )
        .drop("__component")
    )


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification for a bounded query set.

    Output: (query_id, predicted_label, votes, true_label, correct) --
    one row per query; ties break on the smallest label so the result
    is a total order cross-engine.

    Scale notes: for a FIXED query set this is linear in the corpus
    (broadcast queries, one scan, k*|queries| surviving rows); the
    neighbor-label join keys on the corpus id.  For corpus-scale query
    sets swap brute_force_topk for lsh_topk / ivf_topk -- the vote
    logic is identical (they share the (query_id, neighbor_id) output
    contract)."""
    topk = brute_force_topk(corpus, queries, k, id_col, vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
    )
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "neighbor_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("neighbor_label").asc()
    )
    winner = (
        votes.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") == 1)
        .select(
            "query_id",
            F.col("neighbor_label").alias("predicted_label"),
            F.col("votes").cast("bigint").alias("votes"),
        )
    )
    truth = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("true_label"),
    )
    return winner.join(truth, "query_id").withColumn(
        "correct", F.col("predicted_label") == F.col("true_label")
    )
