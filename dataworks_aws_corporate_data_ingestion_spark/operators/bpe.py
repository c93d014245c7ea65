"""Distributed BPE-style tokenizer-vocabulary induction.

The missing tokenizer-training piece of an LLM data pipeline: given a
corpus, learn the first k byte-pair-encoding merges at WORD granularity
(count adjacent token pairs, pick the most frequent, fuse it everywhere,
repeat).  Reference shape: the original BPE recipe (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units") and every
production tokenizer trainer since -- per round one counting pass and
one merge-application pass over the corpus.

Spark-first design, per round:
  1. pair counts: split -> adjacent-pair enumeration as codegen exprs
     (arrays_zip of two slices, posexplode) -> map-side-combined
     groupBy.  One shuffle of (w1, w2) partial counts per round.
  2. best pair: global top-1 with a total deterministic order
     (count DESC, w1 ASC, w2 ASC) -- a TakeOrderedAndProject, then
     broadcast back as a 1-row frame (crossJoin(broadcast(...)), the
     singleton-aggregate pattern; the corpus is never collected).
  3. merge application: pure string ops, exactly mirrorable in ANSI SQL
     so the whole k-round recurrence is oracle-checkable bit-for-bit:
       doubled   = ' ' || replace(t, ' ', '  ') || ' '
       fused     = replace(doubled, ' w1  w2 ', ' w1+w2 ')
       t_next    = trim(replace(fused, '  ', ' '))
     Doubling the separators makes pair occurrences non-overlapping
     (adjacent matches do not share a boundary space), so the
     left-to-right non-overlapping ALL-occurrence semantics both
     engines' literal replace() implements IS the BPE greedy-left fuse:
     "x x x" fuses to "x+x x", never "x x+x" or "x+x+x".
  4. localCheckpoint(eager) pins the fused corpus so the plan stays
     O(1) deep across rounds (the textrank discipline) -- k rounds cost
     k linear passes, each shuffling only the vocabulary-sized pair
     counts.

INCREMENTAL COUNTING (`incremental=True`, measured and REJECTED as the
default): the classic single-node trainer optimisation -- fusing
(w1, w2) -> m only changes pair counts inside documents containing the
adjacent pair, so maintain the count table with footprint-sized deltas
(counts(fused affected) - counts(affected), affected selected by a
narrow padded-literal contains() scan) instead of a full recount.  A
seeded pytest sweep pins the two paths bit-identical, and the measured
k-sweep (SCALE_DECADE.json::bpe_k_sweep) shows its per-merge cost
falling with k -- but the naive recount still wins ABSOLUTE time at
every measured point (sf1.0 k=64: 47s vs 74s; k=256: 179s vs 449s).
The reason is structural, not an implementation wart: in the
shuffle-bound distributed regime both modes pay the same per-round
floor -- the corpus rewrite (fuse + checkpoint) and a vocabulary-sized
count-table shuffle (naive's map-side-combined recount emits the same
pair-vocabulary shuffle volume the maintained table's union-groupBy
rewrite does; adjacent-pair enumeration is the cheap map side).  The
delta path only removes the map-side enumeration and adds a third
eager job per round.  The single-node trick does not transfer: it wins
on a heap + linked lists where re-enumeration IS the cost.  What a
30k-merge production vocabulary actually wants in Spark is batching
non-interacting merges per corpus pass -- implemented as
`bpe_merge_table_batched` (block-greedy: up to `batch` token-disjoint
pairs selected per pass snapshot, fused in one rewrite), which pays
the per-round floor once per PASS; its selection deliberately diverges
from the sequential greedy recurrence (documented on the function), so
the sequential trainer remains the certified default.

At 100 TB (naive path): per-round shuffle is the pair-vocabulary
partial counts (map-side combined), the merge table is kilobytes, the
corpus rewrite is a narrow map, and the plan stays O(1)-deep via
eager localCheckpoint.

The fused-token separator is '+' (documents here are lowercase
[a-z0-9 ] synthetic text, so '+' cannot collide with corpus bytes);
both engines apply identical literal replaces, so divergence is
impossible by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import fan_out

JOIN_CH = "+"


def _adjacent_pair_counts(cur: DataFrame) -> DataFrame:
    """(w1, w2, pair_count) over every adjacent token occurrence of the
    single-space-normalised text column `t` (not distinct-per-doc:
    BPE weighting counts occurrences)."""
    toks = F.split(F.col("t"), " ")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        cur.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


def _fuse_tagged(tagged: DataFrame) -> DataFrame:
    """Apply the (bw1, bw2) best-pair columns already present on
    `tagged` to its text column: the doubled-separator literal replace
    described in the module docstring.  Returns (doc_id, t)."""
    doubled = F.concat(
        F.lit(" "), F.replace(F.col("t"), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    pat = F.concat(
        F.lit(" "), F.col("bw1"), F.lit("  "), F.col("bw2"), F.lit(" ")
    )
    rep = F.concat(
        F.lit(" "), F.col("bw1"), F.lit(JOIN_CH), F.col("bw2"), F.lit(" ")
    )
    return tagged.select(
        "doc_id",
        F.trim(
            F.replace(F.replace(doubled, pat, rep), F.lit("  "), F.lit(" "))
        ).alias("t"),
    )


def _fuse(best: DataFrame, cur: DataFrame) -> DataFrame:
    """Apply the broadcast 1-row best pair to every document."""
    return _fuse_tagged(cur.crossJoin(F.broadcast(best)))


def _top1(counts: DataFrame) -> DataFrame:
    """Deterministic global best pair: count DESC, ties on (w1, w2)
    byte order -- a TakeOrderedAndProject, pinned eagerly so each round
    reuses it as a broadcast singleton."""
    return (
        counts.orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
        .limit(1)
        .select(
            F.col("w1").alias("bw1"),
            F.col("w2").alias("bw2"),
            F.col("pair_count").alias("bcount"),
        )
        .localCheckpoint(eager=True)
    )


def _unigram_counts(cur: DataFrame) -> DataFrame:
    """(w, wc) occurrence counts of every token of the current corpus
    -- the denominator table for likelihood-scored (WordPiece) merge
    selection.  Vocabulary-sized, map-side combined."""
    return (
        cur.select(F.explode(F.split(F.col("t"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _top1_likelihood(counts: DataFrame, cur: DataFrame) -> DataFrame:
    """WordPiece merge selection: maximise score(a, b) =
    count(ab) / (count(a) * count(b)) -- the pair whose fusion most
    raises a unigram-LM corpus likelihood (Schuster & Nakajima,
    "Japanese and Korean voice search", ICASSP 2012) -- instead of raw
    pair frequency.  The score is ONE IEEE division of exactly-derived
    doubles (each factor an exact integer count cast to double), so
    both engines order candidates identically; ties break on
    pair_count DESC then (w1, w2) byte order.  The unigram table is
    vocabulary-sized and broadcast into the join."""
    ug = _unigram_counts(cur)
    u1 = ug.select(F.col("w").alias("w1"), F.col("wc").alias("c1"))
    u2 = ug.select(F.col("w").alias("w2"), F.col("wc").alias("c2"))
    scored = (
        counts.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            "pair_count",
            (
                F.col("pair_count").cast("double")
                / (F.col("c1").cast("double") * F.col("c2").cast("double"))
            ).alias("score"),
        )
    )
    return (
        scored.orderBy(
            F.desc("score"), F.desc("pair_count"), F.asc("w1"), F.asc("w2")
        )
        .limit(1)
        .select(
            F.col("w1").alias("bw1"),
            F.col("w2").alias("bw2"),
            F.col("pair_count").alias("bcount"),
            F.col("score").alias("bscore"),
        )
        .localCheckpoint(eager=True)
    )


def _train(
    cur: DataFrame,
    k: int,
    fuse_last: bool,
    incremental: bool,
    likelihood: bool = False,
) -> tuple[list[DataFrame], DataFrame]:
    """Shared k-round trainer core.  Returns (per-round 1-row best
    frames, final corpus).  `fuse_last` controls whether the k-th merge
    is also applied to the corpus (apply path) or only recorded (train
    path).  `incremental` selects maintained-delta pair counting over
    the naive per-round full recount; the merge sequence is identical
    either way.  `likelihood` switches merge selection from raw pair
    frequency (BPE) to the WordPiece score count(ab)/(count(a)count(b))
    -- the fuse machinery is shared, only the argmax differs; it
    requires the naive counting path (the maintained-delta table does
    not carry the unigram denominators)."""
    if likelihood and incremental:
        raise ValueError(
            "likelihood scoring requires the naive counting path"
        )
    counts = _adjacent_pair_counts(cur)
    if incremental:
        counts = counts.localCheckpoint(eager=True)
    # untouched-UNION-fused concatenates both sides' partitions, so an
    # unchecked loop DOUBLES the corpus partition count every round --
    # exponential task counts by k=64 (observed: 2-minute scheduling
    # stalls at 50k docs).  Pin each round's rewrite back to the input
    # width with a shuffle-free coalesce.
    n_parts = cur.rdd.getNumPartitions()
    rounds: list[DataFrame] = []
    # Round overlap (r11, guide 2.6): the naive path's two serialised
    # jobs per round -- corpus-rewrite checkpoint, then count+argmax over
    # the checkpointed corpus -- have no hard dependency: the NEXT
    # round's count can run over the LAZY rewrite (same deterministic
    # plan, recomputing the narrow string fuse inline) while a
    # background thread materialises the eager checkpoint.  Per round
    # the driver then waits on max(checkpoint, count+argmax) instead of
    # their sum.  Distinct from the r10 lazy-localCheckpoint experiment
    # (REVERTED): that removed the eager job and serialised everything
    # into one fused stage; this keeps the eager per-round checkpoint
    # discipline (plans stay O(1)-deep, harness sweeps still see the
    # blocks) and only changes WHEN the driver blocks on it.  The merge
    # sequence is bit-identical: every argmax reads the same
    # deterministic corpus value, checkpointed or lazy.
    pool = None
    pending = None
    count_src = cur  # the frame `counts` was derived from
    for r in range(1, k + 1):
        best = (
            _top1_likelihood(counts, count_src) if likelihood else _top1(counts)
        )
        rounds.append(best)
        last = r == k
        if pending is not None:
            cur = pending.result()  # adopt the overlapped checkpoint
            pending = None
        if last and not fuse_last:
            break
        tagged = cur.crossJoin(F.broadcast(best))
        if not incremental:
            fused = _fuse_tagged(tagged)
            if last:
                cur = fused.localCheckpoint(eager=True)
                continue
            if pool is None:
                from concurrent.futures import ThreadPoolExecutor

                pool = ThreadPoolExecutor(max_workers=1)
            pending = pool.submit(
                lambda df=fused: df.localCheckpoint(eager=True)
            )
            counts = _adjacent_pair_counts(fused)
            count_src = fused
            continue
        # adjacency probe on the single-space text: a doc contains the
        # pair iff ' '||t||' ' contains ' w1 w2 ' (tokens are exactly
        # the segments between spaces, so the padded literal match IS
        # the split-adjacency test)
        hit = F.coalesce(
            F.contains(
                F.concat(F.lit(" "), F.col("t"), F.lit(" ")),
                F.concat(
                    F.lit(" "),
                    F.col("bw1"),
                    F.lit(" "),
                    F.col("bw2"),
                    F.lit(" "),
                ),
            ),
            F.lit(False),  # null text: no pairs, stays un-fused in corpus
        )
        affected = tagged.filter(hit)
        untouched = tagged.filter(~hit).select("doc_id", "t")
        fused = _fuse_tagged(affected)
        if not last:
            neg = _adjacent_pair_counts(affected).select(
                "w1", "w2", (-F.col("pair_count")).alias("pair_count")
            )
            pos = _adjacent_pair_counts(fused)
            counts = (
                counts.unionByName(neg)
                .unionByName(pos)
                .groupBy("w1", "w2")
                .agg(F.sum("pair_count").alias("pair_count"))
                .filter(F.col("pair_count") > 0)
                .localCheckpoint(eager=True)
            )
        cur = (
            untouched.unionByName(fused)
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    if pending is not None:
        cur = pending.result()
    if pool is not None:
        pool.shutdown(wait=True)
    return rounds, cur


def bpe_merge_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    incremental: bool = False,
) -> DataFrame:
    """Learn the first k BPE merges over the corpus.  Output one row per
    round: (merge_round, w1, w2, pair_count, merged) where `merged` is
    the fused vocabulary entry the round mints.  Deterministic: ties on
    pair_count break on (w1, w2) byte order, identical in any engine.

    Caller contract: the corpus must not contain the fuse separator
    '+' as a token byte (guaranteed for the synthetic documents table);
    texts with fewer than 2 tokens contribute nothing.
    """
    cur = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.col(text_col)).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    bests, _ = _train(cur, k, fuse_last=False, incremental=incremental)
    rounds = [
        best.select(
            F.lit(r).cast("bigint").alias("merge_round"),
            F.col("bw1").alias("w1"),
            F.col("bw2").alias("w2"),
            F.col("bcount").cast("bigint").alias("pair_count"),
            F.concat(F.col("bw1"), F.lit(JOIN_CH), F.col("bw2")).alias(
                "merged"
            ),
        )
        for r, best in enumerate(bests, start=1)
    ]
    out = rounds[0]
    for fr in rounds[1:]:
        out = out.unionByName(fr)
    return out


def bpe_apply(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    incremental: bool = False,
) -> DataFrame:
    """Train k merges (same recurrence as bpe_merge_table) and return
    the corpus RE-TOKENISED under them: (doc_id, t) where t is the
    single-space-joined fused token sequence -- the other half of a
    tokenizer (apply), built from the same per-round broadcast-fuse so
    train and apply cannot drift.  For segmenting NEW text against a
    stored merge table the identical _fuse chain applies, one literal
    replace per merge, all narrow maps."""
    cur = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.col(text_col)).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    _, cur = _train(cur, k, fuse_last=True, incremental=incremental)
    return cur


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment NEW text under an already-trained merge table -- the
    production apply path (train once, tokenise forever).

    `merges` is a bpe_merge_table output (merge_round, w1, w2, ...); it
    is collected to the driver (kilobytes -- k rows, a bounded contract
    like the ANN codebooks) and unrolled IN ROUND ORDER into k chained
    literal replaces on the doubled-separator encoding, the same greedy
    -left fuse the trainer applies.  The result is ONE projection --
    zero shuffles, zero Python crossings, whole-stage codegen over the
    entire chain -- so segmenting 100 TB of new text is a pure narrow
    map at scan speed.

    Returns (doc_id, t): the single-space-joined fused token sequence.
    """
    rows = merges.select("merge_round", "w1", "w2").orderBy("merge_round").collect()
    cur = F.lower(F.col(text_col))
    for r in rows:
        doubled = F.concat(
            F.lit(" "), F.replace(cur, F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        pat = F.lit(f" {r.w1}  {r.w2} ")
        rep = F.lit(f" {r.w1}{JOIN_CH}{r.w2} ")
        cur = F.trim(
            F.replace(F.replace(doubled, pat, rep), F.lit("  "), F.lit(" "))
        )
    return docs.select(F.col(id_col).alias("doc_id"), cur.alias("t"))


def bpe_merge_table_batched(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    batch: int = 2,
) -> DataFrame:
    """Block-greedy BPE: learn k merges in ceil(k/batch) corpus passes
    by selecting up to `batch` mutually TOKEN-DISJOINT pairs per pass --
    the production-round-count scale path the sequential trainer's
    adjudication names (operators/bpe.py module docstring): the
    per-round floor (corpus rewrite + vocabulary-sized count shuffle)
    is paid once per PASS instead of once per MERGE.

    Selection per pass: rank the pass's pair counts (count DESC, w1,
    w2); take the top pair, then repeatedly the highest-ranked pair
    sharing NO token with any already-selected pair.  Disjointness
    makes the fuses commute textually (occurrences cannot overlap and
    no selected pair can be formed by another's fusion), so applying
    them as chained literal replaces in rank order is exact, and each
    recorded pair_count (the pass-snapshot count) is still the pair's
    true count at fuse time.

    DIVERGENCE from sequential BPE, by design: merges 2..batch of a
    pass are chosen from the pass snapshot, not from counts updated
    after each single merge, so the selected sequence can differ from
    bpe_merge_table's whenever a fusion would have promoted a new pair
    above the pass's next pick.  This is the standard block-greedy
    trade; the sequential trainer remains the certified-greedy default.

    Cost: per pass one map-side-combined count shuffle (checkpointed,
    so the <=batch top-1 selections are vocabulary-sized SCANS of the
    checkpointed table, no corpus re-enumeration), one narrow fuse
    rewrite.  Selected pairs are collected one row at a time
    (kilobytes, the merge-table contract).

    Output schema matches bpe_merge_table: (merge_round, w1, w2,
    pair_count, merged), merge_round numbered sequentially across
    passes.  Truncates cleanly when a pass has no pairs left.
    """
    spark = docs.sparkSession
    cur = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.col(text_col)).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    n_parts = cur.rdd.getNumPartitions()
    out_rows: list[tuple] = []
    # per-pass round overlap (r11, guide 2.6; see _train): the pass's
    # count checkpoint runs over the LAZY previous rewrite while a
    # background thread materialises the eager corpus checkpoint
    pool = None
    pending = None
    lazy_cur = cur
    while len(out_rows) < k:
        counts = _adjacent_pair_counts(lazy_cur).localCheckpoint(eager=True)
        if pending is not None:
            cur = pending.result()
            pending = None
        sels: list = []
        used: set[str] = set()
        while len(sels) < min(batch, k - len(out_rows)):
            cand = counts
            if used:
                toks = sorted(used)
                cand = cand.filter(
                    ~F.col("w1").isin(*toks) & ~F.col("w2").isin(*toks)
                )
            best = (
                cand.orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            r = best[0]
            sels.append(r)
            used.update((r.w1, r.w2))
        if not sels:
            break
        for r in sels:
            out_rows.append(
                (len(out_rows) + 1, r.w1, r.w2, int(r.pair_count),
                 f"{r.w1}{JOIN_CH}{r.w2}")
            )
        if len(out_rows) >= k:
            break
        expr = F.col("t")
        for r in sels:  # rank order; disjointness makes order immaterial
            doubled = F.concat(
                F.lit(" "), F.replace(expr, F.lit(" "), F.lit("  ")), F.lit(" ")
            )
            expr = F.trim(
                F.replace(
                    F.replace(
                        doubled,
                        F.lit(f" {r.w1}  {r.w2} "),
                        F.lit(f" {r.w1}{JOIN_CH}{r.w2} "),
                    ),
                    F.lit("  "),
                    F.lit(" "),
                )
            )
        nxt = cur.select("doc_id", expr.alias("t")).coalesce(n_parts)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
        pending = pool.submit(lambda df=nxt: df.localCheckpoint(eager=True))
        lazy_cur = nxt
    if pending is not None:
        pending.result()
    if pool is not None:
        pool.shutdown(wait=True)
    return spark.createDataFrame(
        out_rows,
        "merge_round bigint, w1 string, w2 string, pair_count bigint,"
        " merged string",
    )


def wordpiece_merge_table_batched(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    batch: int = 2,
) -> DataFrame:
    """Block-greedy WORDPIECE: learn k likelihood-selected merges in
    ceil(k/batch) corpus passes by taking up to `batch` mutually
    TOKEN-DISJOINT pairs per pass -- the bpe_merge_table_batched scale
    path extended to likelihood selection (r8 verdict item #3: the
    sequential wordpiece trainer is the most expensive bench entry and
    pays the per-round floor -- corpus rewrite + count shuffle + unigram
    aggregate -- once per MERGE; this pays it once per PASS).

    Why token-disjointness is the right guard for LIKELIHOOD too:
    score(c,d) = count(cd) / (count(c) * count(d)).  Fusing (a,b) with
    {a,b} disjoint from {c,d} changes only the counts of a, b and the
    minted a+b: occurrences of "c d" contain neither a nor b, so
    count(cd) is invariant, and the unigram counts of c and d are
    invariant, so score(c,d) is EXACTLY what sequential selection would
    compute after the (a,b) merge.  Within a pass each recorded
    (pair_count, score) is therefore still the pair's true value at
    fuse time.  The divergence from sequential WordPiece is the same
    documented block-greedy trade as BPE's: a fusion can promote a NEW
    pair (one touching a, b or a+b) above the pass's next pick, and
    those are exactly the pairs disjointness excludes until the next
    pass.  The sequential trainer remains the certified-greedy default.

    Cost per pass: one map-side-combined pair-count shuffle + one
    vocabulary-sized unigram aggregate + two broadcast joins (all
    checkpointed once, so the <=batch disjoint argmax selections are
    vocabulary-sized scans, no corpus re-enumeration), then one narrow
    chained-replace rewrite.  Output schema matches
    wordpiece_merge_table: (merge_round, w1, w2, pair_count, score,
    merged), merge_round numbered sequentially across passes."""
    spark = docs.sparkSession
    cur = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.col(text_col)).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    n_parts = cur.rdd.getNumPartitions()
    out_rows: list[tuple] = []
    # per-pass round overlap (r11, guide 2.6; see _train)
    pool = None
    pending = None
    lazy_cur = cur
    while len(out_rows) < k:
        counts = _adjacent_pair_counts(lazy_cur)
        ug = _unigram_counts(lazy_cur)
        scored = (
            counts.join(
                F.broadcast(
                    ug.select(F.col("w").alias("w1"), F.col("wc").alias("c1"))
                ),
                "w1",
            )
            .join(
                F.broadcast(
                    ug.select(F.col("w").alias("w2"), F.col("wc").alias("c2"))
                ),
                "w2",
            )
            .select(
                "w1",
                "w2",
                "pair_count",
                (
                    F.col("pair_count").cast("double")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        if pending is not None:
            cur = pending.result()
            pending = None
        sels: list = []
        used: set[str] = set()
        while len(sels) < min(batch, k - len(out_rows)):
            cand = scored
            if used:
                toks = sorted(used)
                cand = cand.filter(
                    ~F.col("w1").isin(*toks) & ~F.col("w2").isin(*toks)
                )
            best = (
                cand.orderBy(
                    F.desc("score"), F.desc("pair_count"),
                    F.asc("w1"), F.asc("w2"),
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            r = best[0]
            sels.append(r)
            used.update((r.w1, r.w2))
        if not sels:
            break
        for r in sels:
            out_rows.append(
                (len(out_rows) + 1, r.w1, r.w2, int(r.pair_count),
                 float(r.score), f"{r.w1}{JOIN_CH}{r.w2}")
            )
        if len(out_rows) >= k:
            break
        expr = F.col("t")
        for r in sels:  # rank order; disjointness makes order immaterial
            doubled = F.concat(
                F.lit(" "), F.replace(expr, F.lit(" "), F.lit("  ")), F.lit(" ")
            )
            expr = F.trim(
                F.replace(
                    F.replace(
                        doubled,
                        F.lit(f" {r.w1}  {r.w2} "),
                        F.lit(f" {r.w1}{JOIN_CH}{r.w2} "),
                    ),
                    F.lit("  "),
                    F.lit(" "),
                )
            )
        nxt = cur.select("doc_id", expr.alias("t")).coalesce(n_parts)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
        pending = pool.submit(lambda df=nxt: df.localCheckpoint(eager=True))
        lazy_cur = nxt
    if pending is not None:
        pending.result()
    if pool is not None:
        pool.shutdown(wait=True)
    return spark.createDataFrame(
        out_rows,
        "merge_round bigint, w1 string, w2 string, pair_count bigint,"
        " score double, merged string",
    )


def wordpiece_merge_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
) -> DataFrame:
    """Learn the first k WORDPIECE merges over the corpus: the BPE
    k-round recurrence (same pair enumeration, same doubled-separator
    greedy-left fuse) with LIKELIHOOD merge selection -- per round the
    fused pair maximises count(ab) / (count(a) * count(b)), the
    unigram-LM likelihood gain WordPiece training optimises, instead of
    raw frequency.  Frequency promotes common collocations; likelihood
    promotes pairs that are SURPRISINGLY adjacent relative to their
    parts, which is why WordPiece vocabularies pick up rare-but-cohesive
    units earlier.

    Output one row per round: (merge_round, w1, w2, pair_count,
    score double, merged).  `score` is a single IEEE division of
    exactly-derived doubles, identical in any engine; ties break on
    pair_count DESC then (w1, w2) byte order, so the whole table is
    deterministic and oracle-checkable bit for bit.

    Cost shape per round matches bpe_merge_table plus one
    vocabulary-sized unigram aggregate and two broadcast joins of
    vocabulary-sized tables; the corpus is never collected.  The
    caller contract (no '+' corpus bytes, single-space text) is
    bpe_merge_table's."""
    cur = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.col(text_col)).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    bests, _ = _train(cur, k, fuse_last=False, incremental=False,
                      likelihood=True)
    rounds = [
        best.select(
            F.lit(r).cast("bigint").alias("merge_round"),
            F.col("bw1").alias("w1"),
            F.col("bw2").alias("w2"),
            F.col("bcount").cast("bigint").alias("pair_count"),
            F.col("bscore").alias("score"),
            F.concat(F.col("bw1"), F.lit(JOIN_CH), F.col("bw2")).alias(
                "merged"
            ),
        )
        for r, best in enumerate(bests, start=1)
    ]
    out = rounds[0]
    for fr in rounds[1:]:
        out = out.unionByName(fr)
    return out


def wordpiece_apply(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
) -> DataFrame:
    """Train k WordPiece merges (same recurrence as
    wordpiece_merge_table) and return the corpus RE-TOKENISED under
    them: (doc_id, t) -- the apply half, built from the same per-round
    broadcast-fuse so train and apply cannot drift (the bpe_apply
    contract with likelihood selection)."""
    cur = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.col(text_col)).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    _, cur = _train(cur, k, fuse_last=True, incremental=False,
                    likelihood=True)
    return cur
