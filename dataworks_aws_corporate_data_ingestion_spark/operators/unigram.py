"""Unigram-LM (SentencePiece-style) tokenizer training: hard-EM with
an integer-exact Viterbi objective.

Completes the tokenizer-trainer family next to BPE (frequency merges,
operators/bpe.py) and WordPiece (likelihood merges): the unigram
recipe (Kudo, "Subword Regularization", ACL 2018; the SentencePiece
trainer) goes the OTHER way -- start from a large seed vocabulary of
candidate substrings, alternate (segment corpus under current scores /
re-estimate scores from usage), and PRUNE pieces that earn no usage.

Exact-arithmetic discipline: true EM multiplies probabilities
(transcendentals -- unhashable across engines), so this trainer runs
HARD EM with an integer Viterbi objective, per word choosing the
segmentation that is
    1. fewest pieces            (min description length),
    2. then largest score sum   (most familiar pieces, integer adds),
    3. then lexicographically smallest piece sequence (a total order),
with scores = integer usage counts (seed: weighted substring
occurrence counts).  Every comparison is integer or byte-order string
-- both engines agree bit for bit, so the whole T-iteration recurrence
is oracle-checkable, like textrank's fixed-point and BPE's unrolled
rounds.

Plan shape per iteration, all over the DISTINCT-WORD table (Heaps'
law: vocabulary-sized, never the corpus; corpus frequency weights join
once per usage recount):
  edges:   all (piece, score) matches at every word position -- one
           broadcast join probe (the maxmatch edge-list shape);
  Viterbi: bounded path enumeration by driver-loop explode (<= longest
           word rounds; <= 2^(len-1) paths per word, fine for natural-
           language word lengths) + one window top-1 per word;
  usage:   explode the chosen sequences, weight by word frequency --
           a map-side-combined aggregate;
  prune:   drop multi-char pieces under `prune_min` usage (single
           characters always survive: the coverage guarantee).

At 100 TB the corpus is scanned once (word frequencies); every
iteration is vocabulary-sized.  For corpora of very long words swap
the enumeration for the positional DP -- the objective's first two
keys are DP-compatible; enumeration is kept here because the THIRD key
(lexicographic sequence) is what makes the result a total order the
SQL oracle can replay exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seed_scores", "viterbi_segment", "unigram_train",
           "ensure_coverage", "viterbi_costs_dp"]

_MAX_WORD_LEN = 16  # enumeration guard: 2^15 paths per word at most


def seed_scores(
    words: DataFrame, max_piece_len: int = 4, min_count: int = 2
) -> DataFrame:
    """Seed vocabulary with integer scores: every substring of length
    1..max_piece_len of every distinct word, scored by WEIGHTED
    occurrence count (each occurrence of the substring inside each
    word, times the word's corpus frequency); multi-char pieces below
    `min_count` are dropped, single characters always kept.  Returns
    (piece, s bigint)."""
    pos = F.explode(F.expr("sequence(1, length(word))")).alias("i")
    lens = F.explode(
        F.array(*[F.lit(l) for l in range(1, max_piece_len + 1)])
    ).alias("l")
    subs = (
        words.select("word", "wf", pos)
        .select("word", "wf", "i", lens)
        .filter(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .select(
            F.expr("substring(word, i, l)").alias("piece"),
            F.col("wf"),
        )
        .groupBy("piece")
        .agg(F.sum("wf").cast("bigint").alias("s"))
    )
    return subs.filter(
        (F.length("piece") == 1) | (F.col("s") >= min_count)
    )


def _edges(words: DataFrame, scores: DataFrame) -> DataFrame:
    """(word, pos, l, piece, s): every scored-vocabulary match at every
    position -- the segmentation-DAG edge list with weights."""
    max_l = scores.agg(F.max(F.length("piece"))).collect()[0][0]
    if max_l is None:
        raise ValueError("empty score table")
    lens = F.array(*[F.lit(l) for l in range(1, int(max_l) + 1)])
    return (
        words.select("word")
        .distinct()
        .select("word", F.explode(F.expr("sequence(1, length(word))")).alias("pos"))
        .select("word", F.col("pos").cast("bigint").alias("pos"),
                F.explode(lens).alias("l"))
        .filter(F.col("pos") + F.col("l") - 1 <= F.length("word"))
        .withColumn("piece", F.expr("substring(word, pos, l)"))
        .join(F.broadcast(scores), "piece")
        .select("word", "pos", F.col("l").cast("bigint").alias("l"),
                "piece", "s")
    )


def viterbi_segment(words: DataFrame, scores: DataFrame) -> DataFrame:
    """Best segmentation per distinct word under integer scores:
    (word, seq) where seq is the space-joined piece sequence minimising
    (piece count, -score sum, sequence byte order).  Bounded path
    enumeration (driver loop, <= longest-word rounds) + one window
    top-1; raises on words longer than the enumeration guard."""
    too_long = words.filter(F.length("word") > _MAX_WORD_LEN).count()
    if too_long:
        raise ValueError(
            f"{too_long} words exceed the {_MAX_WORD_LEN}-char "
            "enumeration guard -- swap in the positional DP"
        )
    edges = _edges(words, scores).localCheckpoint(eager=True)
    states = (
        words.select("word")
        .distinct()
        .select(
            "word",
            F.lit(1).cast("bigint").alias("pos"),
            F.lit(0).cast("bigint").alias("np"),
            F.lit(0).cast("bigint").alias("ssum"),
            F.lit("").alias("seq"),
        )
    )
    finished: list[DataFrame] = []
    while True:
        states = states.localCheckpoint(eager=True)
        if states.count() == 0:
            break
        done = states.filter(F.col("pos") == F.length("word") + 1)
        finished.append(done.localCheckpoint(eager=True))
        active = states.filter(F.col("pos") <= F.length("word"))
        states = active.join(edges, ["word", "pos"]).select(
            "word",
            (F.col("pos") + F.col("l")).alias("pos"),
            (F.col("np") + 1).alias("np"),
            (F.col("ssum") + F.col("s")).alias("ssum"),
            F.when(F.col("seq") == "", F.col("piece"))
            .otherwise(F.concat(F.col("seq"), F.lit(" "), F.col("piece")))
            .alias("seq"),
        )
    paths = finished[0]
    for p in finished[1:]:
        paths = paths.unionByName(p)
    w = Window.partitionBy("word").orderBy(
        F.asc("np"), F.desc("ssum"), F.asc("seq")
    )
    return (
        paths.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("word", "seq")
    )


def unigram_train(
    words: DataFrame,
    iterations: int = 2,
    max_piece_len: int = 4,
    min_count: int = 2,
    prune_min: int = 2,
    return_scores: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Hard-EM unigram trainer over a (word, wf) frequency table:
    seed substring scores -> repeat `iterations` times (Viterbi-segment
    every word, recount weighted piece usage, prune multi-char pieces
    under `prune_min`, re-score from usage).  Returns the final
    (piece, usage bigint) vocabulary -- pieces that survived pruning
    and earned usage in the last segmentation pass; with
    `return_scores` also the final (piece, s) score table, i.e. THE
    MODEL the apply path (ensure_coverage + viterbi_segment on new
    text) consumes.

    Scores between rounds are COALESCE(usage, 0) over the surviving
    vocabulary, so an unused single char stays segmentable at score 0
    (coverage) while carrying no familiarity weight."""
    words = words.localCheckpoint(eager=True)
    scores = seed_scores(words, max_piece_len, min_count)
    usage = None
    for _ in range(iterations):
        scores = scores.localCheckpoint(eager=True)
        seg = viterbi_segment(words, scores)
        usage = (
            seg.select(
                "word", F.explode(F.split("seq", " ")).alias("piece")
            )
            .join(words, "word")
            .groupBy("piece")
            .agg(F.sum("wf").cast("bigint").alias("usage"))
        ).localCheckpoint(eager=True)
        survivors = scores.select("piece").join(
            usage, "piece", "left"
        ).filter(
            (F.length("piece") == 1)
            | (F.coalesce(F.col("usage"), F.lit(0)) >= prune_min)
        )
        scores = survivors.select(
            "piece",
            F.coalesce(F.col("usage"), F.lit(0)).cast("bigint").alias("s"),
        )
    if return_scores:
        return usage, scores
    return usage


def ensure_coverage(scores: DataFrame, words: DataFrame) -> DataFrame:
    """Union every single character of `words` into the score table at
    score 0 -- the SentencePiece required-character discipline, so a
    stored model can segment NEW text containing characters the
    training corpus never produced (they tokenize as zero-familiarity
    char pieces instead of stalling)."""
    chars = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                )
            ).alias("piece")
        )
        .distinct()
        .join(scores.select("piece"), "piece", "left_anti")
        .select("piece", F.lit(0).cast("bigint").alias("s"))
    )
    return scores.unionByName(chars)


def viterbi_costs_dp(words: DataFrame, scores: DataFrame) -> DataFrame:
    """Optimal segmentation COSTS by positional dynamic programming:
    (word, np bigint, ssum bigint) of the best segmentation under
    (fewest pieces, largest score sum) -- the scale path for corpora
    whose words exceed viterbi_segment's enumeration guard
    (URLs, DNA k-mers, agglutinative compounds).

    Left-to-right sweep over positions: best[j] = min over edges
    (i -> j) of combine(best[i], edge) under (np ASC, ssum DESC);
    the objective's first two keys have optimal substructure, so the
    sweep is exact for them (pinned against the enumeration by test).
    The third enumeration key (lexicographic sequence) is NOT
    DP-compatible and is not reconstructed here -- use this twin when
    the COSTS are the product (token counts, familiarity totals), and
    the enumeration when the concrete piece sequence must be total-
    ordered for an oracle.

    Each round j touches only edges landing on position j -- bounded
    joins over the distinct-word table; rounds = longest word."""
    edges = _edges(words, scores).localCheckpoint(eager=True)
    max_len = int(
        words.agg(F.max(F.length("word"))).collect()[0][0] or 0
    )
    best = (
        words.select("word")
        .distinct()
        .select(
            "word",
            F.lit(1).cast("bigint").alias("pos"),
            F.lit(0).cast("bigint").alias("np"),
            F.lit(0).cast("bigint").alias("ssum"),
        )
        .localCheckpoint(eager=True)
    )
    for j in range(2, max_len + 2):
        landing = edges.filter(F.col("pos") + F.col("l") == j).select(
            "word", "pos", "l", "s"
        )
        cand = best.join(landing, ["word", "pos"]).select(
            "word",
            F.lit(j).cast("bigint").alias("pos"),
            (F.col("np") + 1).alias("np"),
            (F.col("ssum") + F.col("s")).alias("ssum"),
        )
        win = Window.partitionBy("word", "pos").orderBy(
            F.asc("np"), F.desc("ssum")
        )
        new_best = (
            cand.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        best = best.unionByName(new_best).localCheckpoint(eager=True)
    return best.filter(
        F.col("pos") == F.length("word") + 1
    ).select("word", "np", "ssum")
