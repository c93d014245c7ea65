"""Greedy longest-match subword segmentation (WordPiece inference).

The APPLY half of a WordPiece-style tokenizer: given a piece
vocabulary, split every word left-to-right by repeatedly taking the
LONGEST vocabulary piece matching at the current position (MaxMatch --
the WordPiece/BERT inference rule, Schuster & Nakajima ICASSP 2012;
unlike bpe_segment, which replays a merge SEQUENCE, this path needs
only the final vocabulary).

Spark-first, zero Python in the path: segmentation is an iterative
DataFrame algorithm over the DISTINCT-WORD table, not the corpus --
by Heaps' law the word vocabulary is orders of magnitude smaller than
a 100 TB corpus, and the corpus-scale weighting joins exactly once at
the end (piece stats = segment-per-distinct-word x word frequency).
Each round advances every unfinished word by one piece:

  1. candidate probe: explode match lengths 1..L (L = longest piece,
     a collected scalar), substr(word, pos, l) -- all codegen exprs;
  2. vocabulary check: broadcast inner join on the piece string;
  3. longest wins: max(l) per (word, pos), emit the piece, advance.

Rounds are bounded by the maximum piece count per word (<= longest
word), each round touching only still-active words; plans stay
O(1)-deep via eager localCheckpoint (the textrank discipline).
Termination is guaranteed by construction when the vocabulary contains
every single character of every word (maxmatch_vocab does).

The same recurrence is expressible as ONE recursive CTE with a
correlated longest-match subquery in ANSI SQL, which is exactly how the
registry oracle certifies it bit for bit."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "corpus_words",
    "maxmatch_vocab",
    "maxmatch_segment",
    "match_table",
    "optimal_piece_counts",
]


def corpus_words(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, wf) frequency table of whitespace words, lowercased,
    empties dropped -- the distinct-word domain segmentation runs on
    and the weight table piece stats join back to.  Projected + fanned
    out before the token explode (single-file parquet = one partition;
    the amplifying map must not serialise on one task)."""
    from ..partitioning import fan_out

    return (
        fan_out(docs.select(F.lower(F.col(text_col)).alias("__t")))
        .select(F.explode(F.split(F.col("__t"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wf"))
    )


def maxmatch_vocab(
    words: DataFrame, top_words: int = 12
) -> DataFrame:
    """Deterministic demonstration vocabulary: every single character
    (termination guarantee), the `top_words` most frequent whole words
    of length >= 2 (ties on the word), and the 2- and 3-character
    prefixes AND suffixes of every distinct word -- so long words
    segment through genuine multi-length, mid-word matches rather than
    collapsing to characters.  Returns one `piece` column, distinct.

    A production vocabulary (the output of wordpiece/BPE training)
    plugs into maxmatch_segment unchanged; this rule exists so the
    whole pipeline stays derivable inside one SQL oracle."""
    top = (
        words.filter(F.length("word") >= 2)
        .orderBy(F.desc("wf"), F.asc("word"))
        .limit(top_words)
        .select(F.col("word").alias("piece"))
    )
    chars = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("piece")
    )
    pre2 = words.filter(F.length("word") >= 2).select(
        F.expr("substring(word, 1, 2)").alias("piece")
    )
    pre3 = words.filter(F.length("word") >= 3).select(
        F.expr("substring(word, 1, 3)").alias("piece")
    )
    suf2 = words.filter(F.length("word") >= 2).select(
        F.expr("substring(word, length(word) - 1, 2)").alias("piece")
    )
    suf3 = words.filter(F.length("word") >= 3).select(
        F.expr("substring(word, length(word) - 2, 3)").alias("piece")
    )
    out = top
    for part in (chars, pre2, pre3, suf2, suf3):
        out = out.unionByName(part)
    return out.distinct()


def maxmatch_segment(
    words: DataFrame, vocab: DataFrame
) -> DataFrame:
    """Segment every distinct word of `words` under `vocab` by greedy
    longest-match-first.  Returns (word, pos, piece) with 1-based
    positions -- one row per emitted piece, in order.

    Caller contract: every character of every word appears in `vocab`
    (maxmatch_vocab guarantees it); otherwise a word with no match at
    some position would stall and raise."""
    vocab = vocab.select("piece").localCheckpoint(eager=True)
    max_l = vocab.agg(F.max(F.length("piece"))).collect()[0][0]
    if max_l is None:
        raise ValueError("empty vocabulary")
    lengths = F.array(*[F.lit(l) for l in range(1, int(max_l) + 1)])
    states = words.select("word").distinct().withColumn(
        "pos", F.lit(1).cast("bigint")
    )
    parts: list[DataFrame] = []
    while True:
        states = states.localCheckpoint(eager=True)
        n_active = states.count()
        if n_active == 0:
            break
        cands = (
            states.select(
                "word", "pos", F.explode(lengths).alias("l")
            )
            .filter(F.col("pos") + F.col("l") - 1 <= F.length("word"))
            .withColumn("piece", F.expr("substring(word, pos, l)"))
        )
        step = (
            cands.join(F.broadcast(vocab), "piece")
            .groupBy("word", "pos")
            .agg(F.max("l").cast("bigint").alias("ml"))
            .withColumn("piece", F.expr("substring(word, pos, ml)"))
        )
        if step.count() != n_active:
            raise ValueError(
                "vocabulary does not cover every character: a word "
                "stalled with no match"
            )
        parts.append(
            step.select("word", "pos", "piece").localCheckpoint(eager=True)
        )
        states = step.select(
            "word", (F.col("pos") + F.col("ml")).alias("pos")
        ).filter(F.col("pos") <= F.length("word"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def match_table(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """ALL vocabulary matches at every position of every distinct word:
    (word, pos, l) -- the edge list of the segmentation DAG.  Computed
    once, outside any iteration: candidate lengths exploded as codegen
    exprs against the broadcast vocabulary, exactly the maxmatch_segment
    probe without the per-round max."""
    vocab = vocab.select("piece").localCheckpoint(eager=True)
    max_l = vocab.agg(F.max(F.length("piece"))).collect()[0][0]
    if max_l is None:
        raise ValueError("empty vocabulary")
    lengths = F.array(*[F.lit(l) for l in range(1, int(max_l) + 1)])
    positions = F.expr("sequence(1, length(word))")
    return (
        words.select("word")
        .distinct()
        .select("word", F.explode(positions).alias("pos"))
        .select("word", F.col("pos").cast("bigint").alias("pos"),
                F.explode(lengths).alias("l"))
        .filter(F.col("pos") + F.col("l") - 1 <= F.length("word"))
        .withColumn("piece", F.expr("substring(word, pos, l)"))
        .join(F.broadcast(vocab), "piece")
        .select("word", "pos", F.col("l").cast("bigint").alias("l"))
    )


def optimal_piece_counts(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """MINIMUM piece count per distinct word -- the Viterbi/DP layer of
    a unigram-style tokenizer under the min-pieces objective (uniform
    piece scores), chosen precisely because it is integer-exact and
    engine-portable where probability-weighted Viterbi would drag
    transcendentals into the hashed output.

    BFS over the segmentation DAG: round c holds every (word, pos)
    reachable with exactly c pieces; the first round that reaches
    pos = len(word)+1 is that word's optimum (BFS layers = shortest
    path).  Finished words are pruned, states deduped per round, so
    the working set never exceeds (distinct words x positions) -- all
    vocabulary-sized, never corpus-sized.  Rounds are bounded by the
    longest word.  Returns (word, np_opt bigint)."""
    mt = match_table(words, vocab).localCheckpoint(eager=True)
    states = (
        words.select("word")
        .distinct()
        .select("word", F.lit(1).cast("bigint").alias("pos"))
    )
    finished: list[DataFrame] = []
    c = 0
    while True:
        states = states.localCheckpoint(eager=True)
        if states.count() == 0:
            break
        done = states.filter(
            F.col("pos") == F.length("word") + 1
        ).select("word", F.lit(c).cast("bigint").alias("np_opt"))
        finished.append(done.localCheckpoint(eager=True))
        active = states.filter(F.col("pos") <= F.length("word")).join(
            done.select("word").withColumn("__f", F.lit(1)), "word", "left"
        ).filter(F.col("__f").isNull()).drop("__f")
        states = (
            active.join(mt, ["word", "pos"])
            .select("word", (F.col("pos") + F.col("l")).alias("pos"))
            .distinct()
        )
        c += 1
        if c > 64:
            raise ValueError(
                "segmentation DAG deeper than 64 rounds: vocabulary "
                "does not cover some character"
            )
    out = finished[0]
    for p in finished[1:]:
        out = out.unionByName(p)
    return out
