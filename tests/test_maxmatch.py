"""Greedy longest-match segmentation (operators/maxmatch.py): the
MaxMatch rule on a hand-worked example, byte-exact reassembly over the
derived corpus vocabulary, and the coverage stall guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.maxmatch import (
    corpus_words,
    maxmatch_segment,
    maxmatch_vocab,
)

pytestmark = pytest.mark.slow


def _vocab_df(spark, pieces):
    return spark.createDataFrame([(p,) for p in pieces], "piece string")


def _words_df(spark, words):
    return spark.createDataFrame([(w, 1) for w in words], "word string, wf long")


class TestMaxMatch:
    def test_hand_worked_greedy(self, spark):
        """'abcab' under {a,b,c,ab,abc}: greedy longest-first gives
        abc+ab, never ab+c+ab -- the defining MaxMatch behaviour."""
        seg = maxmatch_segment(
            _words_df(spark, ["abcab", "ba"]),
            _vocab_df(spark, ["a", "b", "c", "ab", "abc"]),
        )
        got = sorted(tuple(r) for r in seg.collect())
        assert got == [
            ("abcab", 1, "abc"),
            ("abcab", 4, "ab"),
            ("ba", 1, "b"),
            ("ba", 2, "a"),
        ]

    def test_longest_match_is_positional_not_global(self, spark):
        """A long piece loses when a longer one matches EARLIER: 'xab'
        with {x, a, b, ab, xa} takes xa+b (xa wins at pos 1), not
        x+ab."""
        seg = maxmatch_segment(
            _words_df(spark, ["xab"]),
            _vocab_df(spark, ["x", "a", "b", "ab", "xa"]),
        )
        got = [r["piece"] for r in seg.orderBy("pos").collect()]
        assert got == ["xa", "b"]

    def test_reassembly_is_byte_exact_on_corpus_vocab(self, spark):
        """Every word of a synthetic corpus reassembles exactly from
        its pieces under the derived vocabulary (mass conservation --
        no character is dropped or duplicated)."""
        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumped"),
                (2, "the slow brown turtle crawled"),
                (3, "quick quick fox"),
            ],
            "doc_id bigint, text string",
        )
        words = corpus_words(docs)
        vocab = maxmatch_vocab(words, top_words=3)
        seg = maxmatch_segment(words, vocab)
        joined = (
            seg.orderBy("word", "pos")
            .groupBy("word")
            .agg(F.concat_ws("", F.collect_list("piece")).alias("re"))
        )
        bad = joined.filter(F.col("word") != F.col("re")).collect()
        assert bad == []
        # and the weighted piece mass equals total corpus characters
        n_chars = words.agg(
            F.sum(F.length("word") * F.col("wf"))
        ).collect()[0][0]
        piece_mass = (
            seg.join(words, "word")
            .agg(F.sum(F.length("piece") * F.col("wf")))
            .collect()[0][0]
        )
        assert piece_mass == n_chars

    def test_uncovered_character_stalls_loudly(self, spark):
        with pytest.raises(ValueError, match="stalled"):
            maxmatch_segment(
                _words_df(spark, ["abz"]),
                _vocab_df(spark, ["a", "b"]),
            )

    def test_empty_vocab_raises(self, spark):
        with pytest.raises(ValueError, match="empty vocabulary"):
            maxmatch_segment(
                _words_df(spark, ["ab"]),
                _vocab_df(spark, []).filter(F.lit(False)),
            )


class TestOptimalPieceCounts:
    def test_greedy_strictly_suboptimal_case(self, spark):
        """'aaab' under {a, b, aa, aab}: greedy takes aa (aab does not
        match at pos 1), then a+b -- 3 pieces; optimal is a+aab -- 2.
        The DP must find 2 where greedy emits 3."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.maxmatch import (
            optimal_piece_counts,
        )

        words = _words_df(spark, ["aaab"])
        vocab = _vocab_df(spark, ["a", "b", "aa", "aab"])
        opt = {
            r["word"]: r["np_opt"]
            for r in optimal_piece_counts(words, vocab).collect()
        }
        assert opt == {"aaab": 2}
        greedy = maxmatch_segment(words, vocab).count()
        assert greedy == 3

    def test_matches_bruteforce_on_seeded_inputs(self, spark):
        """BFS shortest-path piece counts equal a driver-side
        exhaustive DP over every word of a random corpus."""
        import random

        from dataworks_aws_corporate_data_ingestion_spark.operators.maxmatch import (
            optimal_piece_counts,
        )

        rng = random.Random(20240816)
        alpha = "ab"
        words = sorted(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
                for _ in range(25)
            }
        )
        pieces = sorted(
            {"a", "b"}
            | {
                "".join(rng.choice(alpha) for _ in range(rng.randint(2, 3)))
                for _ in range(6)
            }
        )

        def ref_opt(word):
            best = [None] * (len(word) + 1)
            best[0] = 0
            for i in range(len(word)):
                if best[i] is None:
                    continue
                for p in pieces:
                    if word.startswith(p, i):
                        j = i + len(p)
                        if best[j] is None or best[j] > best[i] + 1:
                            best[j] = best[i] + 1
            return best[len(word)]

        got = {
            r["word"]: r["np_opt"]
            for r in optimal_piece_counts(
                _words_df(spark, words), _vocab_df(spark, pieces)
            ).collect()
        }
        want = {w: ref_opt(w) for w in words}
        assert got == want
