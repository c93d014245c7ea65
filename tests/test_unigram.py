"""Hard-EM unigram trainer (operators/unigram.py): seeded sweep
against a sequential reference of the full recurrence, pruning
behaviour, Viterbi objective order, and the enumeration guard."""

from __future__ import annotations

import itertools
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.unigram import (
    seed_scores,
    unigram_train,
    viterbi_segment,
)

pytestmark = pytest.mark.slow


def _words_df(spark, freqs):
    return spark.createDataFrame(
        list(freqs.items()), "word string, wf long"
    )


def _ref_segmentations(word, vocab):
    """All segmentations of `word` into vocab pieces."""
    if word == "":
        return [[]]
    out = []
    for l in range(1, len(word) + 1):
        p = word[:l]
        if p in vocab:
            out.extend([p] + rest for rest in _ref_segmentations(word[l:], vocab))
    return out


def _ref_viterbi(word, scores):
    segs = _ref_segmentations(word, set(scores))
    assert segs, f"no segmentation for {word}"
    return min(
        segs,
        key=lambda s: (len(s), -sum(scores[p] for p in s), " ".join(s)),
    )


def _ref_train(freqs, iterations=2, max_piece_len=4, min_count=2,
               prune_min=2):
    scores: Counter = Counter()
    for w, wf in freqs.items():
        for i in range(len(w)):
            for l in range(1, max_piece_len + 1):
                if i + l <= len(w):
                    scores[w[i : i + l]] += wf
    scores = {
        p: s
        for p, s in scores.items()
        if len(p) == 1 or s >= min_count
    }
    usage: Counter = Counter()
    for _ in range(iterations):
        usage = Counter()
        for w, wf in freqs.items():
            for p in _ref_viterbi(w, scores):
                usage[p] += wf
        scores = {
            p: usage.get(p, 0)
            for p in scores
            if len(p) == 1 or usage.get(p, 0) >= prune_min
        }
    return dict(usage)


class TestUnigramHardEm:
    def test_seeded_sweep_matches_sequential_reference(self, spark):
        rng = random.Random(20240816)
        parts = ["ab", "ba", "abc", "ca", "b"]
        freqs = {}
        for _ in range(20):
            w = "".join(
                rng.choice(parts) for _ in range(rng.randint(1, 3))
            )[:8]
            freqs[w] = freqs.get(w, 0) + rng.randint(1, 9)
        got = {
            r["piece"]: r["usage"]
            for r in unigram_train(
                _words_df(spark, freqs), iterations=2,
                max_piece_len=4, min_count=2, prune_min=2,
            ).collect()
        }
        assert got == _ref_train(freqs, 2, 4, 2, 2)

    def test_pruning_drops_unused_pieces_and_em_reassigns(self, spark):
        """'abab' x10: seed scores give 'ab' weighted count 20 and
        'ba' 10; Viterbi picks ab+ab, so 'ba' (and every other unused
        multi-char piece) earns zero usage and is pruned, while the
        final usage table concentrates on the winners."""
        freqs = {"abab": 10}
        out = {
            r["piece"]: r["usage"]
            for r in unigram_train(
                _words_df(spark, freqs), iterations=2,
                max_piece_len=3, min_count=2, prune_min=2,
            ).collect()
        }
        assert out == _ref_train(freqs, 2, 3, 2, 2)
        assert "ba" not in out and "aba" not in out
        assert out.get("ab") == 20 or "abab" not in out
        # the chosen segmentation uses exactly the surviving pieces
        assert sum(out.values()) % 10 == 0

    def test_viterbi_objective_order(self, spark):
        """min pieces beats max score; among equal piece counts the
        larger score sum wins; residual ties break on sequence byte
        order."""
        words = _words_df(spark, {"aaaa": 1})
        # 'aaaa' as one piece (score 1) must beat two 'aa' (score 99 each)
        scores = spark.createDataFrame(
            [("aaaa", 1), ("aa", 99), ("a", 99)], "piece string, s long"
        )
        seq = viterbi_segment(words, scores).collect()[0]["seq"]
        assert seq == "aaaa"
        # equal piece count: ('ab','cd') sum 5 beats ('a','bcd') sum 4
        words2 = _words_df(spark, {"abcd": 1})
        scores2 = spark.createDataFrame(
            [("ab", 3), ("cd", 2), ("a", 1), ("bcd", 3),
             ("b", 1), ("c", 1), ("d", 1)],
            "piece string, s long",
        )
        seq2 = viterbi_segment(words2, scores2).collect()[0]["seq"]
        assert seq2 == "ab cd"

    def test_seed_scores_weighted_occurrences(self, spark):
        s = {
            r["piece"]: r["s"]
            for r in seed_scores(
                _words_df(spark, {"aa": 3}), max_piece_len=2, min_count=1
            ).collect()
        }
        # 'a' occurs twice per word instance, 'aa' once
        assert s == {"a": 6, "aa": 3}

    def test_enumeration_guard(self, spark):
        with pytest.raises(ValueError, match="enumeration guard"):
            viterbi_segment(
                _words_df(spark, {"a" * 20: 1}),
                spark.createDataFrame([("a", 1)], "piece string, s long"),
            )


class TestEnsureCoverage:
    def test_unseen_chars_segment_at_zero_score(self, spark):
        """A stored model trained without 'z' must still segment 'zab'
        after the coverage union -- 'z' as a zero-familiarity char
        piece, known pieces still preferred by score."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.unigram import (
            ensure_coverage,
        )

        scores = spark.createDataFrame(
            [("ab", 5), ("a", 2), ("b", 2)], "piece string, s long"
        )
        new_words = _words_df(spark, {"zab": 1})
        with pytest.raises(ValueError):
            # without coverage the word stalls: no segmentation exists
            seqs = viterbi_segment(new_words, scores).collect()
            if not seqs:  # enumeration yields nothing -> paths[0] empty
                raise ValueError("no segmentation")
        cov = ensure_coverage(scores, new_words)
        seq = viterbi_segment(new_words, cov).collect()[0]["seq"]
        assert seq == "z ab"
        # idempotent on covered vocabularies
        assert ensure_coverage(cov, new_words).count() == cov.count()


class TestViterbiCostsDp:
    def test_dp_costs_equal_enumeration_on_seeded_sweep(self, spark):
        """The positional DP's (np, ssum) must equal the enumeration's
        best on every word of a random corpus."""
        import random

        from dataworks_aws_corporate_data_ingestion_spark.operators.unigram import (
            viterbi_costs_dp,
        )

        rng = random.Random(20240816)
        words = sorted(
            {
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 8)))
                for _ in range(25)
            }
        )
        pieces = sorted(
            {"a", "b"}
            | {
                "".join(rng.choice("ab") for _ in range(rng.randint(2, 3)))
                for _ in range(6)
            }
        )
        scores_rows = [(p, rng.randint(1, 50)) for p in pieces]
        scores = spark.createDataFrame(scores_rows, "piece string, s long")
        wdf = _words_df(spark, {w: 1 for w in words})
        dp = {
            r["word"]: (r["np"], r["ssum"])
            for r in viterbi_costs_dp(wdf, scores).collect()
        }
        smap = dict(scores_rows)
        want = {}
        for w in words:
            segs = _ref_segmentations(w, set(smap))
            best = min(
                segs,
                key=lambda s: (len(s), -sum(smap[p] for p in s)),
            )
            want[w] = (len(best), sum(smap[p] for p in best))
        assert dp == want

    def test_dp_handles_words_beyond_enumeration_guard(self, spark):
        """A 100-char word segments fine in the DP (the enumeration
        guard would refuse): 50 'ab' pieces beat 100 chars."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.unigram import (
            viterbi_costs_dp,
        )

        word = "ab" * 50
        scores = spark.createDataFrame(
            [("a", 1), ("b", 1), ("ab", 10)], "piece string, s long"
        )
        got = viterbi_costs_dp(
            _words_df(spark, {word: 1}), scores
        ).collect()[0]
        assert (got["np"], got["ssum"]) == (50, 500)
