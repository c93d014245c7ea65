"""BPE vocabulary induction (operators/bpe.py).

The oracle gate proves Spark == DuckDB on the same recurrence; these
tests prove the recurrence IS byte-pair encoding: a hand-worked example
and a seeded sweep against a sequential greedy-left reference
implementation (the textbook BPE trainer loop).
"""

from __future__ import annotations

import random
from collections import Counter

from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
    bpe_merge_table,
)


def _ref_bpe(texts: list[str], k: int):
    """Sequential reference: count adjacent pairs, fuse the most
    frequent greedy-left (ties on (w1, w2) byte order), repeat."""
    seqs = [t.lower().split(" ") for t in texts]
    out = []
    for r in range(1, k + 1):
        c: Counter = Counter()
        for toks in seqs:
            for i in range(len(toks) - 1):
                c[(toks[i], toks[i + 1])] += 1
        if not c:
            break
        (w1, w2), cnt = sorted(
            c.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        out.append((r, w1, w2, cnt, w1 + "+" + w2))
        fused_seqs = []
        for toks in seqs:
            res, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == w1
                    and toks[i + 1] == w2
                ):
                    res.append(w1 + "+" + w2)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            fused_seqs.append(res)
        seqs = fused_seqs
    return out


def _run(spark, texts, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return sorted(
        tuple(r) for r in bpe_merge_table(df, k=k).collect()
    )


class TestBpeMergeTable:
    def test_hand_worked_example(self, spark):
        texts = ["a b a b c", "a b c d"]
        got = _run(spark, texts, 4)
        assert got == sorted(_ref_bpe(texts, 4))
        assert got[:3] == [
            (1, "a", "b", 3, "a+b"),
            (2, "a+b", "c", 2, "a+b+c"),
            # round 3 is a count tie; (a+b, a+b+c) < (a+b+c, d) byte-wise
            (3, "a+b", "a+b+c", 1, "a+b+a+b+c"),
        ]

    def test_greedy_left_run_semantics(self, spark):
        """BPE fuses "x x x x x" greedy-left: two fused pairs and a
        lone survivor -- the doubled-separator replace must not fuse
        overlapping occurrences."""
        got = _run(spark, ["x x x x x"], 2)
        ref = sorted(_ref_bpe(["x x x x x"], 2))
        assert got == ref
        assert got[0] == (1, "x", "x", 4, "x+x")

    def test_matches_sequential_reference_seeded_sweep(self, spark):
        rng = random.Random(0xBEEF)
        vocab = ["a", "b", "c", "ab"]
        for case in range(6):
            texts = [
                " ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 12))
                )
                for _ in range(rng.randint(2, 6))
            ]
            got = _run(spark, texts, 3)
            ref = sorted(_ref_bpe(texts, 3))
            assert got == ref, (case, texts)

    def test_pair_exhausted_corpus_truncates(self, spark):
        """Single-token docs have no adjacent pairs: training emits no
        merges (never fabricates), and a corpus that exhausts its pairs
        mid-run truncates the merge table instead of looping."""
        assert _run(spark, ["a", "b", "c"], 3) == []
        # "a b" fuses round 1 into one token; rounds 2-3 have no pairs
        got = _run(spark, ["a b"], 3)
        assert got == [(1, "a", "b", 1, "a+b")]


class TestBpeIncrementalCounting:
    """The maintained-delta pair-count path (incremental=True; measured
    slower and non-default, kept as a pinned-equal alternative) must be
    bit-identical to the naive full recount: the
    count table after applying delta = counts(fused affected) -
    counts(affected) equals a fresh recount of the fused corpus, so
    the selected merge sequence cannot drift."""

    def _both(self, spark, texts, k):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        inc = sorted(
            tuple(r)
            for r in bpe_merge_table(df, k=k, incremental=True).collect()
        )
        full = sorted(
            tuple(r)
            for r in bpe_merge_table(df, k=k, incremental=False).collect()
        )
        return inc, full

    def test_incremental_equals_full_recount_seeded_sweep(self, spark):
        rng = random.Random(0xFADE)
        vocab = ["a", "b", "c", "ab", "ba"]
        for case in range(5):
            texts = [
                " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(1, 14))
                )
                for _ in range(rng.randint(2, 7))
            ]
            inc, full = self._both(spark, texts, 5)
            assert inc == full, (case, texts)
            assert inc == sorted(_ref_bpe(texts, 5)), (case, texts)

    def test_incremental_deep_k_exhaustion(self, spark):
        """k far beyond the pair supply: both paths truncate at the
        same round with identical tables."""
        texts = ["a b a b", "b a"]
        inc, full = self._both(spark, texts, 12)
        assert inc == full == sorted(_ref_bpe(texts, 12))

    def test_incremental_apply_matches_full(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            bpe_apply,
        )

        texts = ["a b a b c", "a b c d", "x x x x x", "a"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        inc = sorted(
            tuple(r) for r in bpe_apply(df, k=3, incremental=True).collect()
        )
        full = sorted(
            tuple(r) for r in bpe_apply(df, k=3, incremental=False).collect()
        )
        assert inc == full
        assert len(inc) == len(texts)  # no doc dropped (incl. pair-free)


class TestBpeSegment:
    """Stored-merge-table apply path (operators/bpe.py::bpe_segment):
    unrolled literal replaces over NEW text, never a training pass."""

    def _df(self, spark, texts, start=0):
        return spark.createDataFrame(
            [(start + i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )

    def test_segment_equals_apply_on_training_corpus(self, spark):
        """Segmenting the training corpus under its own merge table must
        reproduce bpe_apply bit for bit (same greedy-left fuse chain)."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            bpe_apply,
            bpe_segment,
        )

        texts = ["a b a b c", "a b c d", "b c b c b c", "x", ""]
        df = self._df(spark, texts)
        merges = bpe_merge_table(df, k=4)
        seg = sorted(tuple(r) for r in bpe_segment(df, merges).collect())
        app = sorted(tuple(r) for r in bpe_apply(df, k=4).collect())
        assert seg == app

    def test_segment_new_text_hand_example(self, spark):
        """Merges (a,b) then (a+b,c) learned elsewhere, applied to text
        the trainer never saw: greedy-left, round order respected."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            bpe_segment,
        )

        train = self._df(spark, ["a b a b c", "a b c d"])
        merges = bpe_merge_table(train, k=2)
        assert [tuple(r)[:3] for r in sorted(
            merges.collect(), key=lambda r: r.merge_round
        )] == [(1, "a", "b"), (2, "a+b", "c")]

        new = self._df(spark, ["a b c a b a", "c a b", "d d", "a a b"], start=100)
        got = {r.doc_id: r.t for r in bpe_segment(new, merges).collect()}
        assert got == {
            100: "a+b+c a+b a",  # both merges fire, in order
            101: "c a+b",        # merge 1 only: merge 2 needs c AFTER a+b
            102: "d d",          # untouched
            103: "a a+b",        # greedy-left: second (a,b) fuses, leading a survives
        }

    def test_segment_empty_merge_table(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            bpe_segment,
        )

        df = self._df(spark, ["A B c"])
        merges = bpe_merge_table(df, k=1).filter("merge_round > 1")  # empty
        got = bpe_segment(df, merges).collect()
        assert [(r.doc_id, r.t) for r in got] == [(0, "a b c")]  # lowercased only


def _ref_block_greedy(texts: list[str], k: int, batch: int):
    """Sequential reference of the BLOCK-GREEDY spec: per pass rank the
    snapshot's pair counts, pick up to `batch` mutually token-disjoint
    pairs greedily by rank, fuse them all (rank order; disjointness
    makes order immaterial), repeat."""
    seqs = [t.lower().split(" ") for t in texts]
    out = []
    while len(out) < k:
        c: Counter = Counter()
        for toks in seqs:
            for i in range(len(toks) - 1):
                c[(toks[i], toks[i + 1])] += 1
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        sels, used = [], set()
        for (w1, w2), cnt in ranked:
            if len(sels) == min(batch, k - len(out)):
                break
            if w1 in used or w2 in used:
                continue
            sels.append((w1, w2, cnt))
            used.update((w1, w2))
        if not sels:
            break
        for w1, w2, cnt in sels:
            out.append((len(out) + 1, w1, w2, cnt, w1 + "+" + w2))
        for w1, w2, _ in sels:
            fused_seqs = []
            for toks in seqs:
                res, i = [], 0
                while i < len(toks):
                    if (
                        i + 1 < len(toks)
                        and toks[i] == w1
                        and toks[i + 1] == w2
                    ):
                        res.append(w1 + "+" + w2)
                        i += 2
                    else:
                        res.append(toks[i])
                        i += 1
                fused_seqs.append(res)
            seqs = fused_seqs
    return out


class TestBpeBlockGreedy:
    """Block-greedy trainer (operators/bpe.py::bpe_merge_table_batched):
    up to `batch` token-disjoint merges per corpus pass."""

    def _run(self, spark, texts, k, batch):
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            bpe_merge_table_batched,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return sorted(
            tuple(r)
            for r in bpe_merge_table_batched(df, k=k, batch=batch).collect()
        )

    def test_hand_example_disjoint_pairs(self, spark):
        # pass 1 snapshot: (a,b)=3 top; next disjoint is (c,d)=2
        # ((b,c)=2 ranks before (c,d) but shares b with the first pick)
        texts = ["a b c d a b", "a b c d"]
        got = self._run(spark, texts, 2, 2)
        assert got == [(1, "a", "b", 3, "a+b"), (2, "c", "d", 2, "c+d")]
        assert got == sorted(_ref_block_greedy(texts, 2, 2))

    def test_divergence_from_sequential_is_the_spec(self, spark):
        """A case where block-greedy and sequential BPE legitimately
        differ: both pinned against their own references."""
        texts = ["x y x y z w z w", "x y z w"]
        seq = sorted(_ref_bpe(texts, 2))
        blk = self._run(spark, texts, 2, 2)
        assert blk == sorted(_ref_block_greedy(texts, 2, 2))
        # sequential recounts between merges; block-greedy picks both
        # from the pass snapshot -- same pairs here, counts from the
        # snapshot (x,y)=3 and (z,w)=3
        assert blk == seq  # disjoint top pairs: the two agree
        # conflict case: top-2 share a token, block-greedy must skip
        texts2 = ["a b b a a b", "b a a b"]
        blk2 = self._run(spark, texts2, 2, 2)
        assert blk2 == sorted(_ref_block_greedy(texts2, 2, 2))

    def test_seeded_sweep_matches_reference(self, spark):
        rng = random.Random(0xB10C)
        vocab = ["a", "b", "c", "d", "ab"]
        for case in range(4):
            texts = [
                " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(1, 12))
                )
                for _ in range(rng.randint(2, 6))
            ]
            got = self._run(spark, texts, 6, 3)
            assert got == sorted(_ref_block_greedy(texts, 6, 3)), (
                case,
                texts,
            )

    def test_pair_exhaustion_truncates(self, spark):
        texts = ["a b", "b a"]
        got = self._run(spark, texts, 8, 4)
        assert got == sorted(_ref_block_greedy(texts, 8, 4))
        assert len(got) <= 8


def _ref_wordpiece(texts: list[str], k: int):
    """Sequential WordPiece reference: fuse the pair maximising
    count(ab)/(count(a)*count(b)), ties on (pair_count DESC, w1, w2)."""
    seqs = [t.lower().split(" ") for t in texts]
    out = []
    for r in range(1, k + 1):
        pc: Counter = Counter()
        ug: Counter = Counter()
        for toks in seqs:
            ug.update(toks)
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += 1
        if not pc:
            break
        (w1, w2), cnt = sorted(
            pc.items(),
            key=lambda kv: (
                -(kv[1] / (ug[kv[0][0]] * ug[kv[0][1]])),
                -kv[1],
                kv[0],
            ),
        )[0]
        score = cnt / (ug[w1] * ug[w2])
        out.append((r, w1, w2, cnt, score, w1 + "+" + w2))
        fused_seqs = []
        for toks in seqs:
            res, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == w1
                    and toks[i + 1] == w2
                ):
                    res.append(w1 + "+" + w2)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            fused_seqs.append(res)
        seqs = fused_seqs
    return out


class TestWordPieceMergeTable:
    def test_likelihood_beats_frequency(self, spark):
        """'zig zag' (count 2, both parts occurring ONLY here: score
        0.5) must win round 1 over the equally-frequent 'the cat'
        (score 2/(3*2)); plain BPE picks 'the cat' on the byte-order
        tie -- the two trainers demonstrably diverge on this corpus."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            wordpiece_merge_table,
        )

        texts = [
            "the cat sat", "the dog sat", "the cat ran", "zig zag",
            "zig zag",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        got = sorted(
            tuple(r) for r in wordpiece_merge_table(df, k=3).collect()
        )
        assert got == sorted(_ref_wordpiece(texts, 3))
        assert got[0][1:3] == ("zig", "zag")
        bpe_first = _run(spark, texts, 1)[0]
        assert bpe_first[1:3] == ("the", "cat")

    def test_seeded_sweep_matches_sequential_reference(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            wordpiece_merge_table,
        )

        rng = random.Random(20240816)
        words = ["ab", "cd", "ef", "gh", "ij", "kl"]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(2, 9)))
            for _ in range(30)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        got = sorted(
            tuple(r) for r in wordpiece_merge_table(df, k=4).collect()
        )
        assert got == sorted(_ref_wordpiece(texts, 4))

    def test_likelihood_rejects_incremental(self, spark):
        import pytest as _pytest

        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            _train,
        )

        df = spark.createDataFrame(
            [(0, "a b")], "doc_id bigint, t string"
        ).select("doc_id", "t")
        with _pytest.raises(ValueError, match="naive counting"):
            _train(df, 1, fuse_last=False, incremental=True,
                   likelihood=True)


def _ref_wp_block_greedy(texts: list[str], k: int, batch: int):
    """Sequential reference of the block-greedy WORDPIECE spec: per pass
    score every snapshot pair count(ab)/(count(a)count(b)), rank by
    (score DESC, pair_count DESC, w1, w2), pick up to `batch` mutually
    token-disjoint pairs greedily by rank, fuse them all."""
    seqs = [t.lower().split(" ") for t in texts]
    out = []
    while len(out) < k:
        pc: Counter = Counter()
        ug: Counter = Counter()
        for toks in seqs:
            ug.update(toks)
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += 1
        ranked = sorted(
            pc.items(),
            key=lambda kv: (
                -(kv[1] / (ug[kv[0][0]] * ug[kv[0][1]])),
                -kv[1],
                kv[0],
            ),
        )
        sels, used = [], set()
        for (w1, w2), cnt in ranked:
            if len(sels) == min(batch, k - len(out)):
                break
            if w1 in used or w2 in used:
                continue
            sels.append((w1, w2, cnt, cnt / (ug[w1] * ug[w2])))
            used.update((w1, w2))
        if not sels:
            break
        for w1, w2, cnt, score in sels:
            out.append((len(out) + 1, w1, w2, cnt, score, w1 + "+" + w2))
        for w1, w2, _, _ in sels:
            fused_seqs = []
            for toks in seqs:
                res, i = [], 0
                while i < len(toks):
                    if (
                        i + 1 < len(toks)
                        and toks[i] == w1
                        and toks[i + 1] == w2
                    ):
                        res.append(w1 + "+" + w2)
                        i += 2
                    else:
                        res.append(toks[i])
                        i += 1
                fused_seqs.append(res)
            seqs = fused_seqs
    return out


class TestWordPieceBlockGreedy:
    """Block-greedy WordPiece (operators/bpe.py::
    wordpiece_merge_table_batched): up to `batch` token-disjoint
    likelihood-selected merges per corpus pass.  Disjointness makes
    each pick's score invariant under the pass's other fuses, so the
    recorded (pair_count, score) are true at-fuse-time values."""

    def _run(self, spark, texts, k, batch):
        from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
            wordpiece_merge_table_batched,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return sorted(
            tuple(r)
            for r in wordpiece_merge_table_batched(
                df, k=k, batch=batch
            ).collect()
        )

    def test_hand_example_score_order_not_frequency_order(self, spark):
        """'zig zag' (score 0.5, count 2) wins round 1 over the equally
        -frequent 'the cat' (score 2/6) -- likelihood order, not
        frequency order.  The pass's second pick is the score-0.5
        count-1 'cat ran' (ties 'zig zag' on score, loses on count;
        disjoint from it, so it survives the exclusion), NOT the more
        frequent 'the cat'."""
        texts = [
            "the cat sat", "the dog sat", "the cat ran", "zig zag",
            "zig zag",
        ]
        got = self._run(spark, texts, 2, 2)
        ref = sorted(_ref_wp_block_greedy(texts, 2, 2))
        assert got == ref
        by_round = {r[0]: r for r in got}
        assert by_round[1][1:3] == ("zig", "zag")
        assert by_round[2][1:3] == ("cat", "ran")

    def test_disjointness_skips_shared_token(self, spark):
        """When rank-2 shares a token with rank-1, the pass must skip
        to the best disjoint pair, exactly like the BPE block-greedy."""
        texts = ["a b b c d e", "a b b c d e", "b c"]
        got = self._run(spark, texts, 2, 2)
        assert got == sorted(_ref_wp_block_greedy(texts, 2, 2))
        used = {t for r in got for t in (r[1], r[2])}
        assert len(used) == 4  # two fully disjoint pairs

    def test_seeded_sweep_matches_reference(self, spark):
        rng = random.Random(0x5C04E)
        vocab = ["ab", "cd", "ef", "gh", "ij"]
        for case in range(4):
            texts = [
                " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(1, 10))
                )
                for _ in range(rng.randint(2, 8))
            ]
            got = self._run(spark, texts, 6, 3)
            assert got == sorted(_ref_wp_block_greedy(texts, 6, 3)), (
                case,
                texts,
            )

    def test_pair_exhaustion_truncates(self, spark):
        texts = ["a b", "b a"]
        got = self._run(spark, texts, 8, 4)
        assert got == sorted(_ref_wp_block_greedy(texts, 8, 4))
        assert len(got) <= 8
