"""Exhaustive equivalence for the sequence-automaton fold: every code
sequence of length <= 6 over {0,1,2,3} (5461 sequences) through the
exact Catalyst expression user_sequence_match_counts uses, compared to
a transparent Python reference -- edge cases (empty, all-noise,
back-to-back completions, restarts) included by construction."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

FOLD = """
    aggregate(
        codes,
        CAST(0 AS BIGINT),
        (acc, c) -> acc + CASE
            WHEN c = (acc div 1000000000000) + 1
                 AND (acc div 1000000000000) = 2
                THEN CAST(-1999999999999 AS BIGINT)
            WHEN c = (acc div 1000000000000) + 1
                THEN CAST(1000000000000 AS BIGINT)
            ELSE 0 END)
"""


def _reference(codes):
    stage = cnt = 0
    for c in codes:
        if c == stage + 1:
            if stage == 2:
                cnt += 1
                stage = 0
            else:
                stage += 1
    return cnt, stage


def test_fold_matches_reference_exhaustively(spark):
    seqs = [
        list(s)
        for n in range(0, 7)
        for s in itertools.product(range(4), repeat=n)
    ]
    df = spark.createDataFrame(
        [(i, [int(c) for c in s]) for i, s in enumerate(seqs)],
        "id int, codes array<bigint>",
    )
    out = df.select(
        "id",
        (F.expr(FOLD) % 1000000000000).cast("bigint").alias("n_matches"),
        F.expr(f"({FOLD}) div 1000000000000").cast("bigint").alias("pending_stage"),
    ).collect()
    got = {r["id"]: (r["n_matches"], r["pending_stage"]) for r in out}
    for i, s in enumerate(seqs):
        assert got[i] == _reference(s), f"seq {s}: {got[i]} != {_reference(s)}"
