"""BM25 search layer: postings-index invariants and a pure-Python
cross-check of the end-to-end scoring."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.search import (
    bm25_search,
    build_postings,
    corpus_stats,
    term_stats,
)
from dataworks_aws_corporate_data_ingestion_spark.sources.tables import load_table


def _index(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    postings = build_postings(docs)
    return docs, postings


def test_postings_conserve_token_mass(spark, sf_dir):
    docs, postings = _index(spark, sf_dir)
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("n")
    ).collect()[0]["n"]
    tf_mass = postings.agg(F.sum("tf").alias("n")).collect()[0]["n"]
    assert tf_mass == total_tokens
    # postings are distinct per (doc, term)
    n = postings.count()
    assert postings.select("doc_id", "term").distinct().count() == n


def test_df_and_stats_consistent(spark, sf_dir):
    docs, postings = _index(spark, sf_dir)
    dfs = {r["term"]: r["df"] for r in term_stats(postings).collect()}
    # df of a term == docs whose token set contains it
    probe = "join"
    expected = docs.filter(
        F.array_contains(F.split(F.lower("text"), " "), probe)
    ).count()
    assert dfs[probe] == expected
    stats = corpus_stats(postings).collect()[0]
    assert stats["n_docs"] == docs.count()


def test_bm25_matches_python_reference(spark, sf_dir):
    """Score every doc for a 2-term query in plain Python (exact same
    formula, term-sorted fold) and compare the engine's full ranking."""
    docs, postings = _index(spark, sf_dir)
    terms = ("dup", "join")
    rows = docs.select("doc_id", F.lower("text").alias("t")).collect()
    toks = {r["doc_id"]: r["t"].split(" ") for r in rows}
    n_docs = len(toks)
    sum_dl = sum(len(v) for v in toks.values())
    avgdl = float(sum_dl) / float(n_docs)
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}

    def score(doc):
        s = 0.0
        for t in sorted(terms):
            tf = toks[doc].count(t)
            if tf == 0:
                continue
            idf = (float(n_docs) - float(df[t]) + 0.5) / (float(df[t]) + 0.5)
            s += idf * (float(tf) * 2.2) / (
                float(tf) + 1.2 * (0.25 + 0.75 * (float(len(toks[doc])) / avgdl))
            )
        return s

    expected = sorted(
        ((score(d), d) for d in toks if score(d) > 0.0),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    got = bm25_search(
        postings, term_stats(postings), corpus_stats(postings), terms, k=10
    ).collect()
    assert [(r["doc_id"]) for r in got] == [d for _, d in expected]
    for (exp_s, _), r in zip(expected, got):
        assert math.isclose(r["bm25"], exp_s, rel_tol=0, abs_tol=1e-12)
