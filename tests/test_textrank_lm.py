"""Fixed-point PageRank / TextRank (operators/textrank.py) and the
bigram-LM familiarity scorer (operators/ngram_lm.py).

PageRank is pinned against a pure-Python reference implementation of
the same integer recurrence on hand-built graphs; the LM scorer against
hand-computed smoothed counts.
"""

from __future__ import annotations

import pytest

from dataworks_aws_corporate_data_ingestion_spark.operators.ngram_lm import (
    P_SCALE,
    score_documents_bigram_lm,
)
from dataworks_aws_corporate_data_ingestion_spark.operators.textrank import (
    BASE,
    DAMPING_DEN,
    DAMPING_NUM,
    SCALE,
    pagerank_fixed_point,
    textrank_keywords,
    word_cooccurrence_graph,
)


def _pagerank_py(edges: list[tuple[str, str]], iterations: int = 5):
    """Reference: the exact integer recurrence, driver-side."""
    out: dict[str, list[str]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    rank = {n: SCALE for n in out}
    for _ in range(iterations):
        acc = {n: 0 for n in out}
        for u, targets in out.items():
            c = rank[u] // len(targets)
            for v in targets:
                acc[v] += c
        rank = {
            n: BASE + (DAMPING_NUM * s) // DAMPING_DEN
            for n, s in acc.items()
        }
    return rank


class TestPagerankFixedPoint:
    def _edges_df(self, spark, edges):
        return spark.createDataFrame(edges, "src string, dst string")

    def test_symmetric_pair_is_uniform(self, spark):
        # two nodes, one undirected edge: perfectly symmetric, ranks
        # stay at SCALE-ish and equal
        edges = [("a", "b"), ("b", "a")]
        got = {
            r.node: r.rank_micro
            for r in pagerank_fixed_point(
                self._edges_df(spark, edges)
            ).collect()
        }
        assert got == _pagerank_py(edges)
        assert got["a"] == got["b"]

    def test_star_graph_matches_reference(self, spark):
        # hub h connected to 4 spokes: hub must outrank spokes
        spokes = ["s1", "s2", "s3", "s4"]
        edges = [("h", s) for s in spokes] + [(s, "h") for s in spokes]
        got = {
            r.node: r.rank_micro
            for r in pagerank_fixed_point(
                self._edges_df(spark, edges)
            ).collect()
        }
        want = _pagerank_py(edges)
        assert got == want
        assert got["h"] > got["s1"]
        assert len({got[s] for s in spokes}) == 1

    def test_chain_graph_matches_reference(self, spark):
        chain = ["a", "b", "c", "d", "e"]
        edges = []
        for x, y in zip(chain, chain[1:]):
            edges += [(x, y), (y, x)]
        got = {
            r.node: r.rank_micro
            for r in pagerank_fixed_point(
                self._edges_df(spark, edges), iterations=3
            ).collect()
        }
        assert got == _pagerank_py(edges, iterations=3)
        # middle of the chain accumulates rank over the endpoints
        assert got["c"] > got["a"]

    def test_mass_is_conserved_up_to_floor_leak(self, spark):
        # total mass stays within [N*SCALE - leak, N*SCALE]; leak < 1
        # unit per edge-division per iteration plus damping floor
        spokes = ["s1", "s2", "s3"]
        edges = [("h", s) for s in spokes] + [(s, "h") for s in spokes]
        total = sum(
            r.rank_micro
            for r in pagerank_fixed_point(
                self._edges_df(spark, edges)
            ).collect()
        )
        n = 4
        assert total <= n * SCALE
        assert total >= n * SCALE - 5 * (len(edges) + n)


class TestWordGraph:
    def test_symmetric_distinct_no_self_loops(self, spark):
        docs = spark.createDataFrame(
            [(1, "x y x y x x"), (2, "x y z")],
            "doc_id bigint, text string",
        )
        edges = {
            (r.src, r.dst)
            for r in word_cooccurrence_graph(docs, min_count=2).collect()
        }
        # "x y" occurs 3x, "y x" 2x -> edge both ways; "x x" once (self
        # loop dropped anyway); "y z" once -> below min_count
        assert edges == {("x", "y"), ("y", "x")}

    def test_textrank_topk_order_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a b c"), (2, "a b a b d"), (3, "b a b a")],
            "doc_id bigint, text string",
        )
        rows = textrank_keywords(docs, min_count=2, k=5).collect()
        toks = [r.token for r in rows]
        assert set(toks) <= {"a", "b", "c", "d"}
        ranks = [r.rank_micro for r in rows]
        assert ranks == sorted(ranks, reverse=True)


class TestBigramLm:
    def test_hand_computed_two_docs(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c")],
            "doc_id bigint, text string",
        )
        # unigrams: a=3, b=2, c=1 -> V=3
        # bigrams: (a,b)=2, (a,c)=1
        out = {
            r.doc_id: r
            for r in score_documents_bigram_lm(docs).collect()
        }
        p_ab = (P_SCALE * (2 + 1)) // (3 + 3)
        p_ac = (P_SCALE * (1 + 1)) // (3 + 3)
        assert out[1].sum_p_nano == p_ab
        assert out[2].sum_p_nano == p_ab
        assert out[3].sum_p_nano == p_ac
        assert out[1].oov_bigrams == 0
        assert out[1].n_bigrams == 1
        assert out[1].mean_p_nano == pytest.approx(float(p_ab))

    def test_single_token_doc_scores_null_mean(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "solo")], "doc_id bigint, text string"
        )
        out = {
            r.doc_id: r
            for r in score_documents_bigram_lm(docs).collect()
        }
        assert out[2].n_bigrams == 0
        assert out[2].sum_p_nano == 0
        assert out[2].mean_p_nano is None

    def test_oov_bigram_counted_and_smoothed(self, spark):
        # (b,a) never occurs as a bigram -> OOV, but still scores the
        # +1 smoothing mass
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "b a")],
            "doc_id bigint, text string",
        )
        # doc 3 bigram (b,a): c12=1 actually occurs (doc 3 itself)
        out = {
            r.doc_id: r
            for r in score_documents_bigram_lm(docs).collect()
        }
        assert out[3].oov_bigrams == 0  # self-counting: it IS in corpus
        # unigrams: a=3,b=3 V=2; (b,a)=1 -> p=(1e9*2)//(3+2)
        assert out[3].sum_p_nano == (P_SCALE * 2) // 5

    def test_every_doc_present(self, spark):
        docs = spark.createDataFrame(
            [(i, "tok%d tok%d" % (i, i + 1)) for i in range(10)],
            "doc_id bigint, text string",
        )
        assert score_documents_bigram_lm(docs).count() == 10


def _lm_py(docs: dict[int, list[str]]):
    """Pure-Python reference for score_documents_bigram_lm."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in docs.values():
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    v = len(uni)
    out = {}
    for did, toks in docs.items():
        pairs = list(zip(toks, toks[1:]))
        s = sum(
            (P_SCALE * (bi[p] + 1)) // (uni[p[0]] + v) for p in pairs
        )
        out[did] = {
            "n_bigrams": len(pairs),
            "oov_bigrams": sum(1 for p in pairs if bi[p] == 0),
            "sum_p_nano": s,
        }
    return out


class TestLmProperties:
    def test_random_corpora_match_reference(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        vocab = ["a", "b", "c"]
        corpus_strategy = st.lists(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=12),
            min_size=1,
            max_size=6,
        )

        @settings(
            max_examples=20,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(corpus_strategy)
        def check(corpus):
            docs = {i: t for i, t in enumerate(corpus)}
            df = spark.createDataFrame(
                [(i, " ".join(t)) for i, t in docs.items()],
                "doc_id bigint, text string",
            )
            got = {
                r.doc_id: r
                for r in score_documents_bigram_lm(df).collect()
            }
            want = _lm_py(docs)
            for did, w in want.items():
                g = got[did]
                assert g.n_bigrams == w["n_bigrams"], did
                assert g.oov_bigrams == w["oov_bigrams"], did
                assert g.sum_p_nano == w["sum_p_nano"], did

        check()


class TestPagerankProperties:
    def test_random_symmetric_graphs_match_reference(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from tests.test_textrank_lm import _pagerank_py  # self-import ok

        nodes = ["n0", "n1", "n2", "n3", "n4"]
        edge_strategy = st.sets(
            st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)).filter(
                lambda e: e[0] != e[1]
            ),
            min_size=1,
            max_size=10,
        )

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(edge_strategy)
        def check(raw_edges):
            # symmetrise (the operator contract: no dangling nodes)
            edges = sorted({e for p in raw_edges for e in (p, p[::-1])})
            df = spark.createDataFrame(edges, "src string, dst string")
            got = {
                r.node: r.rank_micro
                for r in pagerank_fixed_point(df, iterations=3).collect()
            }
            assert got == _pagerank_py(edges, iterations=3)

        check()
