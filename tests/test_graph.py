"""Connected components: star-contraction correctness and round bound.

Both execution paths are exercised: the driver union-find fast path
(default for small edge sets) and the distributed star contraction
(forced with local_edge_threshold=None)."""

from __future__ import annotations

import random

import pytest

from dataworks_aws_corporate_data_ingestion_spark.operators.graph import (
    connected_components,
    flag_oversize_components,
)

BOTH_PATHS = pytest.mark.parametrize(
    "threshold", [2_000_000, None], ids=["local-union-find", "star-contraction"]
)


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "a bigint, b bigint")
    return {
        r["node"]: r["component"]
        for r in connected_components(edges, **kw).collect()
    }


class TestConnectedComponents:
    @BOTH_PATHS
    def test_two_components_and_cycle(self, spark, threshold):
        # component {1,2,3,4} contains a cycle; {10,11} is separate
        got = _cc(
            spark,
            [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)],
            local_edge_threshold=threshold,
        )
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    @BOTH_PATHS
    def test_duplicate_and_reversed_edges(self, spark, threshold):
        got = _cc(
            spark,
            [(2, 1), (1, 2), (2, 3), (3, 2)],
            local_edge_threshold=threshold,
        )
        assert got == {1: 1, 2: 1, 3: 1}

    @BOTH_PATHS
    def test_long_chain_converges_in_log_rounds(self, spark, threshold):
        """A 200-node path is the adversary for min-label propagation
        (O(diameter) rounds); star contraction must finish it within
        max_rounds=10 ~ O(log n).  Shuffled edge order exercises
        partition independence."""
        n = 200
        edges = [(i, i + 1) for i in range(1, n)]
        random.Random(3).shuffle(edges)
        got = _cc(spark, edges, max_rounds=10, local_edge_threshold=threshold)
        assert got == {i: 1 for i in range(1, n + 1)}

    @BOTH_PATHS
    def test_component_id_is_graph_minimum(self, spark, threshold):
        got = _cc(spark, [(7, 9), (9, 5), (20, 30)], local_edge_threshold=threshold)
        assert got == {5: 5, 7: 5, 9: 5, 20: 20, 30: 20}

    @BOTH_PATHS
    def test_pathological_clique_converges_immediately(self, spark, threshold):
        """The 'everything similar to everything' adversary: a K30 clique
        must collapse within 3 star rounds (density is the EASY case for
        star contraction -- the guard concern is policy, not compute)."""
        n = 30
        edges = [(i, j) for i in range(1, n + 1) for j in range(i + 1, n + 1)]
        random.Random(7).shuffle(edges)
        got = _cc(spark, edges, max_rounds=3, local_edge_threshold=threshold)
        assert got == {i: 1 for i in range(1, n + 1)}

    def test_wide_string_ids_take_distributed_path(self, spark):
        """The local fast-path gate is a BYTE budget, not just an edge
        count: a tiny edge set of very wide string node ids must fall
        through to star contraction even when the count is far under the
        edge threshold (verdict r4 #6 -- 2M wide-id edges could be GBs of
        driver heap)."""
        wide = {i: f"node-{i:04d}-" + "x" * 2000 for i in range(6)}
        pairs = [(wide[0], wide[1]), (wide[1], wide[2]), (wide[4], wide[5])]
        edges = spark.createDataFrame(pairs, "a string, b string")
        # byte budget below the ~12KB of cell bytes: local path must be
        # rejected; correctness must be unaffected (star contraction)
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                edges, local_edge_threshold=2_000_000, local_byte_budget=4096
            ).collect()
        }
        assert got == {
            wide[0]: wide[0],
            wide[1]: wide[0],
            wide[2]: wide[0],
            wide[4]: wide[4],
            wide[5]: wide[4],
        }
        # and the same graph under a roomy budget stays on the local path
        # with identical labels
        roomy = {
            r["node"]: r["component"]
            for r in connected_components(
                edges, local_edge_threshold=2_000_000
            ).collect()
        }
        assert roomy == got

    def test_paths_agree_on_random_graph(self, spark):
        """Label-for-label equivalence of the two paths on a random
        multi-component graph."""
        rng = random.Random(11)
        edges = [
            (rng.randrange(500), rng.randrange(500)) for _ in range(300)
        ]
        local = _cc(spark, edges, local_edge_threshold=10**9)
        dist = _cc(spark, edges, local_edge_threshold=None)
        assert local == dist


class TestOversizeGuard:
    def test_flags_giant_cluster_only(self, spark):
        # one K12 boilerplate blob + one organic pair
        clique = [(i, j) for i in range(1, 13) for j in range(i + 1, 13)]
        edges = spark.createDataFrame(
            clique + [(100, 101)], "a bigint, b bigint"
        )
        members = connected_components(edges)
        flagged = {
            r["node"]: (r["cluster_size"], r["oversize"])
            for r in flag_oversize_components(members, cap=10).collect()
        }
        for node in range(1, 13):
            assert flagged[node] == (12, True)
        assert flagged[100] == (2, False)
        assert flagged[101] == (2, False)


class TestCollapseNearDupClusters:
    def test_oversize_cluster_surfaced_not_collapsed(self, spark):
        """The curation collapse policy: organic clusters keep their
        minimum-id representative; a cluster past the cap is degenerate
        and contributes NO rows at all (drop-for-review, never a silent
        collapse to one survivor)."""
        from dataworks_aws_corporate_data_ingestion_spark.workloads.curation import (
            collapse_near_dup_clusters,
        )

        # docs 1-12: one K12 boilerplate blob; 100/101: organic pair;
        # 500: isolated (never appears in pairs)
        clique = [(i, j) for i in range(1, 13) for j in range(i + 1, 13)]
        pairs = spark.createDataFrame(clique + [(100, 101)], "a bigint, b bigint")
        docs = spark.createDataFrame(
            [(i,) for i in list(range(1, 13)) + [100, 101, 500]],
            "doc_id bigint",
        )
        clusters = connected_components(pairs)
        kept = sorted(
            r["doc_id"]
            for r in collapse_near_dup_clusters(docs, clusters, cap=10).collect()
        )
        # blob (cluster size 12 > 10) fully dropped; pair keeps min id;
        # isolated doc passes through
        assert kept == [100, 500]

    def test_under_cap_keeps_one_representative(self, spark):
        from dataworks_aws_corporate_data_ingestion_spark.workloads.curation import (
            collapse_near_dup_clusters,
        )

        pairs = spark.createDataFrame([(3, 7), (7, 9)], "a bigint, b bigint")
        docs = spark.createDataFrame([(i,) for i in (3, 7, 9, 42)], "doc_id bigint")
        clusters = connected_components(pairs)
        kept = sorted(
            r["doc_id"]
            for r in collapse_near_dup_clusters(docs, clusters, cap=10).collect()
        )
        assert kept == [3, 42]
