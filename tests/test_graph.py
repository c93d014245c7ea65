"""Connected components: star-contraction correctness and round bound."""

from __future__ import annotations

import random

from dataworks_aws_corporate_data_ingestion_spark.operators.graph import (
    connected_components,
)


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "a bigint, b bigint")
    return {
        r["node"]: r["component"]
        for r in connected_components(edges, **kw).collect()
    }


class TestConnectedComponents:
    def test_two_components_and_cycle(self, spark):
        # component {1,2,3,4} contains a cycle; {10,11} is separate
        got = _cc(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_duplicate_and_reversed_edges(self, spark):
        got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_long_chain_converges_in_log_rounds(self, spark):
        """A 200-node path is the adversary for min-label propagation
        (O(diameter) rounds); star contraction must finish it within
        max_rounds=10 ~ O(log n).  Shuffled edge order exercises
        partition independence."""
        n = 200
        edges = [(i, i + 1) for i in range(1, n)]
        random.Random(3).shuffle(edges)
        got = _cc(spark, edges, max_rounds=10)
        assert got == {i: 1 for i in range(1, n + 1)}

    def test_component_id_is_graph_minimum(self, spark):
        got = _cc(spark, [(7, 9), (9, 5), (20, 30)])
        assert got == {5: 5, 7: 5, 9: 5, 20: 20, 30: 20}
