"""Edge-case unit tests for the as-of join and sessionization operators
(the workload-level oracle tests cover them end-to-end; these pin the
boundary semantics: inclusivity, ties, empty matches, gap boundaries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dataworks_aws_corporate_data_ingestion_spark.operators.asof import asof_join
from dataworks_aws_corporate_data_ingestion_spark.operators.sessions import sessionize


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        left = spark.createDataFrame(left_rows, "k string, lts timestamp_ntz, lid bigint")
        right = spark.createDataFrame(right_rows, "k string, rts timestamp_ntz, rid bigint")
        out = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["rid"], tiebreak="rid",
        )
        return {r["lid"]: r["rid_asof"] for r in out.collect()}

    def test_backward_inclusive_and_null(self, spark):
        got = self._run(
            spark,
            [("a", _ts(10), 1), ("a", _ts(5), 2), ("a", _ts(0), 3)],
            [("a", _ts(2), 100), ("a", _ts(5), 200), ("a", _ts(20), 300)],
        )
        # lid=1 @12:10 -> rid 200 (@12:05 latest <=); lid=2 @12:05 -> 200
        # (inclusive match at equal ts); lid=3 @12:00 -> no preceding -> None
        assert got == {1: 200, 2: 200, 3: None}

    def test_tie_on_right_ts_takes_largest_tiebreak(self, spark):
        got = self._run(
            spark,
            [("a", _ts(10), 1)],
            [("a", _ts(5), 7), ("a", _ts(5), 9), ("a", _ts(5), 8)],
        )
        assert got == {1: 9}

    def test_keys_do_not_leak(self, spark):
        got = self._run(
            spark,
            [("a", _ts(10), 1), ("b", _ts(10), 2)],
            [("a", _ts(1), 11)],
        )
        assert got == {1: 11, 2: None}


class TestSessionize:
    def test_gap_boundary_is_exclusive(self, spark):
        # events at +0, +30min (== gap: same session), +61min (> gap: new)
        df = spark.createDataFrame(
            [(1, _ts(0), 10), (1, _ts(30), 11), (1, dt.datetime(2024, 1, 1, 13, 1), 12)],
            "user_id bigint, ts timestamp_ntz, event_id bigint",
        )
        out = sessionize(df, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
        got = {r["event_id"]: r["session_no"] for r in out.collect()}
        assert got == {10: 1, 11: 1, 12: 2}

    def test_sessions_per_key_independent(self, spark):
        df = spark.createDataFrame(
            [(1, _ts(0), 10), (2, _ts(0), 20), (2, _ts(59), 21)],
            "user_id bigint, ts timestamp_ntz, event_id bigint",
        )
        out = sessionize(df, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
        got = {r["event_id"]: r["session_no"] for r in out.collect()}
        assert got == {10: 1, 20: 1, 21: 2}


class TestBalanceDecileTwins:
    """Range-bucketing (registered) vs global-ntile (test twin): different
    tie semantics, same partition-of-the-table contract."""

    def test_both_forms_partition_all_customers(self, spark, sf_dir):
        from dataworks_aws_corporate_data_ingestion_spark.workloads.relational3 import (
            customer_balance_deciles,
            customer_balance_deciles_ntile,
        )

        rng = customer_balance_deciles(spark, sf_dir).collect()
        ntl = customer_balance_deciles_ntile(spark, sf_dir).collect()
        assert sum(r.n_customers for r in rng) == sum(r.n_customers for r in ntl)
        assert {r.decile for r in rng} <= set(range(1, 11))
        assert {r.decile for r in ntl} == set(range(1, 11))
        # value-range deciles are ordered: max_bal of decile d <= min of d+1
        by_d = sorted(rng, key=lambda r: r.decile)
        for lo, hi in zip(by_d, by_d[1:]):
            assert lo.max_bal <= hi.min_bal


class TestScd2History:
    def test_intervals_collapse_and_chain(self, spark):
        import datetime as dt

        from dataworks_aws_corporate_data_ingestion_spark.operators.scd import (
            scd2_history,
        )

        t = lambda m: dt.datetime(2024, 1, 1, 10, m)
        df = spark.createDataFrame(
            [
                (1, t(0), 7, "a"),
                (2, t(1), 7, "a"),   # same value: collapses into row 1
                (3, t(2), 7, "b"),   # change
                (4, t(3), 7, "a"),   # back to a: NEW interval, not merged
                (5, t(0), 8, "x"),   # second key
            ],
            "event_id bigint, ts timestamp, user_id bigint, event_type string",
        )
        rows = sorted(
            scd2_history(df, "user_id", "event_type", "ts", "event_id").collect(),
            key=lambda r: (r["user_id"], r["valid_from"]),
        )
        got = [
            (r["user_id"], r["event_type"], r["valid_from"].minute,
             r["valid_to"].minute if r["valid_to"] else None, r["is_current"])
            for r in rows
        ]
        assert got == [
            (7, "a", 0, 2, False),
            (7, "b", 2, 3, False),
            (7, "a", 3, None, True),
            (8, "x", 0, None, True),
        ]

    def test_single_shuffle_plan(self, spark):
        """Both windows and the collapse share the user_id partitioning:
        exactly one hash exchange on user_id in the plan."""
        import datetime as dt

        from dataworks_aws_corporate_data_ingestion_spark.operators.scd import (
            scd2_history,
        )

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 7, "a")],
            "event_id bigint, ts timestamp, user_id bigint, event_type string",
        )
        plan = (
            scd2_history(df, "user_id", "event_type", "ts", "event_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan
