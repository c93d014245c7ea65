"""Physical-plan regression guards over the whole query registry.

Planning only (no execution): catches a future edit that introduces a
cartesian product, a row-at-a-time Python UDF, or strips the pushdown
from a scan-heavy query.
"""

from __future__ import annotations

import pytest

from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_row_python(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    # BatchEvalPython = row-pickled UDF; ArrowEvalPython (vectorised) is fine
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_pushdown_reaches_scans(spark):
    """Spot-check the scan-heavy queries keep their PushedFilters."""
    for name in ("q1_pricing_summary", "q6_discount_revenue", "q19_disjunctive_revenue"):
        plan = _plan(spark, name)
        assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan.split(
            "PushedFilters:"
        )[1][:4], f"{name} lost its scan pushdown"


def test_topk_uses_take_ordered(spark):
    for name in ("q3_top_unshipped_orders", "q10_returned_items", "q18_large_orders"):
        assert "TakeOrderedAndProject" in _plan(spark, name), (
            f"{name} should plan top-k as TakeOrderedAndProject, not a global sort"
        )


def test_deciles_have_no_global_window_sort(spark):
    """The registered deciles query must be the range-bucketing form: no
    un-partitioned window (= Exchange SinglePartition feeding a Window),
    which would funnel the whole table through one task."""
    plan = _plan(spark, "customer_balance_deciles")
    # the only SinglePartition exchange allowed is the 9-double boundary
    # aggregate; any Window at all means the ntile twin got registered
    assert "Window" not in plan, "deciles regressed to a global window sort"


def test_cdi_python_stages_evaluate_once(spark):
    """Each pandas UDF in the CDI chain must appear EXACTLY once in the
    plan.  A filter on an expanded UDF column gets the expression inlined
    + pushed and the whole upstream Python chain (fixture encrypt +
    envelope parse) runs twice -- the round-3 plan audit measured that
    doubling before envelope_udf became an optimizer barrier
    (asNondeterministic) and quarantine split on the packed struct."""
    for name in ("cdi_ingest_pipeline", "cdi_audit_pipeline"):
        plan = _plan(spark, name)
        n = plan.count("ArrowEvalPython")
        assert n == 3, f"{name}: expected 3 Python stages, found {n}"


def test_asof_pit_form_is_join_free(spark):
    """purchases_point_in_time_asof exists to avoid the join: one window
    over the fact/version union.  Any SortMergeJoin/BroadcastHashJoin
    in its plan means the union trick regressed to a join."""
    plan = _plan(spark, "purchases_point_in_time_asof")
    assert "Join" not in plan, "as-of PIT form regressed to a join"
    assert "Window" in plan
