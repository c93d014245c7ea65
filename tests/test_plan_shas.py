"""Pinned physical-plan fingerprints for every benched entry (r9 verdict
#6): PLAN_SHAS.json commits the normalised plan_sha of each benched read
query and write-bench probe; this test recomputes the full table and
diffs it, so a plan change in any benched entry fails CI with a readable
per-entry diff instead of surfacing as an ambiguous bench-timing delta.

A legitimate plan change (an optimisation, a Spark upgrade) is recorded
by re-running tools/pin_plan_shas.py in the same commit.  Anything else
failing here means the code started asking the engine for a different
plan -- the regression class no amount of timing noise can hide.

Uses the engine session (get_session) because bench.py does: plan shapes
depend on session confs, and the pin must fingerprint the plans the
bench actually times.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_benched_plan_shas_match_committed_pin():
    with open(os.path.join(REPO, "PLAN_SHAS.json")) as f:
        pin = json.load(f)

    from dataworks_aws_corporate_data_ingestion_spark.session import get_session
    from tools.pin_plan_shas import compute_plan_shas

    spark = get_session(app_name="cdi-plan-pin-test")
    spark.sparkContext.setLogLevel("ERROR")
    got = compute_plan_shas(spark, pin["sf_dir"])

    want = pin["plan_shas"]
    missing = sorted(set(want) - set(got))
    unpinned = sorted(set(got) - set(want))
    changed = {
        k: {"pinned": want[k], "now": got[k]}
        for k in set(want) & set(got)
        if want[k] != got[k]
    }
    assert not missing and not unpinned and not changed, (
        "benched plan fingerprints drifted from PLAN_SHAS.json -- if the "
        "plan change is intended, re-run tools/pin_plan_shas.py and commit "
        "the new table with this change.\n"
        f"no-longer-benched-but-pinned: {missing}\n"
        f"benched-but-unpinned: {unpinned}\n"
        f"changed: {json.dumps(changed, indent=1)}"
    )
