"""Pinned physical-plan fingerprints for every benched entry (r9 verdict
#6): PLAN_SHAS.json commits the normalised plan_sha of each benched read
query and write-bench probe; this test recomputes the full table and
diffs it, so a plan change in any benched entry fails CI with a readable
per-entry diff instead of surfacing as an ambiguous bench-timing delta.

A legitimate plan change (an optimisation, a Spark upgrade) is recorded
by re-running tools/pin_plan_shas.py in the same commit.  Anything else
failing here means the code started asking the engine for a different
plan -- the regression class no amount of timing noise can hide.

Runs tools/pin_plan_shas.py --check in a SUBPROCESS, not in the pytest
process: plan fingerprints depend on session confs (the shuffle-partition
count is written into every Exchange hashpartitioning node), and the
suite's shared session is deliberately small (local[4], 4 shuffle
partitions) -- getOrCreate inside this process would fingerprint the
test harness's plans, not the plans bench.py times in its own process.
First caught as an order-dependent full-suite failure: green in
isolation (fresh engine session), red after any test had created the
conftest session.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_benched_plan_shas_match_committed_pin():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pin_plan_shas.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0 and "PLAN_PIN_OK" in proc.stdout, (
        "benched plan fingerprints drifted from PLAN_SHAS.json -- if the "
        "plan change is intended, re-run tools/pin_plan_shas.py and commit "
        "the new table with this change.\n"
        f"stdout:\n{proc.stdout}\nstderr (tail):\n{proc.stderr[-2000:]}"
    )
