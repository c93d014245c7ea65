"""Every registered query with an oracle must match DuckDB exactly --
this mirrors the driver's CORRECTNESS gate (row count + columns + values)."""

from __future__ import annotations

import pytest

from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES

from tests.oracle_utils import compare, run_oracle

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    got = spec.fn(spark, sf_dir)
    want = run_oracle(spec.oracle, sf_dir)
    compare(got, want)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_query_runs(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


class TestMergeSnapshotProperties:
    """Property-based check of the union+window merge against a pure
    Python model: for EVERY key, the surviving db_type is the minimum
    (DELETE beats INSERT -- the reference's delete rule), the surviving
    val belongs to some row of that winning db_type, and no key is lost
    or invented.  Random key overlap between snapshot and dailies
    exercises snapshot-only / daily-only / both-sides keys."""

    def test_merge_matches_model(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from dataworks_aws_corporate_data_ingestion_spark.operators.merge import (
            merge_snapshot,
        )

        row = st.tuples(
            st.integers(0, 12),                      # key space, forces collisions
            st.sampled_from(["INSERT", "DELETE"]),
            st.integers(0, 99),                      # value payload
        )

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(rows=st.lists(row, min_size=1, max_size=30), split=st.integers(0, 30))
        def run(rows, split):
            def df(part):
                data = [
                    (f"k{k:02d}", t, f"v{v}", f"k{k:02d}"[:2]) for k, t, v in part
                ] or [("__none", "INSERT", "x", "__")]
                return spark.createDataFrame(
                    data, "id string, db_type string, val string, id_part string"
                )

            snap_rows, daily_rows = rows[:split], rows[split:]
            merged = {
                r["id"]: (r["db_type"], r["val"])
                for r in merge_snapshot(df(snap_rows), df(daily_rows)).collect()
                if r["id"] != "__none"
            }
            model: dict = {}
            for k, t, v in rows:
                model.setdefault(f"k{k:02d}", []).append((t, f"v{v}"))
            assert set(merged) == set(model)
            for key, got in merged.items():
                want_type = min(t for t, _ in model[key])
                assert got[0] == want_type
                assert got[1] in {v for t, v in model[key] if t == want_type}

        run()


class TestRegistryCli:
    """Smoke tests for the no-code query runner and tag-filtered registry
    report (README: Registry CLI)."""

    def test_list_filters_by_tag(self):
        import subprocess
        import sys

        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "dataworks_aws_corporate_data_ingestion_spark.workload",
                "list",
                "--tag",
                "aggregation",
            ],
            capture_output=True,
            text=True,
            timeout=120,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-1000:]
        names = [ln.split("\t")[0] for ln in proc.stdout.splitlines() if ln]
        assert "q1_pricing_summary" in names
        assert 0 < len(names) < 148

    def test_run_rejects_unknown_query(self):
        import subprocess
        import sys

        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "dataworks_aws_corporate_data_ingestion_spark.workload",
                "run",
                "no_such_query",
            ],
            capture_output=True,
            text=True,
            timeout=120,
            cwd="/root/repo",
        )
        assert proc.returncode == 2
        assert "invalid choice" in proc.stderr

    def test_registry_report_tag_filter(self):
        import subprocess
        import sys

        proc = subprocess.run(
            [sys.executable, "tools/registry_report.py", "--tag", "similarity"],
            capture_output=True,
            text=True,
            timeout=120,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-1000:]
        assert "queries match tag 'similarity'" in proc.stdout
        assert "ann_pq_topk" in proc.stdout


class TestCliModuleEntry:
    def test_dash_m_list_sees_full_registry(self):
        """`python -m ...workload list` must expose EVERY registered
        query, not just the five core entries -- regression for the
        __main__ double-module-instance trap (workloads/ submodules
        register into the canonical module, not the __main__ copy)."""
        import subprocess
        import sys

        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "dataworks_aws_corporate_data_ingestion_spark.workload",
                "list",
            ],
            capture_output=True,
            text=True,
            timeout=120,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-1000:]
        names = {line.split("\t")[0] for line in proc.stdout.splitlines()}
        assert len(names) > 150, f"only {len(names)} queries visible via -m"
        assert "per_source_ngram_novelty" in names
        assert "q18_large_orders" in names
