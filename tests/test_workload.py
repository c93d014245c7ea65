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
