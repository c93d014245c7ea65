"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` exposes every
implemented operator from SURVEY.md section 2 (plus beyond-parity ops);
`oracle_sql()` gives the matching DuckDB SQL for the correctness gate.

All real logic lives in `dataworks_aws_corporate_data_ingestion_spark/`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the full CDI ingest chain
    (envelope parse -> cached-key AES-CTR decrypt -> validate/sanitise ->
    canonical rows) -- the engine's core parity operation."""
    return QUERIES["cdi_ingest_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle
    }


def query_tags() -> dict[str, tuple[str, ...]]:
    """Registry metadata: per-query tags.  Notably `small-scale-only` /
    `ground-truth-twin` mark exact O(n^2)-ish oracle twins kept for
    correctness certification -- their scale-path counterparts are the
    product operators (see README 'Ground-truth twins')."""
    return {name: spec.tags for name, spec in QUERIES.items()}
