"""Workload extension modules; importing this package registers every
query into dataworks_aws_corporate_data_ingestion_spark.workload.QUERIES."""

from . import dedup_suite, relational, similarity_search, text_analysis  # noqa: F401
