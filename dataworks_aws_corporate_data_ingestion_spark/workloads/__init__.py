"""Workload extension modules; importing this package registers every
query into dataworks_aws_corporate_data_ingestion_spark.workload.QUERIES."""

from . import (  # noqa: F401
    analytic,
    cdi_pipeline,
    curation,
    dedup_suite,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    sampling_suite,
    similarity_search,
    streaming_ops,
    text_analysis,
    timeseries_ops,
)
