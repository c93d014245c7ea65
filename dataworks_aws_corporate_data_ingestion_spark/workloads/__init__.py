"""Workload extension modules; importing this package registers every
query into dataworks_aws_corporate_data_ingestion_spark.workload.QUERIES."""

from . import (  # noqa: F401
    analytic,
    approx_exact,
    audit_stats,
    bpe_vocab,
    cdi_pipeline,
    ops_certificates,
    curation,
    dedup_suite,
    multimodal_suite,
    relational,
    relational2,
    relational3,
    relational4,
    provenance,
    relational5,
    sampling_suite,
    sketches,
    similarity_search,
    soak,
    span_dedup,
    streaming_ops,
    text_analysis,
    textrank_lm,
    timeseries_ops,
)
