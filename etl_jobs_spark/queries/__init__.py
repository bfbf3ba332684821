"""Declared queries: importing this package registers every
query/oracle pair with etl_jobs_spark.registry."""

from etl_jobs_spark.queries import (  # noqa: F401
    analytics_ext,
    dedup,
    extensibility,
    multimodal,
    reference_parity,
    relational,
    similarity,
    sources_sinks,
    streaming,
    temporal,
    text_analysis,
)
