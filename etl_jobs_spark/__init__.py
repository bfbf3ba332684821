"""etl_jobs_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline repo (ironey/ETL-Jobs):
batch file ingestion, validation with quarantine side-outputs,
cleaning transforms, data-quality aggregation and profiling,
threshold alerting, relational sinks, and an event-driven streaming
mode — plus the large-scale training-data-pipeline operators a
100 TB deployment needs (dedup, similarity search, text analysis,
multimodal column plumbing).

Everything is lazy DataFrame/Column algebra: operators take and
return DataFrames so they chain like the reference's stages, and
Catalyst owns the physical plan (pushdown, pruning, join selection,
AQE). Python UDFs appear only where Column algebra genuinely cannot
express the semantics, and then always as Arrow-batched Pandas UDFs.
"""

__version__ = "0.1.0"
