"""Sources and sinks: parquet/CSV/JSON readers, glob-union scans,
object-store paths, JDBC + report sinks, and the streaming file
source that replaces the reference's queue-driven loop."""

from etl_jobs_spark.sources.readers import (  # noqa: F401
    FIXTURE_TABLES,
    read_table,
    scan_csv,
    scan_glob_union,
)
from etl_jobs_spark.sources.writers import (  # noqa: F401
    sink_csv,
    sink_jdbc_append,
    sink_json_report,
    sink_parquet,
)
