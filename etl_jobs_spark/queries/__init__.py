"""Declared queries: importing this package registers every
query/oracle pair with etl_jobs_spark.registry."""

from etl_jobs_spark.queries import reference_parity, relational  # noqa: F401
