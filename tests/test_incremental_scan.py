"""Incremental-ingest contract: the high-watermark filter must reach
the parquet scan as a pushed predicate on the STORED column (the raw
nanosecond long), so an incremental run reads the new tail, not the
table."""

from __future__ import annotations

import re

from etl_jobs_spark.queries.sources_sinks import scan_incremental_watermark
from tests.conftest import SF_DIR


def test_watermark_filter_pushes_down(spark):
    plan = (
        scan_incremental_watermark(spark, SF_DIR)
        ._jdf.queryExecution()
        .toString()
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(re.search(r"GreaterThan\(ts,\d+", f) for f in pushed), (
        f"watermark not pushed to scan: {pushed}"
    )
