"""Live HTTP exposition endpoint (VERDICT r13 item 7).

Reference parity: src/etl_2025.py:268 starts a live Prometheus
exposition server; this pins that the engine's oracle-checked
exposition CONTENT (obs_prometheus_text) is actually scrapeable from
a bound port, not just printable."""

from __future__ import annotations

import urllib.error
import urllib.request

from etl_jobs_spark.metrics_http import (
    CONTENT_TYPE,
    exposition_text,
    serve_exposition,
)
from etl_jobs_spark.queries.observability_ext import obs_prometheus_text
from tests.conftest import SF_DIR


def test_exposition_served_over_http(spark):
    df = obs_prometheus_text(spark, SF_DIR)
    expected = exposition_text(df)
    srv = serve_exposition(df)
    try:
        url = f"http://127.0.0.1:{srv.port}/metrics"
        with urllib.request.urlopen(url, timeout=10) as resp:
            body = resp.read().decode("utf-8")
            ctype = resp.headers["Content-Type"]
        assert ctype == CONTENT_TYPE
        assert body == expected
        # exposition shape: one etl_<metric> <value> line per counter
        lines = [ln for ln in body.splitlines() if ln]
        assert len(lines) == 3
        assert all(ln.startswith("etl_rows_") for ln in lines), lines
        got = dict(ln.split(" ", 1) for ln in lines)
        total = int(got["etl_rows_total"])
        valid = int(got["etl_rows_valid"])
        failed = int(got["etl_rows_failed"])
        assert total == valid + failed and total > 0
        # counter refresh between scrapes (the long-running-pipeline
        # contract): update() swaps the payload atomically
        srv.update("etl_rows_total 0\n")
        with urllib.request.urlopen(url, timeout=10) as resp:
            assert resp.read().decode("utf-8") == "etl_rows_total 0\n"
        # non-metrics paths 404 instead of leaking the payload
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/other", timeout=10
            )
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
