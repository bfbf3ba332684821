"""Prometheus exposition over a live HTTP endpoint.

Reference parity: src/etl_2025.py:27-29,268 starts
``prometheus_client.start_http_server(8000)`` and serves run
counters for scraping. In this engine the exposition CONTENT is an
oracle-checked query (``obs_prometheus_text`` — one ``etl_<metric>
<value>`` line per counter); this module owns the serving side with
stdlib ``http.server`` only, so the scrape target works in any
deployment without extra dependencies.

Scale note: the exposition is a per-DRIVER scrape target serving a
three-row aggregate — the collect here is a fixed-size metrics
summary, never data. On a real cluster you run one of these per
driver (or point Prometheus at Spark's own metrics servlet); the
content contract is identical either way.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

#: Prometheus text exposition content type (text format 0.0.4).
CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"


class ExpositionServer:
    """Serve a fixed Prometheus text payload at ``/metrics``.

    ``port=0`` binds an ephemeral port (read it from ``.port`` after
    ``start()``). ``update(text)`` swaps the payload atomically, so a
    long-running pipeline can refresh counters between batches while
    Prometheus scrapes."""

    def __init__(self, text: str, host: str = "127.0.0.1", port: int = 0):
        self._lock = threading.Lock()
        self._text = text
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_error(404)
                    return
                with outer._lock:
                    body = outer._text.encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", CONTENT_TYPE)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence per-request stderr
                pass

        self._server = ThreadingHTTPServer((host, port), _Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def update(self, text: str) -> None:
        with self._lock:
            self._text = text

    def start(self) -> "ExpositionServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def exposition_text(df) -> str:
    """Render the ``obs_prometheus_text`` result DataFrame (three
    metric rows with a ``line`` column) as the exposition body. The
    collect is a fixed-size metrics aggregate by contract."""
    rows = df.select("line").collect()
    return "\n".join(r["line"] for r in rows) + "\n"


def serve_exposition(df, host: str = "127.0.0.1", port: int = 0) -> ExpositionServer:
    """One-call parity with the reference's ``start_http_server``:
    render the exposition query's result and serve it. Returns the
    started server; caller stops it."""
    return ExpositionServer(exposition_text(df), host=host, port=port).start()
