"""HTTP /health endpoint — the reference's operational surface
(/root/reference/README.md:28: "Check application status at:
http://localhost/health") re-expressed for the Spark engine.

The reference is a systemd-supervised TCP daemon whose health check is an
HTTP GET; the engine's equivalent liveness facts are the SparkSession and
its streaming queries' `status`/`lastProgress` (the same plumbing the
engine's progress listeners already use — SURVEY §2A R22). This module
binds a stdlib HTTP server (no frameworks in the container) that serves:

- ``GET /health`` → 200 with a JSON body: engine liveness, Spark version,
  default parallelism, and one entry per active streaming query (name,
  id, isDataAvailable/isTriggerActive, input/processed rates from
  lastProgress) — 503 with ``{"status": "down"}`` once stopped;
- anything else → 404.

Scale posture: the health server is driver-local observability (one tiny
thread, no executor involvement) — exactly like the reference's endpoint,
which reports the single process's state. Cluster-level health at 100 TB
is the scheduler's job (driver liveness IS the query's liveness).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from pyspark.sql import SparkSession


def _snapshot(spark: SparkSession) -> dict:
    """One JSON-able health snapshot from live session state."""
    queries = []
    for q in spark.streams.active:
        entry = {
            "id": str(q.id),
            "name": q.name,
            "isActive": q.isActive,
            "status": q.status,
        }
        lp = q.lastProgress
        if lp:
            entry["inputRowsPerSecond"] = lp.get("inputRowsPerSecond")
            entry["processedRowsPerSecond"] = lp.get("processedRowsPerSecond")
            entry["batchId"] = lp.get("batchId")
        queries.append(entry)
    return {
        "status": "ok",
        "sparkVersion": spark.version,
        "defaultParallelism": spark.sparkContext.defaultParallelism,
        "activeStreams": len(queries),
        "queries": queries,
    }


class HealthServer:
    """`serve(spark, port)` → bound HTTP server answering GET /health.

    Lifecycle mirrors the reference daemon: start with the engine, stop on
    shutdown (after stop() the socket is closed; clients see connection
    refused, the same signal a dead reference process gives its checker).
    """

    def __init__(self, spark: SparkSession, host: str = "127.0.0.1", port: int = 0):
        self._spark = spark
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib API name)
                if self.path.rstrip("/") not in ("", "/health"):
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    body = json.dumps(_snapshot(outer._spark)).encode()
                    code = 200
                except Exception as exc:  # session gone => unhealthy
                    body = json.dumps({"status": "down", "error": str(exc)}).encode()
                    code = 503
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # silence stdlib access log
                pass

        self._httpd = HTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def serve(spark: SparkSession, host: str = "127.0.0.1", port: int = 0) -> HealthServer:
    return HealthServer(spark, host=host, port=port)
