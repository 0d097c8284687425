"""R22 + reference README.md:28 — GET /health over real HTTP against the
engine, with and without an active streaming query, and after shutdown."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from data_ingestor_web_app_spark.streaming import health, runtime


def _get(port: int, path: str = "/health"):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, json.loads(r.read())


def test_health_endpoint_reports_engine_and_streams(spark, sf_small):
    hs = health.serve(spark)
    try:
        code, body = _get(hs.port)
        assert code == 200
        assert body["status"] == "ok"
        assert body["sparkVersion"] == spark.version
        assert body["defaultParallelism"] >= 1

        # with a live streaming query the endpoint lists it by name
        s = runtime.events_stream(spark, sf_small).select("event_id")
        q = (
            s.writeStream.format("memory")
            .queryName("health_probe_stream")
            .outputMode("append")
            .start()
        )
        try:
            code, body = _get(hs.port)
            assert code == 200
            names = {e["name"] for e in body["queries"]}
            assert "health_probe_stream" in names
            assert body["activeStreams"] >= 1
        finally:
            q.stop()

        # 404 for anything that is not /health
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(hs.port, "/nope")
        assert exc.value.code == 404
    finally:
        hs.stop()

    # stopped server => connection refused, the dead-daemon signal
    with pytest.raises(urllib.error.URLError):
        _get(hs.port)
