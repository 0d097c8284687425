"""R1 live-TCP smoke: push bytes through a real local socket into the
socket-source → LogEntry pipeline — the reference's `echo 'test data' | nc`
check (deploy.sh:174) reproduced against this engine."""

from __future__ import annotations

import socket
import tempfile
import threading
import time

from data_ingestor_web_app_spark.streaming.socket_ingest import socket_logentry_stream

LINES = [b"test data", b"", b"x" * 250, b"second payload"]
# empty line is dropped (main.go:298-301) -> 3 surviving records
EXPECTED = 3


def _serve(server: socket.socket, stop: threading.Event) -> None:
    # Spark's socket source dials us; accept and stream the payload lines,
    # then hold the connection open until the test has its rows (closing
    # early can race the last micro-batch).
    server.settimeout(30)
    conn, _ = server.accept()
    try:
        conn.sendall(b"".join(line + b"\n" for line in LINES))
        stop.wait(timeout=60)
    finally:
        conn.close()
        server.close()


def test_socket_bytes_become_logentries(spark):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()
    t = threading.Thread(target=_serve, args=(server, stop), daemon=True)
    t.start()

    sdf = socket_logentry_stream(spark, "127.0.0.1", port)
    name = f"socket_smoke_{port}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_socket_"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= EXPECTED:
                break
            time.sleep(0.5)
        rows = {r["byte_count"]: r for r in spark.table(name).collect()}
    finally:
        stop.set()
        q.stop()
        t.join(timeout=10)

    assert len(rows) == EXPECTED  # empty payload dropped
    r = rows[9]  # b"test data"
    assert r["level"] == "WARN"  # < 200 bytes
    assert r["message"] == f"Received 9 bytes of binary data from 127.0.0.1:{port}"
    assert r["client_host"] == "127.0.0.1"
    assert r["binary_data_hex"] == b"test data".hex()
    assert r["timestamp"].endswith("Z")
    big = rows[250]
    assert big["level"] == "INFO"  # >= 200 bytes
    assert big["binary_data_hex"] == (b"x" * 48).hex()  # 48-byte preview
