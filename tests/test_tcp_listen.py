"""Listen-mode R1 parity: a real nc-style client dials the ENGINE (which
binds and accepts, like /root/reference/main.go:199-257), bytes become
LogEntry rows, the client gets the reference's ack (main.go:316-317), and
connections above the semaphore cap are closed unread (main.go:252-255)."""

from __future__ import annotations

import os
import socket
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.sources.tcp_listen import (
    tcp_listen_logentry_stream,
    tcp_listen_stream,
)


def _free_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _dial(port: int, attempts: int = 100) -> socket.socket:
    """Retry-connect until the source's accept loop is up (query startup
    is async)."""
    last: Exception | None = None
    for _ in range(attempts):
        try:
            c = socket.create_connection(("127.0.0.1", port), timeout=5)
            return c
        except OSError as e:  # pragma: no cover - startup race only
            last = e
            time.sleep(0.3)
    raise AssertionError(f"could not reach listener on {port}: {last}")


def _wait(predicate, deadline_sec: float = 90.0, msg: str = "condition"):
    deadline = time.time() + deadline_sec
    while time.time() < deadline:
        got = predicate()
        if got:
            return got
        time.sleep(0.5)
    raise AssertionError(f"timed out waiting for {msg}")


def test_nc_smoke_logentries_and_ack(spark):
    """deploy.sh:174 verbatim: `echo 'test data' | nc <host> <port>` — the
    engine is the SERVER. The payload comes back as a LogEntry row and the
    client reads the reference's exact ack text."""
    port = _free_port()
    q = (
        tcp_listen_logentry_stream(spark, "127.0.0.1", port)
        .writeStream.format("memory")
        .queryName("tcp_listen_smoke")
        .outputMode("append")
        .start()
    )
    try:
        c = _dial(port)
        c.sendall(b"test data")
        c.shutdown(socket.SHUT_WR)  # what `echo | nc` does: EOF after write
        ack = b""
        c.settimeout(15)
        while True:
            chunk = c.recv(4096)
            if not chunk:
                break
            ack += chunk
        c.close()
        assert ack.decode() == (
            "Data processed successfully\nBytes: 9\nConnection ID: 1\n"
        )

        rows = _wait(
            lambda: spark.table("tcp_listen_smoke").collect(),
            msg="LogEntry row from listen-mode ingest",
        )
        assert len(rows) == 1
        r = rows[0]
        assert r["conn_id"] == 1  # true accept-loop ordinal, not a hash
        assert r["byte_count"] == 9
        assert r["level"] == "WARN"  # < 200 bytes (main.go:96-125 gating)
        assert r["binary_data_hex"] == b"test data".hex()
        assert r["client_host"] == "127.0.0.1"
        assert r["message"].startswith("Received 9 bytes")
    finally:
        q.stop()


def test_reject_above_cap_and_recovery(spark):
    """main.go:252-255 shed-load: with maxConnections=2 and both slots held
    by open connections, further connections are closed UNREAD and show up
    in-band as kind='rejected'; once a slot frees, new connections are
    admitted again (semaphore release, main.go:248-249)."""
    port = _free_port()
    q = (
        tcp_listen_stream(
            spark,
            "127.0.0.1",
            port,
            max_connections=2,
            max_workers=4,
            read_timeout_sec=8.0,
        )
        .writeStream.format("memory")
        .queryName("tcp_listen_admission")
        .outputMode("append")
        .start()
    )
    held: list[socket.socket] = []
    try:
        # occupy both slots: connect, send nothing, keep the socket open —
        # each handler blocks in its 8 s idle-read window holding a slot
        for _ in range(2):
            held.append(_dial(port))
        time.sleep(0.5)  # let both accepts land before overflowing

        # overflow: these two must be rejected (closed without an ack)
        rejected_seen = 0
        for _ in range(2):
            c = _dial(port)
            c.settimeout(10)
            try:
                got = c.recv(4096)  # server closes immediately => EOF
            except ConnectionResetError:
                got = b""  # RST is also a valid immediate-close signal
            assert got == b""
            c.close()
            rejected_seen += 1
        assert rejected_seen == 2

        def admission_rows():
            rows = spark.table("tcp_listen_admission").collect()
            kinds = [r["kind"] for r in rows]
            return rows if kinds.count("rejected") >= 2 else None

        rows = _wait(admission_rows, msg="two in-band rejection records")
        rejected = [r for r in rows if r["kind"] == "rejected"]
        assert len(rejected) == 2
        for r in rejected:
            assert r["payload"] == bytearray(b"")  # closed UNREAD
            assert r["conn_id"] in (3, 4)  # ordinals after the two holders

        # recovery: release the held slots; the idle handlers emit 'empty'
        # (main.go:298-301) and new connections are admitted again
        for h in held:
            h.close()
        held.clear()
        # slot release is asynchronous (the held handlers must notice the
        # close first) — retry until a dial gets through admission; a
        # still-rejected attempt sees EOF or RST and tries again
        ack = b""
        deadline = time.time() + 60
        while time.time() < deadline:
            c = _dial(port)
            try:
                c.sendall(b"after recovery")
                c.shutdown(socket.SHUT_WR)
                c.settimeout(15)
                ack = b""
                while True:
                    chunk = c.recv(4096)
                    if not chunk:
                        break
                    ack += chunk
            except OSError:
                ack = b""
            finally:
                c.close()
            if ack:
                break
            time.sleep(0.5)
        assert b"Data processed successfully" in ack
        assert b"Bytes: 14" in ack

        def final_rows():
            rows = spark.table("tcp_listen_admission").collect()
            kinds = [r["kind"] for r in rows]
            ok = kinds.count("data") >= 1 and kinds.count("empty") >= 2
            return rows if ok else None

        rows = _wait(final_rows, msg="data + empty records after recovery")
        data = [r for r in rows if r["kind"] == "data"]
        assert any(bytes(r["payload"]) == b"after recovery" for r in data)
        # the two held-open connections produced zero-byte 'empty' records,
        # which the shared R9 projection would drop — exactly the
        # reference's "No data received" WARN path
        empties = [r for r in rows if r["kind"] == "empty"]
        assert len(empties) >= 2
    finally:
        for h in held:
            try:
                h.close()
            except OSError:
                pass
        q.stop()


def _send_acked(port: int, payload: bytes) -> int:
    """Send one payload nc-style, require the reference ack, return the
    conn_id the server assigned (parsed from the ack text)."""
    c = _dial(port)
    try:
        c.sendall(payload)
        c.shutdown(socket.SHUT_WR)
        c.settimeout(20)
        ack = b""
        while True:
            chunk = c.recv(4096)
            if not chunk:
                break
            ack += chunk
    finally:
        c.close()
    text = ack.decode()
    assert "Data processed successfully" in text, f"no ack for {payload!r}: {text!r}"
    return int(text.rsplit("Connection ID: ", 1)[1].strip())


def test_exactly_once_across_crash_restart(spark, tmp_path):
    """Round-7 item 7 — the drain guarantee (main.go:259-262) made
    crash-proof: a REAL mid-batch executor crash (poison pandas_udf, not a
    graceful stop) kills the query after clients were acked; restart from
    the same checkpoint replays the un-committed tail from the write-ahead
    journal via readBetweenOffsets on a fresh (port-less) reader copy — the
    exact path that is empty in un-journaled mode — and the parquet sink's
    transaction log makes the redelivery exactly-once: every acked payload
    appears once, no duplicates, conn_ids strictly monotone across epochs."""
    port = _free_port()
    jdir = str(tmp_path / "journal")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    marker = str(tmp_path / "poison_armed")
    open(marker, "w").close()

    @F.pandas_udf("string")
    def checked(p: pd.Series) -> pd.Series:
        import os as _os

        if _os.path.exists(marker) and (p == "poison-me").any():
            raise RuntimeError("injected executor crash")
        return p

    def start():
        s = tcp_listen_stream(
            spark, "127.0.0.1", port, journal_dir=jdir
        ).select("conn_id", "payload_str", checked("payload_str").alias("checked"))
        return (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        epoch1 = [_send_acked(port, f"epoch1-{i}".encode()) for i in range(5)]
        poison_conn = _send_acked(port, b"poison-me")  # acked => journaled
        # the poison batch must CRASH the query (not a graceful stop)
        _wait(lambda: not q.isActive, deadline_sec=120, msg="query crash")
        assert q.exception() is not None
        assert "injected executor crash" in str(q.exception())
    finally:
        if q.isActive:
            q.stop()

    os.remove(marker)  # disarm
    q2 = start()
    try:
        epoch2 = [_send_acked(port, f"epoch2-{i}".encode()) for i in range(5)]
        expected = {f"epoch1-{i}" for i in range(5)} | {"poison-me"} | {
            f"epoch2-{i}" for i in range(5)
        }

        def all_delivered():
            try:
                rows = spark.read.parquet(out).collect()
            except Exception:
                return None
            return rows if {r["payload_str"] for r in rows} >= expected else None

        rows = _wait(all_delivered, deadline_sec=120, msg="exactly-once redelivery")
    finally:
        q2.stop()

    payloads = [r["payload_str"] for r in rows]
    # no loss, no duplicates — every acked payload exactly once
    assert sorted(payloads) == sorted(expected)
    conn_ids = {r["payload_str"]: r["conn_id"] for r in rows}
    assert len(set(conn_ids.values())) == len(conn_ids)
    # ordinals survive the crash monotonically: epoch2 ids continue AFTER
    # every pre-crash id (journal-recovered counter, main.go:219 parity)
    assert min(epoch2) > max(epoch1 + [poison_conn])
    assert conn_ids["poison-me"] == poison_conn


def test_wal_gap_refuses_resume(tmp_path):
    """VERDICT r8 "What's wrong" #1 (ADVICE item 1): a hole INSIDE the
    committed..top journal range is silent loss of acked-durable data
    (ack is only written after fsync, main.go:316-317 parity) — the
    listener must refuse to resume, loudly, instead of yielding fewer
    records than the offset range promises. A torn FINAL line is the
    benign crash artifact (never acked) and must still resume cleanly."""
    from data_ingestor_web_app_spark.sources.tcp_listen import (
        _journal_paths,
        _Listener,
    )

    def write_journal(jdir, indices, committed=0, torn_tail=False):
        os.makedirs(jdir, exist_ok=True)
        rec_path, com_path = _journal_paths(jdir)
        with open(com_path, "w") as f:
            f.write(str(committed))
        with open(rec_path, "w") as f:
            for i in indices:
                f.write(
                    _Listener._journal_line(
                        i, (i + 1, "127.0.0.1", b"x%d" % i, f"x{i}", "data", 1000 + i)
                    )
                )
            if torn_tail:
                f.write('{"i": 99, "c": 100, "a": "127.0.0.1", "p": "')  # mid-write crash

    def start(jdir):
        return _Listener(
            "127.0.0.1", _free_port(), max_connections=4, max_workers=2,
            read_timeout_sec=5.0, journal_dir=jdir,
        )

    # gap at index 2 inside [0, 4] — must raise, not silently drop
    gap_dir = str(tmp_path / "gap")
    write_journal(gap_dir, [0, 1, 3, 4])
    with pytest.raises(RuntimeError, match="WAL gap"):
        start(gap_dir)

    # torn final line (crash before fsync returned => never acked): benign,
    # resumes with exactly the intact prefix
    torn_dir = str(tmp_path / "torn")
    write_journal(torn_dir, [0, 1, 2], torn_tail=True)
    lst = start(torn_dir)
    try:
        with lst._lock:
            assert [r[3] for r in lst._records] == ["x0", "x1", "x2"]
            assert lst._base == 0
    finally:
        lst.stop()
