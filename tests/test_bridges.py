"""HTTP spool bridge and subprocess source."""

import json
import urllib.request

from deva_spark.sources.bridge import SpoolHTTPServer, from_command
from deva_spark.streaming.twin import run_available_now


def post(port: int, payload: dict, tag: str = "") -> None:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/ingest",
        data=json.dumps(payload).encode(),
        headers={"tag": tag} if tag else {},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 204


def test_http_spool_to_stream(spark, tmp_path):
    srv = SpoolHTTPServer(str(tmp_path / "spool")).start()
    try:
        for i in range(5):
            post(srv.port, {"k": i, "v": f"m{i}"})
        out = run_available_now(
            srv.stream(spark, "k long, v string"), "t_http", output_mode="append"
        )
        rows = sorted((r.k, r.v) for r in out.collect())
        assert rows == [(i, f"m{i}") for i in range(5)]
    finally:
        srv.stop()


def test_http_spool_tag_routing(spark, tmp_path):
    srv = SpoolHTTPServer(str(tmp_path / "spool2")).start()
    try:
        post(srv.port, {"k": 1}, tag="a")
        post(srv.port, {"k": 2}, tag="b")
        out_a = run_available_now(
            srv.stream(spark, "k long", tag="a"), "t_http_a", output_mode="append"
        )
        assert [r.k for r in out_a.collect()] == [1]
    finally:
        srv.stop()


def test_from_command(spark):
    df = from_command(spark, ["printf", "a\nbb\nccc\n"])
    rows = sorted(r.line for r in df.collect())
    assert rows == ["a", "bb", "ccc"]
    assert all(r.exit_code == 0 for r in df.collect())


def test_kafka_source_gated_error(spark):
    import pytest

    from deva_spark.sources.readers import kafka_stream

    with pytest.raises(Exception, match="kafka|Kafka|DATA_SOURCE"):
        kafka_stream(spark, "localhost:9092", "topic")


def test_socket_stream_localhost(spark):
    """from_tcp_port analog against a real localhost TCP server."""
    import socket
    import threading
    import time

    from deva_spark.sources.readers import socket_stream

    server = socket.socket()
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = server.accept()
        conn.sendall(b"alpha\nbeta\ngamma\n")
        stop.wait(20)  # keep the connection open while the source reads
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    q = (
        socket_stream(spark, "127.0.0.1", port)
        .writeStream.format("memory")
        .queryName("t_sock")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table("t_sock").count() < 3:
            time.sleep(0.5)
        rows = {r.value for r in spark.table("t_sock").collect()}
        assert {"alpha", "beta", "gamma"} <= rows
    finally:
        q.stop()
        stop.set()
        server.close()


def _line_collector_server():
    """Multi-connection localhost TCP server collecting newline-framed
    payloads (one executor connection per partition)."""
    import socket
    import threading

    server = socket.socket()
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(16)
    port = server.getsockname()[1]
    lines: list[str] = []
    lock = threading.Lock()
    stop = threading.Event()

    def handle(conn):
        buf = b""
        while True:
            chunk = conn.recv(4096)
            if not chunk:
                break
            buf += chunk
        conn.close()
        with lock:
            lines.extend(ln for ln in buf.decode().split("\n") if ln)

    def serve():
        server.settimeout(0.5)
        while not stop.is_set():
            try:
                conn, _ = server.accept()
            except TimeoutError:
                continue
            except OSError:  # server closed during teardown
                break
            threading.Thread(target=handle, args=(conn,), daemon=True).start()

    threading.Thread(target=serve, daemon=True).start()
    return server, port, lines, stop


def test_write_tcp_roundtrip(spark):
    """netwrite/tcp_write analog: batch rows arrive delimiter-framed."""
    import time

    from deva_spark.sources.writers import write_tcp

    server, port, lines, stop = _line_collector_server()
    try:
        df = spark.createDataFrame(
            [(f"msg-{i}",) for i in range(20)], "payload string"
        ).repartition(4)
        write_tcp(df, "127.0.0.1", port)
        deadline = time.time() + 10
        while time.time() < deadline and len(lines) < 20:
            time.sleep(0.2)
        assert sorted(lines) == sorted(f"msg-{i}" for i in range(20))
    finally:
        stop.set()
        server.close()


def test_foreach_tcp_sink_streaming(spark, tmp_path):
    """Streaming twin: a file stream drains through the TCP sink."""
    import time

    from deva_spark.sources.writers import foreach_tcp_sink

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("s1\ns2\n")
    (src / "b.txt").write_text("s3\n")
    server, port, lines, stop = _line_collector_server()
    try:
        stream = (
            spark.readStream.schema("value string").text(str(src))
            .withColumnRenamed("value", "payload")
        )
        q = foreach_tcp_sink(stream, "127.0.0.1", port, available_now=True)
        q.awaitTermination(60)
        deadline = time.time() + 10
        while time.time() < deadline and len(lines) < 3:
            time.sleep(0.2)
        assert sorted(lines) == ["s1", "s2", "s3"]
    finally:
        stop.set()
        server.close()
