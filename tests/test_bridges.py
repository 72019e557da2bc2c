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
