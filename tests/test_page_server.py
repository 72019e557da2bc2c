"""Page/webview server (NW / webview / sse_view analogs) — real HTTP
round-trips over the stdlib server on an ephemeral port."""

import json
import socket
import urllib.request

import pytest

from deva_spark.sources.page import PageServer, sse_topic
from deva_spark.sources.topic import FileTopicBroker


@pytest.fixture()
def server():
    srv = PageServer(port=0)
    yield srv
    srv.stop()


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


def test_data_store_roundtrip(server):
    {"answer": 42} >> server
    server.put("greeting", "hi")
    assert json.loads(_get(f"{server.url}/data")) == {"answer": 42, "greeting": "hi"}
    assert json.loads(_get(f"{server.url}/data/answer")) == 42
    # POST stores JSON bodies
    req = urllib.request.Request(
        f"{server.url}/data/posted", data=b'{"x": 1}', method="POST"
    )
    urllib.request.urlopen(req, timeout=5)
    assert json.loads(_get(f"{server.url}/data/posted")) == {"x": 1}


def test_dataframe_webview(server, spark):
    df = spark.range(5).selectExpr("id", "id * id AS sq")
    url = server.add_view("squares", df, limit=3)
    body = _get(url).decode()
    assert "<table" in body and "squares" in body and "first 3 rows" in body
    assert ">16<" not in body  # row 4 is past the limit
    # index lists the view and a missing name 404s
    assert "df/squares" in _get(server.url + "/").decode()
    with pytest.raises(urllib.error.HTTPError):
        _get(f"{server.url}/df/nope")


def test_sse_topic_tail(server, tmp_path):
    broker = FileTopicBroker(str(tmp_path))
    for i in range(3):
        broker.xadd("alerts", f"event-{i}")
    url = sse_topic(server, broker, "alerts")
    # raw socket read: urllib would block on the infinite stream
    host, port = server.host, server.port
    with socket.create_connection((host, port), timeout=5) as s:
        s.sendall(f"GET /sse/alerts HTTP/1.1\r\nHost: {host}\r\n\r\n".encode())
        s.settimeout(5)
        buf = b""
        while buf.count(b"data:") < 3:
            buf += s.recv(4096)
    frames = [
        json.loads(line[len(b"data: "):])
        for line in buf.split(b"\n")
        if line.startswith(b"data: ")
    ]
    assert frames[:3] == ["event-0", "event-1", "event-2"]
    assert url.endswith("/sse/alerts")
