"""Edge bridges: HTTP server → stream, subprocess → rows.

Reference surface: ``from_http_server`` — a Tornado handler pushing POST
bodies into a stream (`/root/reference/deva/core/sources.py:426-507`,
`1002-1098`) — and ``from_command``/``from_process`` streaming a shell
command's stdout lines (`sources.py:510-678`).

Spark mapping: Spark itself should not host request handlers; the bridge
pattern is a tiny spool server at the edge that appends each POST body to
a spool directory, which the file-stream source tails (new file per batch
→ micro-batches). That keeps ingestion durable (files are the WAL) and
the engine stateless. ``from_command`` is a driver-side bridge: run the
command, land stdout as rows.
"""

from __future__ import annotations

import os
import subprocess
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession


class SpoolHTTPServer:
    """``from_http_server`` analog: POST /ingest appends the body as one
    spool file; a Structured Streaming file source tails the directory.

    The `tag` header routes to a sub-directory (the reference's named-
    stream routing, `sources.py:1062-1070`)."""

    def __init__(self, spool_dir: str, port: int = 0):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        spool = self.spool_dir

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802 — http.server API
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                tag = self.headers.get("tag", "")
                target = os.path.join(spool, tag) if tag else spool
                os.makedirs(target, exist_ok=True)
                # unique name + atomic rename: the stream source must never
                # observe a half-written file
                tmp = os.path.join(target, f".tmp_{uuid.uuid4().hex}")
                with open(tmp, "wb") as fh:
                    fh.write(body if body.endswith(b"\n") else body + b"\n")
                os.rename(tmp, os.path.join(target, f"{time.time_ns()}_{uuid.uuid4().hex}.jsonl"))
                self.send_response(204)
                self.end_headers()

            def log_message(self, *args) -> None:  # quiet
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_port
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "SpoolHTTPServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def stream(self, spark: SparkSession, schema: str, tag: str = "") -> DataFrame:
        """readStream over the spool (optionally one tag's sub-stream)."""
        path = os.path.join(self.spool_dir, tag) if tag else self.spool_dir
        os.makedirs(path, exist_ok=True)
        return spark.readStream.schema(schema).json(path)


def from_command(spark: SparkSession, command: list[str], timeout: int = 60) -> DataFrame:
    """``from_command`` analog: run a shell command, one row per stdout
    line (columns: line, exit_code). Driver-side by design — the reference
    also runs the subprocess in-process (`sources.py:533-545`)."""
    proc = subprocess.run(
        command, capture_output=True, text=True, timeout=timeout
    )
    lines = [(ln, proc.returncode) for ln in proc.stdout.splitlines()]
    return spark.createDataFrame(lines or [(None, proc.returncode)], "line string, exit_code int").filter(
        "line IS NOT NULL"
    )
