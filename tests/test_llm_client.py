"""Real-transport tests for the openai-compatible LLM client.

An in-process localhost HTTP server implements the chat-completions
contract (the test pattern of test_bridges/test_page_server: real
sockets, no egress), so the WHOLE path is exercised — OpenAIChatClient's
request shape, the 429 retry/backoff policy in llm_stage's mapInPandas
plumbing, json_mode structured output, and env-var wiring.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from deva_spark.functions import llm


class _ChatHandler(BaseHTTPRequestHandler):
    server_version = "test-openai/0"
    flaky_seen: dict[str, int] = {}
    requests: list[dict] = []

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        if not self.path.endswith("/chat/completions"):
            self.send_error(404)
            return
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])).decode()
        )
        type(self).requests.append(
            {"body": body, "auth": self.headers.get("Authorization")}
        )
        prompt = body["messages"][-1]["content"]
        if "flaky" in prompt:
            n = type(self).flaky_seen.get(prompt, 0)
            type(self).flaky_seen[prompt] = n + 1
            if n == 0:  # first attempt rate-limited -> client must retry
                self.send_error(429, "rate limited")
                return
        if body.get("response_format", {}).get("type") == "json_object":
            content = json.dumps({"sentiment": "pos", "score": 5})
        else:
            content = f"echo:{prompt}"
        resp = json.dumps(
            {"choices": [{"message": {"role": "assistant", "content": content}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)


@pytest.fixture()
def chat_server():
    _ChatHandler.flaky_seen = {}
    _ChatHandler.requests = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ChatHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


def test_openai_client_roundtrip_and_retry(spark, chat_server):
    client = llm.OpenAIChatClient(
        chat_server, model="test-model", api_key="sk-test", timeout=10.0
    )
    df = spark.createDataFrame(
        [("hello",), ("flaky one",)], "prompt string"
    )
    out = {
        r.prompt: r.completion
        for r in llm.llm_stage(df, client=client, base_delay=0.01).collect()
    }
    assert out["hello"] == "echo:hello"
    # 429 on first attempt, success on the backoff retry
    assert out["flaky one"] == "echo:flaky one"
    assert _ChatHandler.flaky_seen["flaky one"] == 2
    sent = _ChatHandler.requests[0]
    assert sent["auth"] == "Bearer sk-test"
    assert sent["body"]["model"] == "test-model"
    assert sent["body"]["temperature"] == 0.0


def test_openai_client_json_mode(spark, chat_server):
    client = llm.OpenAIChatClient(chat_server, model="m", json_mode=True)
    df = spark.createDataFrame([("classify this",)], "prompt string")
    row = llm.llm_stage_json(
        df, "sentiment string, score bigint", client=client, base_delay=0.01
    ).collect()[0]
    assert row.llm_error is None
    assert row.parsed.sentiment == "pos" and row.parsed.score == 5
    assert any(
        r["body"].get("response_format") == {"type": "json_object"}
        for r in _ChatHandler.requests
    )


def test_env_llm_client_wiring(spark, chat_server, monkeypatch):
    # env config is EXPLICIT opt-in (client=env_llm_client()) — never an
    # ambient default, so oracle-paired queries with client=None can't
    # silently flip onto a paid endpoint
    monkeypatch.setenv("DEVA_LLM_BASE_URL", chat_server)
    monkeypatch.setenv("DEVA_LLM_MODEL", "env-model")
    monkeypatch.delenv("DEVA_LLM_API_KEY", raising=False)
    df = spark.createDataFrame([("via env",)], "prompt string")
    out = llm.llm_stage(
        df, client=llm.env_llm_client(), base_delay=0.01
    ).collect()[0]
    assert out.completion == "echo:via env"
    assert any(r["body"]["model"] == "env-model" for r in _ChatHandler.requests)


def test_llm_stage_default_stays_stub_even_with_env_set(spark, chat_server, monkeypatch):
    # registry queries call with client=None: DEVA_LLM_* must NOT change
    # their results (the x98 env-dependence defect class)
    monkeypatch.setenv("DEVA_LLM_BASE_URL", chat_server)
    before = len(_ChatHandler.requests)
    df = spark.createDataFrame([("p1",)], "prompt string")
    out = llm.llm_stage(df).collect()[0]
    assert out.completion.startswith("stub:")
    assert len(_ChatHandler.requests) == before  # zero network calls


def test_env_llm_client_absent_falls_back_to_stub(spark, monkeypatch):
    monkeypatch.delenv("DEVA_LLM_BASE_URL", raising=False)
    assert llm.env_llm_client() is None
    df = spark.createDataFrame([("p1",)], "prompt string")
    out = llm.llm_stage(df).collect()[0]
    assert out.completion.startswith("stub:")


def test_llm_stage_cached_null_prompt_flows_through(spark, tmp_path):
    # r11 review: a NULL prompt must not crash the miss stage or be
    # re-billed every run — it hashes to a sentinel, skips the client,
    # and its output stays NULL.
    from deva_spark.functions.llm import (
        deterministic_stub_client,
        llm_stage_cached,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, None)], "id long, prompt string"
    )
    out = llm_stage_cached(
        df,
        str(tmp_path / "cache"),
        prompt_col="prompt",
        out_col="completion",
        client=deterministic_stub_client,
    )
    rows = {r.id: r.completion for r in out.collect()}
    assert rows[1] is not None and rows[2] is None
