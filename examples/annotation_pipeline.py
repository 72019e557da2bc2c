"""LLM annotation pipeline demo — the round-9 surface end to end:

config store → openai-compatible client → schema-validated JSON
annotation stage (prompt-hash cached, so the re-run costs zero calls) →
cache-first crawl of the flagged docs' source URLs.

Offline by construction: an in-process localhost HTTP server implements
the chat-completions contract (the test_llm_client pattern), and the
crawl uses the spool-recording fetcher. Against a real deployment, put
the endpoint in the config store (or DEVA_LLM_* env) and drop the mock.

Run: python examples/annotation_pipeline.py [sf_dir]
"""

import json
import shutil
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deva_spark.session import get_spark, read_table
from deva_spark.functions import llm
from deva_spark.functions.http import fetch_stage_cached, stub_fetcher
from deva_spark.sources.config import (
    ConfigStore,
    llm_client_from_config,
    missing_llm_config,
)


class MockChat(BaseHTTPRequestHandler):
    """Deterministic openai-compatible endpoint: 'classifies' by length."""

    calls = 0

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).calls += 1
        prompt = body["messages"][-1]["content"]
        n_words = len(prompt.split())
        content = json.dumps(
            {"quality": "high" if n_words > 40 else "low", "n_words": n_words}
        )
        resp = json.dumps(
            {"choices": [{"message": {"content": content}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    srv = ThreadingHTTPServer(("127.0.0.1", 0), MockChat)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base_url = f"http://127.0.0.1:{srv.server_address[1]}/v1"

    work = tempfile.mkdtemp(prefix="deva_annot_")
    spark = get_spark("annotation-pipeline")
    try:
        # 1. credentials/endpoint live in the config registry, not code
        cfg = ConfigStore(f"{work}/config.db")
        cfg.update(
            "llm", {"base_url": base_url, "model": "mock-1", "api_key": "k"}
        )
        assert missing_llm_config(cfg) == []
        client = llm_client_from_config(cfg)
        client.json_mode = True

        # 2. annotate 20 docs with a typed JSON verdict; invalid replies
        #    would re-ask, transport 429/5xx would back off — policy is
        #    in the stage, the client stays dumb
        docs = (
            read_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .limit(20)
            .withColumn("prompt", F.concat(F.lit("Rate: "), F.col("text")))
        )
        cache = f"{work}/llm_cache"
        out = llm.llm_stage_cached(
            docs, cache, out_col="raw", client=client
        ).withColumn(
            "verdict",
            F.from_json("raw", "quality string, n_words bigint"),
        )
        n_low = out.filter(F.col("verdict.quality") == "low").count()
        first_calls = MockChat.calls
        print(f"annotated 20 docs ({n_low} low-quality), {first_calls} API calls")

        # 3. re-run: the prompt-hash cache answers everything
        out2 = llm.llm_stage_cached(docs, cache, out_col="raw", client=client)
        out2.count()
        print(f"re-run API calls: {MockChat.calls - first_calls} (cache hits)")

        # 4. cache-first crawl of the low-quality docs' source URLs
        urls = out.filter(F.col("verdict.quality") == "low").select(
            F.concat(
                F.lit("https://src.example/doc/"), F.col("doc_id")
            ).alias("url")
        )
        webcache = f"{work}/webcache"
        crawled = fetch_stage_cached(urls, webcache, fetcher=stub_fetcher)
        print("crawled:", crawled.filter(F.col("body").isNotNull()).count())
        again = fetch_stage_cached(urls, webcache, fetcher=stub_fetcher)
        print("re-crawl (all cache hits):", again.count())
    finally:
        srv.shutdown()
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
