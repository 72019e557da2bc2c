"""Crawler retry/ratelimit semantics, mail source, plan visualization."""

import time
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

from pyspark.sql import functions as F

from deva_spark.functions import http as H
from deva_spark.plans.graph import plan_nodes, shuffle_count, to_dot, visualize
from deva_spark.plans.pipe import P
from deva_spark.sources.mail import MailSpoolSource, parse_message
from deva_spark.streaming.twin import run_available_now

def test_fetch_policy_retries_transient_then_succeeds():
    calls, naps = [], []

    def flaky(url):
        calls.append(url)
        if len(calls) < 3:
            raise TimeoutError("transient")
        return f"<html>{url}</html>"

    body, err = H.fetch_with_policy(flaky, "https://x/f", base_delay=0.01, sleep=naps.append)
    assert (body, err) == ("<html>https://x/f</html>", None)
    assert len(calls) == 3 and naps == [0.01, 0.02]  # exponential backoff


def test_fetch_policy_no_retry_on_4xx():
    import urllib.error

    calls = []

    def hard(url):
        calls.append(url)
        raise urllib.error.HTTPError(url, 404, "nope", None, None)

    body, err = H.fetch_with_policy(hard, "https://x/a", sleep=lambda _d: None)
    assert body is None and "404" in err
    assert len(calls) == 1  # 4xx never retries


def test_fetch_policy_exhausts_retries():
    def always(url):
        raise ConnectionResetError("down")

    body, err = H.fetch_with_policy(always, "u", max_retries=2, sleep=lambda _d: None)
    assert body is None and "ConnectionResetError" in err


def test_fetch_policy_render_hook():
    body, _ = H.fetch_with_policy(
        H.stub_fetcher, "https://x/p", render=lambda u, b: b.upper()
    )
    assert body.startswith("<HTML>")


def test_fetch_stage_end_to_end(spark):
    # executor path with an importable fetcher: per-row error capture
    df = spark.createDataFrame(
        [("https://x.example/ok",), ("notaurl",)], "url string"
    )
    out = {r.url: r for r in H.fetch_stage(df, fetcher=H.stub_fetcher).collect()}
    assert out["https://x.example/ok"].fetch_error is None
    assert out["https://x.example/ok"].body.startswith("<html>stub:")
    assert out["notaurl"].body is None and "ValueError" in out["notaurl"].fetch_error


def test_fetch_stage_cached_recrawl_zero_network(spark, tmp_path):
    # the browser tab/LRU contract: cache-first, network only on miss
    import os
    from functools import partial

    spool = str(tmp_path / "calls")
    cache = str(tmp_path / "webcache")
    fetcher = partial(H.spool_recording_fetcher, spool)
    urls = [("https://a.example/1",), ("https://a.example/2",),
            ("https://a.example/2",), ("https://a.example/boom",)]
    df = spark.createDataFrame(urls, "url string")

    first = [(r.url, r.body, r.fetch_error)
             for r in H.fetch_stage_cached(df, cache, fetcher=fetcher,
                                           base_delay=0.01).collect()]
    # dup URL fetched once; failure captured per-row
    assert len(os.listdir(spool)) == 3
    assert sum(1 for _, b, e in first if b and e is None) == 3
    assert sum(1 for _, b, e in first if e and "ValueError" in e) == 1

    # re-crawl of the cached set: ZERO network calls for the hits; only
    # the uncached failure retries
    second = H.fetch_stage_cached(df, cache, fetcher=fetcher,
                                  base_delay=0.01).collect()
    assert len(os.listdir(spool)) == 4  # +1: the failed url retried
    hits = {r.url: r.body for r in second if r.body}
    assert hits[urls[0][0]].startswith("<html>fetched:")

    # fully-cached crawl (no failures in the input): no fetch at all
    ok = spark.createDataFrame(urls[:3], "url string")
    third = H.fetch_stage_cached(ok, cache, fetcher=fetcher,
                                 base_delay=0.01).collect()
    assert len(os.listdir(spool)) == 4  # unchanged
    assert all(r.body and r.fetch_error is None for r in third)

    # a NULL url must surface its per-row error (md5(NULL) would make a
    # NULL join key and silently drop the captured error)
    withnull = spark.createDataFrame(
        [("https://a.example/1",), (None,)], "url string"
    )
    rows = {r.url: r for r in H.fetch_stage_cached(
        withnull, cache, fetcher=fetcher, base_delay=0.01).collect()}
    assert rows["https://a.example/1"].body  # still a cache hit
    assert rows[None].body is None and rows[None].fetch_error

    # run dirs are pruned to keep_runs (several crawls above, each with
    # an uncached failure, created one run dir apiece)
    runs_root = cache + "_runs"
    assert len(os.listdir(runs_root)) <= 3


def test_rate_gate_spaces_starts():
    gate = H._RateGate(100.0)  # 10 ms spacing
    t0 = time.monotonic()
    for _ in range(5):
        gate.wait()
    assert time.monotonic() - t0 >= 0.035  # 4 gaps x 10 ms (first is free)
    assert H._RateGate(None).interval == 0.0


def test_is_retryable_policy():
    import urllib.error

    assert H.is_retryable(TimeoutError())
    assert H.is_retryable(ConnectionResetError())
    assert H.is_retryable(urllib.error.HTTPError("u", 503, "x", None, None))
    assert not H.is_retryable(urllib.error.HTTPError("u", 404, "x", None, None))
    assert not H.is_retryable(ValueError("bad url"))


# ------------------------------------------------------------------- mail

def _mime(subject: str, body: str, sender="a@example.com", to="b@example.com") -> bytes:
    m = MIMEMultipart()
    m["Subject"] = subject
    m["From"] = sender
    m["To"] = to
    m["Date"] = "Thu, 13 Aug 2026 09:00:00 +0000"
    m.attach(MIMEText(body, "plain", "utf-8"))
    return m.as_bytes()


class FakeImap:
    def __init__(self, messages):
        self.messages = dict(messages)
        self.seen = []

    def unread(self):
        return [(uid, raw) for uid, raw in self.messages.items() if uid not in self.seen]

    def mark_seen(self, uid):
        self.seen.append(uid)


def test_parse_message_headers_and_body():
    rec = parse_message("7", _mime("Hél=?utf-8?q?lo?=", "line one\nline two"))
    assert rec["uid"] == "7" and "l" in rec["subject"]
    assert rec["sender"] == "a@example.com"
    assert rec["body"].startswith("line one")


def test_mail_spool_source_poll_and_stream(spark, tmp_path):
    client = FakeImap({"1": _mime("s1", "b1"), "2": _mime("s2", "b2")})
    src = MailSpoolSource(client, str(tmp_path / "mail"))
    assert src.poll_once() == 2
    assert sorted(client.seen) == ["1", "2"]
    assert src.poll_once() == 0  # seen messages don't re-emit
    out = run_available_now(src.stream(spark), "t_mail", output_mode="append")
    rows = {r.uid: (r.subject, r.body) for r in out.collect()}
    assert rows == {"1": ("s1", "b1"), "2": ("s2", "b2")}


# ------------------------------------------------------------------ graph

def test_plan_visualize_dot(spark):
    a = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))
    b = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    df = a.join(b, "k").filter(F.col("id") > 10).groupBy("v").count()
    dot = to_dot(df)
    assert dot.startswith("digraph plan {")
    names = {ln.split('label="')[1].split()[0] for ln in dot.splitlines() if 'label="' in ln}
    assert "Join" in names and "Aggregate" in names
    nodes = plan_nodes(df)
    assert dot.count(" -> ") == len(nodes) - 1  # a tree
    # physical mode marks exchanges; shuffle_count sees the agg shuffle
    pdot = to_dot(df, physical=True)
    assert "fillcolor" in pdot
    assert shuffle_count(df) >= 1


def test_eventstream_visualize_writes_dot(spark, tmp_path):
    p = str(tmp_path / "plan.dot")
    out = P(spark.range(10)).filter(F.col("id") > 3).visualize(path=p)
    assert out.startswith("digraph") and open(p).read() == out


def test_curate_report_counts(spark, sf_dir):
    from deva_spark.plans.corpus import curate
    from deva_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    out, rep = curate(docs, min_quality=40.0, lang="en", with_report=True)
    assert rep.input_docs == docs.count()
    assert rep.after_quality >= rep.after_exact_dedup >= rep.after_near_dedup
    assert rep.after_near_dedup == out.count()
    assert rep.surviving_tokens > 0


def test_imap_client_uses_uid_commands_and_peek():
    # r11 review: sequence-number STORE flags the wrong message after a
    # concurrent expunge, and a plain RFC822 FETCH sets \Seen at fetch
    # time (losing the message if the spool write then fails). The
    # client must use UID variants and BODY.PEEK[].
    from deva_spark.sources.mail import ImapClient

    calls = []

    class FakeConn:
        def uid(self, cmd, *args):
            calls.append((cmd, args))
            if cmd == "search":
                return "OK", [b"7 9"]
            if cmd == "fetch":
                return "OK", [(b"7 (BODY[] {3}", b"raw"), b")"]
            return "OK", [b""]

    c = ImapClient("h", "u", "p")
    c._conn = FakeConn()
    msgs = c.unread()
    assert [u for u, _ in msgs] == ["7", "9"]
    assert calls[0] == ("search", (None, "UNSEEN"))
    assert calls[1][0] == "fetch" and calls[1][1][1] == "(BODY.PEEK[])"
    c.mark_seen("7")
    assert calls[-1] == ("store", ("7", "+FLAGS", "\\Seen"))
