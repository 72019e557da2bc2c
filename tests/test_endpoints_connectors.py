"""Alerting endpoints, topic connector, kafka sink contract, scheduler."""

import base64
import datetime as dt
import hashlib
import hmac
import json
import os
import urllib.parse

import pytest
from pyspark.sql import functions as F

from deva_spark.sources import endpoints as ep
from deva_spark.sources import kafka as ks
from deva_spark.sources import topic as tp
from deva_spark.streaming.scheduler import (
    CronTrigger,
    DateTrigger,
    IntervalTrigger,
    Scheduler,
    scheduled_pipeline_job,
)


# --------------------------------------------------------------- endpoints

def test_sign_webhook_url_matches_protocol():
    secret, ts = "SECtest123", 1700000000000
    url = ep.sign_webhook_url("https://example.invalid/send?access_token=t", secret, ts)
    expect = urllib.parse.quote_plus(
        base64.b64encode(
            hmac.new(secret.encode(), f"{ts}\n{secret}".encode(), hashlib.sha256).digest()
        )
    )
    assert url.endswith(f"&timestamp={ts}&sign={expect}")
    # no secret -> untouched
    assert ep.sign_webhook_url("https://example.invalid/x", None) == "https://example.invalid/x"


def test_build_webhook_payload_shapes():
    p = ep.build_webhook_payload("hello")
    assert p["msgtype"] == "text" and p["text"]["content"] == "hello"
    assert p["at"]["isAtAll"] is False
    assert ep.build_webhook_payload("ping @all")["at"]["isAtAll"] is True
    md = ep.build_webhook_payload("@md@Title|Body **bold**")
    assert md["msgtype"] == "markdown"
    assert md["markdown"] == {"title": "Title", "text": "Body **bold**"}
    # @md@ without | falls back to text
    assert ep.build_webhook_payload("@md@nope")["msgtype"] == "text"


def test_with_retries_backoff_and_raise():
    calls, delays = [], []

    def flaky(x):
        calls.append(x)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"

    assert ep.with_retries(flaky, max_retries=3, sleep=delays.append)("a") == "ok"
    assert len(calls) == 3 and len(delays) == 2 and delays[1] == 2 * delays[0]

    def always(_):
        raise OSError("down")

    with pytest.raises(OSError):
        ep.with_retries(always, max_retries=2, sleep=delays.append)("b")


def test_render_mail_message_variants():
    import pandas as pd

    m = ep.render_mail_message("alert body text", "a@x", "b@x")
    assert m["Subject"] == "deva message:alert body"
    assert m["To"] == "a@x" and m["From"] == "b@x"
    m2 = ep.render_mail_message(("Subj", "content"), "a@x", "b@x")
    assert m2["Subject"].startswith("Subj")
    m3 = ep.render_mail_message(pd.DataFrame({"a": [1, 2]}), "a@x", "b@x", "Report")
    html = m3.get_payload()[0].get_payload(decode=True).decode()
    assert "<table" in html and m3["Subject"] == "Report"


def _json_stream(spark, tmp_path, rows, schema):
    d = tmp_path / "in"
    d.mkdir(exist_ok=True)
    with open(d / "batch.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return spark.readStream.schema(schema).json(str(d))


def test_webhook_sink_sends_from_executors(spark, tmp_path):
    sdf = _json_stream(spark, tmp_path, [{"msg": f"m{i}"} for i in range(4)], "msg string")
    root = str(tmp_path / "sent")
    q = ep.webhook_sink(sdf, "https://example.invalid/s?access_token=t", secret="SEC1",
                        transport=ep.spool_transport(root), available_now=True)
    q.awaitTermination()
    sent = [json.load(open(os.path.join(root, n))) for n in os.listdir(root)]
    assert len(sent) == 4
    bodies = {json.loads(s["body"])["text"]["content"] for s in sent}
    assert bodies == {"m0", "m1", "m2", "m3"}
    assert all("&timestamp=" in s["url"] and "&sign=" in s["url"] for s in sent)


def test_spool_replay_of_signed_webhook_dedups(tmp_path):
    # ADVICE r2: sign_webhook_url stamps a fresh timestamp per send, so a
    # replayed row used to hash to a NEW spool file; the content address
    # must ignore the volatile timestamp/sign params.
    root = str(tmp_path / "sent")
    send = ep.spool_transport(root)
    body = json.dumps(ep.build_webhook_payload("hello"))
    send(ep.sign_webhook_url("https://x.invalid/s?access_token=t", "SEC", 1000), body)
    send(ep.sign_webhook_url("https://x.invalid/s?access_token=t", "SEC", 2000), body)
    assert len(os.listdir(root)) == 1  # replay overwrote, not duplicated
    # different BODY is a genuinely different send
    send(ep.sign_webhook_url("https://x.invalid/s?access_token=t", "SEC", 3000),
         json.dumps(ep.build_webhook_payload("other")))
    assert len(os.listdir(root)) == 2
    # different non-volatile query param (another robot) is different too
    send(ep.sign_webhook_url("https://x.invalid/s?access_token=OTHER", "SEC", 4000), body)
    assert len(os.listdir(root)) == 3


def test_http_sink_no_driver_collect():
    import inspect

    from deva_spark.sources import writers

    src = inspect.getsource(writers.foreach_http_sink)
    assert ".collect()" not in src and "foreachPartition" in src


# ----------------------------------------------------------------- topics

def test_file_topic_broker_roundtrip(tmp_path):
    b = tp.FileTopicBroker(str(tmp_path / "topics"))
    ids = [b.xadd("news", f"v{i}", max_len=None) for i in range(5)]
    assert ids == sorted(ids)
    got = b.xread("news")
    assert [v for _, v in got] == [f"v{i}" for i in range(5)]
    # cursor read: only entries after last seen id
    assert [v for _, v in b.xread("news", last_id=ids[2])] == ["v3", "v4"]
    # another broker instance (= another process) sees the same stream
    b2 = tp.FileTopicBroker(str(tmp_path / "topics"))
    assert len(b2.xread("news")) == 5


def test_file_topic_trim(tmp_path):
    b = tp.FileTopicBroker(str(tmp_path / "topics"))
    for i in range(10):
        b.xadd("t", f"v{i}", max_len=3)
    vals = [v for _, v in b.xread("t")]
    assert vals == ["v7", "v8", "v9"]


def test_topic_sink_and_stream_consumer(spark, tmp_path):
    root = str(tmp_path / "broker")
    import functools

    sdf = _json_stream(spark, tmp_path, [{"value": f"e{i}"} for i in range(6)], "value string")
    q = tp.topic_sink(sdf, functools.partial(tp.FileTopicBroker, root), "bus",
                      max_len=None, available_now=True)
    q.awaitTermination()
    broker = tp.FileTopicBroker(root)
    assert {v for _, v in broker.xread("bus")} == {f"e{i}" for i in range(6)}
    # NT live-consumer path: structured-streaming file source over the topic
    from deva_spark.streaming.twin import run_available_now

    out = run_available_now(broker.stream(spark, "bus"), "t_bus", output_mode="append")
    assert {r.value for r in out.collect()} == {f"e{i}" for i in range(6)}
    # batch XREAD path
    df = tp.read_topic(spark, broker, "bus")
    assert df.count() == 6 and df.columns == ["id", "value"]


# ------------------------------------------------------------------ kafka

def test_to_kafka_records_contract(spark):
    df = spark.range(3).select(
        F.col("id").alias("k"), F.to_json(F.struct("id")).alias("payload")
    )
    rec = ks.to_kafka_records(df, value="payload", key="k", topic="t1")
    assert [f.name for f in rec.schema.fields] == ["value", "key", "topic"]
    assert all(f.dataType.simpleString() == "string" for f in rec.schema.fields)
    rows = {(r.key, r.topic) for r in rec.collect()}
    assert rows == {("0", "t1"), ("1", "t1"), ("2", "t1")}


def test_murmur2_partitioning_deterministic():
    # stable across calls + full range coverage + bytes/str equivalence
    p = ks.partition_for_key("user-42", 12)
    assert p == ks.partition_for_key(b"user-42", 12)
    assert 0 <= p < 12
    ps = {ks.partition_for_key(f"k{i}", 8) for i in range(200)}
    assert ps == set(range(8))  # 200 keys must hit all 8 partitions
    # regression-pin the hash itself (public murmur2, seed 0x9747b28c)
    assert ks.murmur2(b"") == ks.murmur2(b"")
    assert ks.murmur2(b"kafka") != ks.murmur2(b"kafkb")


def test_repartition_for_kafka_colocates_keys(spark):
    df = spark.range(200).select(
        (F.col("id") % 10).cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
    )
    out = ks.repartition_for_kafka(df, 4, "key").withColumn(
        "pid", F.spark_partition_id()
    )
    per_key = out.groupBy("key").agg(F.countDistinct("pid").alias("n")).collect()
    assert all(r.n == 1 for r in per_key)  # each key lands in ONE task


def test_kafka_sink_gated_error(spark, tmp_path):
    sdf = _json_stream(spark, tmp_path, [{"value": "x"}], "value string")
    with pytest.raises(Exception, match="kafka|Kafka|DATA_SOURCE"):
        q = ks.kafka_sink(sdf, "localhost:9092", "t", str(tmp_path / "ck"))
        q.awaitTermination(5)


# -------------------------------------------------------------- scheduler

def test_cron_next_fire_basics():
    t0 = dt.datetime(2026, 8, 13, 9, 30)
    assert CronTrigger("* * * * *").next_fire(t0) == dt.datetime(2026, 8, 13, 9, 31)
    assert CronTrigger("*/15 * * * *").next_fire(t0) == dt.datetime(2026, 8, 13, 9, 45)
    assert CronTrigger("0 12 * * *").next_fire(t0) == dt.datetime(2026, 8, 13, 12, 0)
    # month rollover: Aug 31 -> next Sep 1 00:05
    assert CronTrigger("5 0 1 * *").next_fire(dt.datetime(2026, 8, 31, 23, 59)) == dt.datetime(
        2026, 9, 1, 0, 5
    )


def test_cron_dom_dow_either_semantics():
    # 2026-08-13 is a Thursday (dow 4). dom=20 OR dow=Fri(5): Friday the
    # 14th comes before the 20th -> standard "either" rule picks Fri.
    t0 = dt.datetime(2026, 8, 13, 10, 0)
    assert CronTrigger("0 9 20 * 5").next_fire(t0) == dt.datetime(2026, 8, 14, 9, 0)
    # dow restricted only: next Sunday
    assert CronTrigger("0 9 * * 0").next_fire(t0) == dt.datetime(2026, 8, 16, 9, 0)


def test_cron_dow_seven_in_ranges_and_steps():
    # ADVICE r2: '7' must parse inside ranges/steps, folding to Sunday —
    # a textual replace("7","0") turned '1-7' into the empty '1-0' (then
    # "never fires") and '*/7' into a step-0 crash.
    t0 = dt.datetime(2026, 8, 13, 10, 0)  # Thursday
    # every day of the week: next minute qualifies
    assert CronTrigger("0 9 * * 1-7").next_fire(t0) == dt.datetime(2026, 8, 14, 9, 0)
    # */7 over 0-7 = {0, 7} -> both mean Sunday
    assert CronTrigger("0 9 * * */7").next_fire(t0) == dt.datetime(2026, 8, 16, 9, 0)
    # bare 7 == Sunday
    assert CronTrigger("0 9 * * 7").next_fire(t0) == dt.datetime(2026, 8, 16, 9, 0)


def test_scheduler_interval_and_date():
    now = dt.datetime(2026, 1, 1, 0, 0)
    s = Scheduler()
    hits = []
    s.add_job(lambda: hits.append("i"), "iv", seconds=60, now=now)
    s.add_job(lambda: hits.append("d"), "once", at=dt.datetime(2026, 1, 1, 0, 2), now=now)
    assert s.run_pending(now + dt.timedelta(seconds=30)) == []
    assert s.run_pending(now + dt.timedelta(seconds=61)) == ["iv"]
    # 5 minutes elapse: interval fires ONCE (coalesce), date fires and is removed
    fired = s.run_pending(now + dt.timedelta(minutes=5))
    assert sorted(fired) == ["iv", "once"]
    assert [j.name for j in s.get_jobs()] == ["iv"]
    assert hits == ["i", "i", "d"]


def test_scheduled_pipeline_on_cron_tick(spark, tmp_path):
    # when.py:73-194 flow: a cron tick drains a pipeline incrementally
    d = tmp_path / "ev"
    d.mkdir()
    with open(d / "a.json", "w") as f:
        f.write('{"v": 1}\n{"v": 2}\n')
    results = {}
    job = scheduled_pipeline_job(
        lambda: spark.readStream.schema("v long").json(str(d))
        .groupBy().agg(F.sum("v").alias("s")),
        "t_cron_run",
        output_mode="complete",
    )
    s = Scheduler(on_result=lambda name, df: results.update({name: df.collect()[0].s}))
    now = dt.datetime(2026, 8, 13, 9, 59)
    s.add_job(job, "tick", cron="0 * * * *", now=now)
    assert s.jobs["tick"].next_run == dt.datetime(2026, 8, 13, 10, 0)
    assert s.run_pending(dt.datetime(2026, 8, 13, 10, 0)) == ["tick"]
    assert results["tick"] == 3


def test_cron_step_day_fields_are_unrestricted():
    # r11 review: Vixie rule — a day field is "restricted" iff it does
    # not START with '*', so '*/2' dom combines with dow by AND.
    # 2026-08-13 is a Thursday; next Monday (dow 1) is Aug 17 (odd).
    t0 = dt.datetime(2026, 8, 13, 9, 30)
    # dom '*/2' = odd days (1,3,...31); with dow 1 restricted, fire only
    # on Mondays that are odd days: Aug 17 Mon(odd) qualifies.
    got = CronTrigger("30 4 */2 * 1").next_fire(t0)
    assert got == dt.datetime(2026, 8, 17, 4, 30)
    # the old EITHER rule would have fired Fri Aug 14 (dow miss, dom hit)
    assert got.isoweekday() == 1


def test_cron_reversed_range_raises_at_parse():
    with pytest.raises(ValueError, match="matches nothing"):
        CronTrigger("30-20 * * * *").next_fire(dt.datetime(2026, 1, 1))
    with pytest.raises(ValueError, match="step must be positive"):
        CronTrigger("*/0 * * * *").next_fire(dt.datetime(2026, 1, 1))


def test_cron_leap_day_across_2100_gap():
    # r11 review: from 2096-03-01 the next Feb 29 is 2104 (2100 is not a
    # leap year) — 8 years out, beyond the old 4-year minute scan.
    got = CronTrigger("0 0 29 2 *").next_fire(dt.datetime(2096, 3, 1))
    assert got == dt.datetime(2104, 2, 29, 0, 0)


def test_scheduler_past_one_shot_catches_up():
    # r11 review: add_job(at=<past>) must fire at the next run_pending
    # (missed one-shot catch-up), then auto-remove — not sit dead forever.
    s = Scheduler()
    now = dt.datetime(2026, 8, 13, 12, 0)
    hits = []
    s.add_job(lambda: hits.append(1), "late", at=now - dt.timedelta(hours=1), now=now)
    assert s.jobs["late"].next_run == now
    assert s.run_pending(now) == ["late"]
    assert hits == [1] and "late" not in s.jobs
