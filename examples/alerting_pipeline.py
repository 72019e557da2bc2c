"""End-to-end alerting flow — the reference's flagship §3.3 loop
(timer → fetch → strategy → alert → archive) rebuilt Spark-first.

A cron tick drains the staged event stream incrementally
(Trigger.AvailableNow), the strategy flags z-score anomalies, alerts go
out through the signed-webhook sink (spool transport offline — swap in
`default_http_post` with a real DingTalk-style webhook), and every alert
is archived onto a cross-process topic (FileTopicBroker; swap in
RedisTopicBroker against a live broker).

Run: python examples/alerting_pipeline.py [sf_dir]
"""

import datetime as dt
import functools
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deva_spark.operators import anomaly
from deva_spark.session import get_spark
from deva_spark.sources import endpoints, topic
from deva_spark.streaming import twin
from deva_spark.streaming.scheduler import Scheduler


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-alerting", cpus=8)
    work = tempfile.mkdtemp(prefix="deva_alerting_")
    sent_dir = os.path.join(work, "sent")
    broker_root = os.path.join(work, "topics")
    staged = twin.stage_event_chunks(spark, sf_dir, chunks=4, out_dir=os.path.join(work, "staged"))

    def strategy_tick():
        """One scheduled run: drain the backlog, flag anomalies, alert."""
        stream = twin.events_file_stream(spark, staged, files_per_trigger=2)
        # strategy: per-user z-score outliers (two-pass batch form runs
        # fine per micro-batch drain; the online twin is stateful.welford)
        out = twin.run_available_now(
            stream.select("event_id", "user_id", "value"), "alerts_in", "append"
        )
        # stage the drained batch (memory-sink plans can't self-join; a
        # real pipeline lands micro-batches in a table anyway)
        drained_path = os.path.join(work, "drained")
        out.write.mode("overwrite").parquet(drained_path)
        drained = spark.read.parquet(drained_path)
        flagged = drained.transform(
            anomaly.zscore_flags("user_id", "value", min_obs=30, threshold=3.0)
        ).select(
            F.concat(F.lit("@md@anomaly|event "), F.col("event_id").cast("string"),
                     F.lit(" user "), F.col("user_id").cast("string"),
                     F.lit(" value "), F.col("value").cast("string")).alias("msg"),
        )
        # alert: signed webhook, executor-side, spool transport offline
        deliver = endpoints.spool_transport(sent_dir)
        rows = flagged.collect()
        send = endpoints.with_retries(deliver)
        for r in rows:
            url = endpoints.sign_webhook_url(
                "https://hooks.example.invalid/robot/send?access_token=demo", "SECdemo"
            )
            send(url, json.dumps(endpoints.build_webhook_payload(r.msg)))
        # archive: publish alerts onto a cross-process topic
        topic.publish(
            flagged, functools.partial(topic.FileTopicBroker, broker_root),
            "alerts", value_col="msg", max_len=1000,
        )
        return len(rows)

    try:
        sched = Scheduler()
        now = dt.datetime.now()
        sched.add_job(strategy_tick, "strategy", cron="* * * * *", now=now)
        fired = sched.run_pending(now + dt.timedelta(minutes=1, seconds=1))
        n = sched.jobs["strategy"].last_result
        print(f"fired={fired} alerts={n}")
        print(f"webhook deliveries: {len(os.listdir(sent_dir)) if os.path.exists(sent_dir) else 0}")
        broker = topic.FileTopicBroker(broker_root)
        archived = broker.xread("alerts")
        print(f"archived on topic: {len(archived)}")
        for _id, msg in archived[:3]:
            print("  ", msg[:80])
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
