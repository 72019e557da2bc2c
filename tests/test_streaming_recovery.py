"""Exactly-once recovery: a checkpointed streaming query killed mid-backlog
and restarted must produce every row exactly once — the durability the
reference lacks entirely (SURVEY §2.10: at-most-once in-memory)."""

import os
import shutil
import time

from pyspark.sql import functions as F

from deva_spark.session import read_table
from deva_spark.streaming import twin


def test_checkpoint_restart_no_dupes_no_loss(spark, sf_dir, tmp_path):
    staged = twin.stage_event_chunks(spark, sf_dir, chunks=6)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    try:
        def start():
            s = twin.events_file_stream(spark, staged, files_per_trigger=1)
            return (
                s.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="0 seconds")
                .start()
            )

        q = start()
        # let it commit at least one micro-batch, then kill mid-backlog
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(p.get("numInputRows", 0) > 0 for p in q.recentProgress):
                break
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()

        # restart from the same checkpoint and drain the rest
        s2 = twin.events_file_stream(spark, staged, files_per_trigger=1)
        q2 = (
            s2.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()

        got = spark.read.parquet(out_dir)
        total = read_table(spark, sf_dir, "events").count()
        assert got.count() == total  # no loss, no duplicates
        assert got.select("event_id").distinct().count() == total
    finally:
        shutil.rmtree(staged, ignore_errors=True)
