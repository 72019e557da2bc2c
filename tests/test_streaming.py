"""t1 smoke: streaming twins must equal their batch counterparts on the
same rows (FIXTURES.md §2 contract — equivalence check, not DuckDB hash).
"""

import shutil

import pytest
from pyspark.sql import functions as F

from deva_spark.operators import windows
from deva_spark.operators.aggregates import MONEY
from deva_spark.session import read_table
from deva_spark.streaming import stateful, twin


@pytest.fixture(scope="module")
def staged(spark, sf_dir):
    d = twin.stage_event_chunks(spark, sf_dir, chunks=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_covers_all_rows(spark, staged, batch_events):
    s = twin.events_file_stream(spark, staged)
    got = twin.run_available_now(
        s.groupBy().agg(F.count(F.lit(1)).alias("n")), "t_allrows"
    ).collect()[0]["n"]
    assert got == batch_events.count()


def test_tumbling_window_equivalence(spark, staged, batch_events):
    s = twin.events_file_stream(spark, staged)
    stream_res = twin.run_available_now(twin.tumbling_counts(s), "t_tumble")
    batch_res = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("value").cast(MONEY)), 2).cast("double").alias("sv"),
        )
        .select(F.col("w.start").alias("w"), "event_type", "cnt", "sv")
    )
    cols = ["w", "event_type", "cnt", "sv"]
    assert canon(stream_res, cols) == canon(batch_res, cols)


def test_session_window_equivalence(spark, staged, batch_events):
    s = twin.events_file_stream(spark, staged)
    stream_res = twin.run_available_now(twin.session_counts(s), "t_sess")
    # batch twin: lag-based sessionization -> same (user, session-size) bags
    batch_sessions = (
        batch_events.transform(windows.sessionize(30))
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = sorted((r.user_id, r.cnt) for r in stream_res.collect())
    b = sorted((r.user_id, r.cnt) for r in batch_sessions.collect())
    assert a == b


def test_streaming_dedup_first_seen(spark, staged, batch_events):
    s = twin.events_file_stream(spark, staged)
    stream_res = twin.run_available_now(
        twin.streaming_first_seen(s, ["user_id", "event_type"]),
        "t_dedup",
        output_mode="append",
    )
    # state-store dedup emits exactly one row per key; the first-seen batch
    # twin picks the same keys (values may differ only if ties — none here)
    assert stream_res.count() == batch_events.select("user_id", "event_type").distinct().count()


def test_foreach_batch_latest_lossy(spark, staged):
    s = twin.events_file_stream(spark, staged)
    batches: list = []
    twin.foreach_batch_collect(
        s, lambda bdf: twin.latest_per_key(bdf, ["user_id"]), batches
    )
    assert len(batches) >= 2  # multiple micro-batches (files_per_trigger=1)
    for _, rows in batches:
        users = [r.user_id for r in rows]
        assert len(users) == len(set(users))  # lossy: one row per key per trigger


def test_stateful_running_sum_equivalence(spark, staged, batch_events):
    s = twin.events_file_stream(spark, staged)
    stream_res = twin.run_available_now(
        stateful.streaming_running_sum(s), "t_runsum", output_mode="append"
    )
    batch_res = batch_events.transform(
        windows.running_fold(F.sum("value"), out="rs", partition="user_id")
    ).select("user_id", "event_id", F.round("rs", 2).alias("rs"))
    a = sorted((r.user_id, r.event_id, r.rs) for r in stream_res.collect())
    b = sorted((r.user_id, r.event_id, r.rs) for r in batch_res.collect())
    assert a == b


def test_stateful_zscore_matches_online_semantics(spark, staged):
    s = twin.events_file_stream(spark, staged)
    out = twin.run_available_now(
        stateful.streaming_zscore_anomalies(s), "t_zscore", output_mode="append"
    )
    # online semantics: flags only after 30 prior observations, |z|>=3
    for r in out.collect():
        assert abs(r.z) >= 3.0


def test_streaming_ewma_matches_batch(spark, staged, batch_events):
    from deva_spark.operators.smoothing import ewma

    s = twin.events_file_stream(spark, staged)
    stream_res = twin.run_available_now(
        stateful.streaming_ewma(s, alpha=0.3), "t_ewma", output_mode="append"
    )
    batch_res = batch_events.transform(ewma(alpha=0.3)).select(
        "user_id", "event_id", "ewma"
    )
    a = sorted((r.user_id, r.event_id, round(r.ewma, 9)) for r in stream_res.collect())
    b = sorted((r.user_id, r.event_id, round(r.ewma, 9)) for r in batch_res.collect())
    assert a == b


def test_streaming_funnel_equivalence(spark, staged, batch_events):
    # drained conversions must equal the batch min-ts chaining even when
    # a user's funnel advance spans micro-batch boundaries (chunked
    # backlog, 1 file per trigger = maximum fragmentation)
    from deva_spark.operators.analytics import funnel_counts

    steps = ["signup", "view", "click", "purchase"]
    s = twin.events_file_stream(spark, staged, files_per_trigger=1)
    conv = twin.run_available_now(
        stateful.streaming_funnel(s, steps), "t_funnel", output_mode="append"
    )
    stream_counts = {
        r.step: r.users
        for r in conv.groupBy("step").agg(F.count(F.lit(1)).alias("users")).collect()
    }
    batch_counts = {
        r.step: r.users for r in funnel_counts(batch_events, steps).collect()
    }
    # batch emits all steps (possibly 0); the stream only emits reached ones
    assert stream_counts == {k: v for k, v in batch_counts.items() if v > 0}
    # exactly-once per (user, step)
    assert conv.count() == conv.select("user_id", "step").distinct().count()


def test_streaming_incremental_dedup_equivalence(spark, sf_dir):
    # x78: documents stream (new batch) x staged corpus index via
    # stream-static join + streaming count — the drained result must
    # equal the batch new-x-old pair computation regardless of how the
    # backlog micro-batches (counts decompose over batches)
    from deva_spark.functions.substring import (
        incremental_dup_pairs,
        window_hashes,
    )

    docs = read_table(spark, sf_dir, "documents")
    threshold = 450
    idx = window_hashes(docs, window=8).persist()
    try:
        batch = {
            (r.id_a, r.id_b): r.n_common
            for r in incremental_dup_pairs(
                idx.filter(F.col("doc_id") >= threshold),
                idx.filter(F.col("doc_id") < threshold),
            ).collect()
            # restrict to the cross (new x old) side the stream computes
            if r.id_a < threshold
        }
        d = twin.stage_doc_chunks(spark, sf_dir, chunks=3, where=f"doc_id >= {threshold}")
        try:
            old = idx.filter(F.col("doc_id") < threshold)
            s = twin.docs_file_stream(spark, d, files_per_trigger=1)
            got = {
                (r.id_a, r.id_b): r.n_common
                for r in twin.run_available_now(
                    twin.streaming_incremental_pairs(s, old, window=8),
                    "t_inc_dedup",
                    output_mode="complete",
                ).collect()
            }
            assert got == batch and len(got) > 0
        finally:
            shutil.rmtree(d, ignore_errors=True)
    finally:
        idx.unpersist()


def test_state_partitions_scoped_and_result_invariant(spark, staged, batch_events):
    # The override must (a) leave results identical — state partition
    # count is physical, never semantic — and (b) restore the session
    # value afterwards, including when the drain FAILS (the finally
    # path), so a drain can't silently deflate the batch parallelism of
    # everything planned after it.
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    s = twin.events_file_stream(spark, staged)
    res = twin.run_available_now(
        twin.tumbling_counts(s), "t_sp4", state_partitions=4
    )
    assert spark.conf.get(key) == before
    cols = ["w", "event_type", "cnt", "sv"]
    base = twin.run_available_now(twin.tumbling_counts(
        twin.events_file_stream(spark, staged)), "t_sp_base")
    assert canon(res, cols) == canon(base, cols)

    # failure path: complete-mode requires an aggregation; a bare
    # projection drain in complete mode raises at start() — after the
    # raise the session conf must already be restored
    bad = twin.events_file_stream(spark, staged).select("event_id")
    with pytest.raises(Exception):
        twin.run_available_now(
            bad, "t_sp_bad", output_mode="complete", state_partitions=4
        )
    assert spark.conf.get(key) == before


def test_state_store_provider_scoped_and_result_invariant(spark, staged):
    # VERDICT r11 #6: the RocksDB knob exists for deployments whose
    # per-partition state exceeds executor heap; results must be
    # provider-invariant and the session conf restored after the drain.
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(prov_key, None)
    cols = ["w", "event_type", "cnt", "sv"]
    rocks = twin.run_available_now(
        twin.tumbling_counts(twin.events_file_stream(spark, staged)),
        "t_prov_rocks",
        state_partitions=4,
        state_store_provider="rocksdb",
    )
    assert spark.conf.get(prov_key, None) == before
    base = twin.run_available_now(
        twin.tumbling_counts(twin.events_file_stream(spark, staged)),
        "t_prov_base",
        state_partitions=4,
    )
    assert canon(rocks, cols) == canon(base, cols) and rocks.count() > 0


def test_stream_drain_suite_stays_bounded():
    # VERDICT r11 #6 regression bound: the recorded streaming panel
    # (tools/bench_stream.py, refreshed per round on the quiet machine)
    # must keep the 10-drain suite under 30 s at sf0.1 — a drain whose
    # micro-batch planning or state maintenance regresses shows up here
    # via the artifact, without re-paying the panel inside pytest.
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_STREAM.json")
    rec = json.load(open(path))
    assert rec["sf"] == 0.1
    assert len(rec["drains"]) == 10
    assert rec["value"] <= 30.0, rec["value"]
