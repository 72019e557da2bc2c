"""Tests for the x45-x49 pretraining-pipeline operators: sequence
packing, mixture rebalancing, int8 quantization, boilerplate stats, and
the event-time streaming first-seen."""

import pandas as pd
from pyspark.sql import functions as F

from deva_spark.functions import vectors as V
from deva_spark.operators.packing import greedy_pack
from deva_spark.operators.sampling import mixture_rebalance
from deva_spark.plans.corpus import boilerplate_stats


def _replay_pack(sizes, capacity):
    """Reference greedy walk: start a new pack when adding would overflow."""
    out, pack, cum = [], 0, 0
    for s in sizes:
        if cum > 0 and cum + s > capacity:
            pack, cum = pack + 1, 0
        out.append(pack)
        cum += s
    return out


def test_greedy_pack_matches_sequential_walk(spark):
    rows = [
        ("a", i, s)
        for i, s in enumerate([10, 20, 100, 120, 5, 300, 7, 250, 250, 1])
    ] + [("b", i, s) for i, s in enumerate([256, 256, 1, 255, 2])]
    df = spark.createDataFrame(rows, "shard string, ord int, sz long")
    got = (
        greedy_pack(df, "shard", "ord", "sz", capacity=256)
        .orderBy("shard", "ord")
        .collect()
    )
    for shard in ("a", "b"):
        sizes = [r.sz for r in got if r.shard == shard]
        expect = _replay_pack(sizes, 256)
        assert [r.pack_id for r in got if r.shard == shard] == expect


def test_greedy_pack_oversize_row_gets_own_pack(spark):
    df = spark.createDataFrame(
        [("s", 0, 500), ("s", 1, 10), ("s", 2, 600)], "shard string, ord int, sz long"
    )
    got = {r.ord: r.pack_id for r in greedy_pack(df, "shard", "ord", "sz", 256).collect()}
    # each row opens its own pack except the small one following the first
    assert got[0] == 0 and got[1] == 1 and got[2] == 2


def test_greedy_pack_partition_invariant(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n"))
    )
    a = greedy_pack(docs, "source", "doc_id", "n", 256).orderBy("source", "doc_id").collect()
    b = (
        greedy_pack(docs.repartition(13), "source", "doc_id", "n", 256)
        .orderBy("source", "doc_id")
        .collect()
    )
    assert [r.pack_id for r in a] == [r.pack_id for r in b]
    # packs never overflow capacity unless the single row itself does
    pdf = pd.DataFrame([r.asDict() for r in a])
    per_pack = pdf.groupby(["source", "pack_id"]).agg(tot=("n", "sum"), n_rows=("n", "size"))
    over = per_pack[per_pack.tot > 256]
    assert (over.n_rows == 1).all()


def test_mixture_rebalance_shrinks_majority_keeps_minority(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    out = docs.transform(mixture_rebalance("lang", "doc_id"))
    after = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    smallest = min(before, key=before.get)
    # smallest group keeps 100%
    assert after[smallest] == before[smallest]
    # every other group keeps a subset, and relative spread narrows
    for lang, cnt in before.items():
        assert after.get(lang, 0) <= cnt
    spread_before = max(before.values()) / min(before.values())
    spread_after = max(after.values()) / min(after.values())
    assert spread_after < spread_before
    # deterministic: same ids under a different partitioning
    ids1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in docs.repartition(7)
        .transform(mixture_rebalance("lang", "doc_id"))
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_quantize_int8_roundtrip_error_bound(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    q = emb.select(
        "embedding",
        V.dequantize_int8(V.quantize_int8(F.col("embedding"))).alias("deq"),
        V.quantize_int8(F.col("embedding")).alias("qs"),
    )
    for r in q.collect():
        scale = r.qs["scale"]
        assert all(-127 <= c <= 127 for c in r.qs["q"])
        # symmetric quantization error <= scale/254 per component (half a step)
        step = scale / 127.0
        for orig, deq in zip(r.embedding, r.deq):
            assert abs(float(orig) - deq) <= step / 2 + 1e-12


def test_quantize_int8_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0, 0.0],)], "embedding array<double>")
    r = df.select(V.quantize_int8(F.col("embedding")).alias("q")).first()
    assert r.q["scale"] == 0.0 and list(r.q["q"]) == [0, 0, 0]


def test_boilerplate_stats_flags_shared_template(spark):
    template = "copyright acme corp all rights reserved"
    uniq = ["alpha beta gamma delta epsilon zeta {}".format(i) for i in range(3)]
    rows = [(i, f"{uniq[i]} {template}") for i in range(3)]
    rows.append((9, "totally unrelated words here nothing shared at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in boilerplate_stats(df, n=5, min_docs=3).collect()}
    # the template 5-grams recur in 3 docs -> counted common
    for i in range(3):
        assert got[i].n_common >= 2  # "copyright acme corp all rights", "acme corp all rights reserved"
        assert got[i].n_shingles > got[i].n_common
    assert got[9].n_common == 0


def test_streaming_first_event_matches_batch_oracle(spark, sf_dir, tmp_path):
    from deva_spark.streaming.twin import (
        events_file_stream,
        run_available_now,
        stage_event_chunks,
        streaming_first_event,
    )

    staged = stage_event_chunks(spark, sf_dir, chunks=4, out_dir=str(tmp_path / "staged"))
    batch = spark.read.parquet(staged)
    s = events_file_stream(spark, staged, files_per_trigger=1)
    out = run_available_now(
        streaming_first_event(s, "user_id"), "t_first_event", output_mode="complete"
    )
    got = {r.user_id: (r.first_ts, r.first_event_id) for r in out.collect()}
    oracle = {
        r.user_id: (r.ts, r.event_id)
        for r in batch.groupBy("user_id")
        .agg(F.min_by(F.struct("ts", "event_id"), F.struct("ts", "event_id")).alias("f"))
        .select("user_id", F.col("f.ts").alias("ts"), F.col("f.event_id").alias("event_id"))
        .collect()
    }
    assert got == oracle
