"""Amplified-scale (~sf1) benchmark of the heavy dedup/ANN/graph tiers.

VERDICT r7 #7: the fixed-cost-floor argument predicts the spark/duckdb
ratios of the heavy tiers cross below 1 as data grows; this measures it.
No sf1 testdata exists (and /root/testdata is read-only), so this tool
builds a DETERMINISTIC 10x amplification of sf0.1 under
``bench_data/sf1/`` (repo-local, gitignored):

- ``documents``: 10 replicas; replica r > 0 offsets doc_id by r*1e6 and
  prefixes every token with ``r{r}`` — within-replica dedup structure
  is preserved (pair counts scale linearly) while cross-replica shingle
  sets are disjoint (no artificial quadratic near-dup blowup), and the
  shingle vocabulary grows ~10x like a real corpus.
- ``embeddings``: 10 replicas; vec_id offset; deterministic per-replica
  perturbation (x + 0.017*r*sin(i + 1.3*r) per coordinate) keeps
  replicas semantically distinct.
- ``orders``/``lineitem``: 10 replicas with key offsets — the x61 graph
  becomes 10 disjoint copies (nodes and edges both 10x).

Both engines read the SAME amplified parquet; per-query timing is the
min of N_RUNS warm runs. Spark artifacts are staged OUTSIDE the timed
window (bench.py's methodology). Output: one JSON line, written to
BENCH_SF1.json.

Usage: python tools/bench_sf1.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from deva_spark.session import TABLES, get_spark  # noqa: E402
from deva_spark import queries as Q  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_data",
    "sf1",
)
REPLICAS = 10
N_RUNS = 2

HEAVY = [
    "x05_ngram_jaccard",
    "x06_minhash_lsh_neardup",
    "x07_simhash_neardup",
    "x08_cosine_topk",
    "x09_ann_lsh_topk",
    "x23_cosine_neardup",
    "x32_ivf_topk",
    "x41_dedup_clusters",
    "x55_cross_source_overlap",
    "x61_pagerank_two_steps",
    "x66_semdedup_prune",
    "x74_substring_dup_pairs",
    "x75_longest_common_run",
    "x76_remove_duplicate_runs",
    "x77_incremental_dup_pairs",
    "x80_incremental_minhash_neardup",
    "x81_incremental_dedup_clusters",
    "x82_incremental_simhash_neardup",
    "x83_incremental_exact_dedup",
    "x84_incremental_corpus_stats",
    "x85_kmv_rollup_distinct_users",
    "x86_incremental_shingle_overlap",
    # r8 fourth-session tier. events/customer stay UNAMPLIFIED
    # (symlinked sf0.1), so x93/x94/x97 measure the floor, not growth —
    # recorded for trend continuity; x95/x96/x98/x99/x100 ride the
    # amplified tables.
    "x93_quantile_rollup",
    "x94_cms_heavy_hitters",
    "x95_bloom_pruned_join",
    "x96_kmv_source_overlap",
    "x97_salted_skew_join",
    "x98_zorder_box_scan",
    "x99_incremental_weighted_sample",
    "x100_document_chunks",
    # r9 tier: IVF-PQ rides the amplified embeddings (the compressed
    # index at 10x corpus), x104 the amplified documents, x105 the
    # amplified lineitem through the staged Morton relayout; x106 is a
    # floor row (events/customer unamplified).
    "x101_ivfpq_adc_search",
    "x102_ivfpq_rerank_search",
    "x103_ivfpq_append_search",
    "x104_cjk_bigram_token_freq",
    "x105_zorder_staged_box_scan",
    "x106_cms_join_size_estimate",
    # r14 tier: BPE token pricing over the staged trained vocab and the
    # joint text+image cluster resolution both ride the amplified
    # documents. (Training itself — x120 — is excluded like x111:
    # sequential argmax rounds.) Their oracles do comparable SQL work
    # (the unrolled merge chain; the recursive-CTE resolution), so they
    # belong in the like-for-like ratio, unlike the media-codec rows,
    # which are timed in the separate `media` section below.
    "x121_bpe_token_counts",
    "x122_multimodal_dedup_clusters",
    "x124_bpe_unseen_batch_tokens",
]

#: r14 media rows timed OUTSIDE the ratio: their DuckDB oracles are
#: pure doc arithmetic (near-zero), so including them would skew the
#: suite-level like-for-like ratio without measuring anything — the
#: VERDICT r13 point about x115-x117's per-query ratios. Recorded as
#: absolute Spark seconds at 10x data: the scale trend is the signal.
MEDIA = [
    "x115_image_neardup_pairs",
    "x117_incremental_image_neardup",
    "x118_video_neardup_pairs",
    "x119_incremental_video_neardup",
    "x123_resampled_video_neardup",
]


def build(spark) -> None:
    os.makedirs(OUT, exist_ok=True)
    rs = list(range(REPLICAS))

    def _amplify(name: str, per_replica):
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(dst):
            return
        base = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        parts = [per_replica(base, r) for r in rs]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # one file per replica is plenty of read parallelism here
        df.repartition(32).write.mode("overwrite").parquet(dst + ".tmp")
        os.rename(dst + ".tmp", dst)

    def _docs(base, r):
        if r == 0:
            return base
        toks = F.split(F.trim(F.col("text")), r"\s+")
        text = F.array_join(
            F.transform(toks, lambda t: F.concat(F.lit(f"r{r}"), t)), " "
        )
        return base.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        )

    def _embs(base, r):
        # per-replica ORTHOGONAL transform (coordinate rotation by 7r +
        # deterministic sign flips): within-replica pairwise cosines are
        # preserved EXACTLY (near-dup structure scales linearly), while
        # cross-replica cosines decorrelate to ~0 (no artificial
        # quadratic pair blowup — additive noise either left replicas
        # near-identical or destroyed within-replica structure)
        if r == 0:
            return base
        dim = 64
        pert = F.transform(
            F.col("embedding"),
            lambda x, i: (
                F.element_at(F.col("embedding"), (i + 7 * r) % dim + 1)
                * (
                    1
                    - 2
                    * (
                        (i.cast("bigint") * 1103515245 + r * 12345)
                        % 97
                        % 2
                    ).cast("int")
                )
            ).cast("float"),
        )
        return base.select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
            pert.alias("embedding"),
            "label",
        )

    def _orders(base, r):
        if r == 0:
            return base
        return base.select(
            (F.col("o_orderkey") + r * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + r * 1_000_000).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )

    def _lineitem(base, r):
        if r == 0:
            return base
        return base.select(
            (F.col("l_orderkey") + r * 10_000_000).alias("l_orderkey"),
            "l_partkey",
            (F.col("l_suppkey") + r * 1_000_000).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )

    _amplify("documents", _docs)
    _amplify("embeddings", _embs)
    _amplify("orders", _orders)
    _amplify("lineitem", _lineitem)


def incremental_operational(spark) -> dict:
    """The OPERATIONAL shape the registry entries can't show at this
    panel's amplified scale (their fixed doc_id>=450 split makes the
    "batch" 99% of the corpus — the degeneracy recorded for x77): a
    1% arrival batch (the last 500 doc_ids of replica 9) against the
    staged 99% corpus. For each dedup tier, times the incremental
    operator (old-side index STAGED outside the window, per contract)
    against the full-recompute alternative — the SAME operator over
    (whole corpus, empty old), i.e. the identical code path with only
    the input split changed. Min of N_RUNS warm runs, Spark vs Spark.
    """
    from deva_spark.functions import minhash as mh
    from deva_spark.functions import simhash as sh
    from deva_spark.functions.substring import (
        incremental_dup_pairs,
        window_hashes,
    )
    from deva_spark.operators import aggregates as agg
    from deva_spark.operators import dedup

    CUT = 9_004_500  # replica 9's last 500 docs = 1% of the corpus
    docs = spark.read.parquet(os.path.join(OUT, "documents.parquet"))
    # In production the arrival batch IS its own files — a batch-sized
    # scan. Filtering the merged corpus parquet instead would charge
    # every incremental path a full-corpus scan (doc_ids are spread
    # across every row group, so nothing prunes), which is a benchmark
    # artifact, not the operational shape. Materialize the batch (and
    # the batch's slices of the staged per-doc tables) once, outside
    # the timed window, exactly like arrival files on disk.
    batch_dir = os.path.join(OUT, "_arrival_batch")
    if not os.path.exists(batch_dir):
        docs.filter(F.col("doc_id") >= CUT).coalesce(4).write.parquet(
            batch_dir
        )
    new_docs = spark.read.parquet(batch_dir)
    old_docs = docs.filter(F.col("doc_id") < CUT)
    corpus_docs, batch_docs = docs.count(), new_docs.count()

    def arrival(df, name):
        """Batch slice of a staged per-doc table, as its own files."""
        d = os.path.join(OUT, f"_arrival_{name}")
        if not os.path.exists(d):
            df.coalesce(4).write.parquet(d)
        return spark.read.parquet(d)

    def timed(make_df):
        # untimed warm-up first (the bench.py methodology): it
        # materializes any lazy arrival() parquet write and fills footer
        # caches, so the timed window measures the per-batch compute —
        # previously the FIRST timed run paid arrival()'s write inside
        # the perf_counter window and only min-of-N hid it (r11 review)
        make_df().count()
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            n = make_df().count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3), n

    res: dict = {
        "batch_docs": batch_docs,
        "corpus_docs": corpus_docs,
        "tiers": {},
    }

    def tier(name, stage, inc, full):
        staged = {k: v.persist() for k, v in stage().items()}
        for v in staged.values():
            v.count()
        inc_sec, inc_rows = timed(lambda: inc(staged))
        full_sec, full_rows = timed(full)
        for v in staged.values():
            v.unpersist()
        res["tiers"][name] = {
            "inc_sec": inc_sec,
            "full_sec": full_sec,
            "speedup": round(full_sec / inc_sec, 1) if inc_sec else None,
            "inc_rows": inc_rows,
            "full_rows": full_rows,
        }
        print(
            f"operational {name}: inc={inc_sec}s full={full_sec}s",
            file=sys.stderr,
        )

    # substring tier (x77 anatomy): the batch's window index is part of
    # the timed per-batch cost; only the OLD index is staged
    all_idx = window_hashes(docs, window=8)
    tier(
        "substring",
        lambda: {"old": window_hashes(old_docs, window=8)},
        lambda s: incremental_dup_pairs(
            window_hashes(new_docs, window=8), s["old"]
        ),
        lambda: incremental_dup_pairs(all_idx, all_idx.limit(0)),
    )

    # MinHash tier (x80): the signature table is a staged shared
    # artifact for BOTH routes (parquet); only the OLD band projection
    # is staged — the batch's banding + joins + verify are timed
    sigs_path = Q.staged_artifact_path(OUT, "doc_sigs")
    sigs = (
        spark.read.parquet(sigs_path)
        if sigs_path
        else mh.signatures(
            docs.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)
        )
    )
    tier(
        "minhash",
        lambda: {
            "old_bands": mh.band_keys(sigs.filter(F.col("doc_id") < CUT)),
        },
        lambda s: mh.incremental_near_duplicates(
            arrival(sigs.filter(F.col("doc_id") >= CUT), "sigs"),
            sigs.filter(F.col("doc_id") < CUT),
            old_bands=s["old_bands"],
        ),
        lambda: mh.incremental_near_duplicates(sigs, sigs.limit(0)),
    )

    # SimHash tier (x82): fingerprints staged for both; OLD chunk
    # projection staged, batch chunking + joins timed
    fps_path = Q.staged_artifact_path(OUT, "simhash_fps")
    fps = (
        spark.read.parquet(fps_path)
        if fps_path
        else sh.fingerprints(docs)
    )
    tier(
        "simhash",
        lambda: {
            "old_chunks": sh.chunk_keys(fps.filter(F.col("doc_id") < CUT)),
        },
        lambda s: sh.incremental_near_duplicates(
            arrival(fps.filter(F.col("doc_id") >= CUT), "fps"),
            fps.filter(F.col("doc_id") < CUT),
            old_chunks=s["old_chunks"],
        ),
        lambda: sh.incremental_near_duplicates(fps, fps.limit(0)),
    )

    # exact tier (x83)
    tier(
        "exact",
        lambda: {"old_digests": dedup.digests(old_docs)},
        lambda s: dedup.incremental_exact_dups(new_docs, s["old_digests"]),
        lambda: dedup.incremental_exact_dups(
            docs, dedup.digests(docs.limit(0))
        ),
    )

    # exact-overlap tier (x86), off the staged 5-gram index
    shp = Q.staged_artifact_path(OUT, "shingle5")
    idx = (
        spark.read.parquet(shp).select("doc_id", "_sh")
        if shp
        else None
    )
    if idx is not None:
        tier(
            "overlap",
            lambda: {
                "old": idx.filter(F.col("doc_id") < CUT),
                "old_sizes": idx.filter(F.col("doc_id") < CUT)
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n")),
            },
            lambda s: mh.incremental_shingle_overlap(
                arrival(idx.filter(F.col("doc_id") >= CUT), "shingles"),
                s["old"],
                old_sizes=s["old_sizes"],
            ),
            lambda: mh.incremental_shingle_overlap(idx, idx.limit(0)),
        )

    # stats tier (x84): batch partial + merge with the staged partials
    from deva_spark.functions import text as T

    old_partials = (
        old_docs.select("lang", T.token_count(F.col("text")).alias("v"))
        .transform(agg.stats_partials("v", keys=["lang"]))
    )
    tier(
        "stats",
        lambda: {"old_partials": old_partials},
        lambda s: new_docs.select(
            "lang", T.token_count(F.col("text")).alias("v")
        )
        .transform(agg.stats_partials("v", keys=["lang"]))
        .unionByName(s["old_partials"])
        .transform(agg.merge_stat_partials(keys=["lang"])),
        lambda: docs.select(
            "lang", T.token_count(F.col("text")).alias("v")
        )
        .transform(agg.stats_partials("v", keys=["lang"]))
        .transform(agg.merge_stat_partials(keys=["lang"])),
    )

    return res


def webdataset_roundtrip(spark) -> dict:
    """WebDataset export/import at the amplified scale (VERDICT r13
    "next" #6): ship the full amplified documents table (10x sf0.1,
    ~50k samples) to tar shards — ``shard_size=320`` puts >100 shards
    on disk, the x114 geometry at 10x data — then stream the tars back
    and audit per-export totals against source-table arithmetic. Write
    is timed once (it is a disk publish, not a repeatable warm pass);
    read is min of N_RUNS warm passes. Replica doc_id offsets (r*1e6)
    make shard ids SPARSE — the export must handle that, and does
    (shard id = key div size; nothing assumes density)."""
    import shutil

    from deva_spark.sources import webdataset as wds

    docs = spark.read.parquet(
        os.path.join(OUT, "documents.parquet")
    ).select("doc_id", "text")
    root = os.path.join(OUT, "_wds_export")
    shutil.rmtree(root, ignore_errors=True)
    res: dict = {}
    t0 = time.perf_counter()
    man = wds.to_webdataset(docs, root, shard_size=320, overwrite=True).collect()
    res["write_sec"] = round(time.perf_counter() - t0, 2)
    res["n_shards"] = len(man)
    res["n_samples"] = int(sum(r.n_samples for r in man))
    res["tar_mb"] = round(sum(r.tar_bytes for r in man) / 1e6, 1)
    best = got = None
    for i in range(N_RUNS + 1):  # pass 0 is the untimed warm-up
        t0 = time.perf_counter()
        got = (
            wds.read_webdataset(spark, root)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.octet_length("data")).alias("b"),
            )
            .collect()[0]
        )
        el = time.perf_counter() - t0
        if i > 0:
            best = el if best is None else min(best, el)
    res["read_sec"] = round(best, 2)
    src = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length(F.coalesce("text", F.lit("")))).alias("b"),
    ).collect()[0]
    res["audit_ok"] = bool(got.n == src.n == res["n_samples"] and got.b == src.b)
    print(f"webdataset: {res}", file=sys.stderr)
    return res


def main() -> int:
    spark = get_spark("bench-sf1")
    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.perf_counter()
    build(spark)
    build_sec = round(time.perf_counter() - t0, 1)

    # amplified tables + the untouched small dims straight from sf0.1
    amplified = {"documents", "embeddings", "orders", "lineitem"}
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(OUT if t in amplified else SRC, f"{t}.parquet")
        if os.path.isdir(p):  # spark writes a directory of part files
            p = os.path.join(p, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{p}')"
        )

    # spark reads the same mixed layout: point _t's table loads at a dir
    # that contains the amplified four; fall back links for the rest
    for t in TABLES:
        if t not in amplified:
            dst = os.path.join(OUT, f"{t}.parquet")
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)

    t0 = time.perf_counter()
    staged = Q.stage_artifacts(spark, OUT)
    staging_sec = round(time.perf_counter() - t0, 1)

    def loadavg() -> float:
        # attribution (VERDICT r11 #5): ambient load alongside the
        # timings so ratio swings are explainable from the artifact
        try:
            return round(os.getloadavg()[0], 1)
        except OSError:
            return -1.0

    out: dict = {
        "metric": "sf1_heavy_tier_suite",
        "sf": "sf0.1 x10 amplified (~sf1)",
        "build_sec": build_sec,
        "staging_sec": staging_sec,
        "runs": N_RUNS,
        "load_start": loadavg(),
        "queries": {},
        "duckdb": {},
        "rows": {},
    }
    for name in HEAVY:
        fn = Q.SPARK_QUERIES[name]
        best = None
        nrows = 0
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            nrows = len(fn(spark, OUT).collect())
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out["queries"][name] = round(best, 3)
        out["rows"][name] = nrows

        sql = Q.ORACLE_SQL.get(name)
        if sql is None:
            out["duckdb"][name] = None
            continue
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out["duckdb"][name] = round(best, 3)
        print(
            f"{name}: spark={out['queries'][name]}s "
            f"duck={out['duckdb'][name]}s rows={nrows}",
            file=sys.stderr,
        )

    spark_total = sum(out["queries"].values())
    duck_total = sum(v for v in out["duckdb"].values() if v)
    out["spark_total"] = round(spark_total, 2)
    out["duckdb_total"] = round(duck_total, 2)
    out["ratio"] = round(spark_total / duck_total, 3) if duck_total else None
    out["load_end"] = loadavg()
    out["media"] = {}
    for name in MEDIA:
        fn = Q.SPARK_QUERIES[name]
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            nrows = len(fn(spark, OUT).collect())
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out["media"][name] = {"sec": round(best, 3), "rows": nrows}
        print(f"media {name}: {out['media'][name]}", file=sys.stderr)
    out["webdataset"] = webdataset_roundtrip(spark)
    out["incremental_operational"] = incremental_operational(spark)
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(OUT), "..", "BENCH_SF1.json"), "w"
    ) as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
