"""Registry infrastructure for the query/oracle contract.

The ``@query`` decorator, the ``SPARK_QUERIES`` / ``ORACLE_SQL``
registries the driver consumes, table loading (``_t``), and the staged
shared-artifact layer (signature/shingle/posting/pair tables built once
per sf_dir — the 100 TB "stage your indexes" discipline; bench.py
reports staging seconds separately so no query's timed cost includes
another query's index build).
"""

from __future__ import annotations



import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deva_spark.functions import minhash as mh
from deva_spark.functions import simhash as sh
from deva_spark.functions import text as T
from deva_spark.functions import vectors as V
from deva_spark.operators import aggregates as agg
from deva_spark.operators import anomaly, dedup, graphs, joins, windows
from deva_spark.operators.aggregates import money_sum, round_money
from deva_spark.session import load_tables, read_parquet, read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


#: Attribute name of the per-session memo of CONSTRUCTED QUERY PLANS,
#: keyed on (query name, sf_dir, corpus fingerprint). Building a
#: registry DataFrame costs ~0.15 s of driver-side py4j latency per
#: query (measured r15: 25 s of a ~97 s steady-state sequential pass was
#: plan construction repeated per pass) — and a DataFrame is an
#: immutable logical plan, so handing the same object back is pure plan
#: reuse: every action still computes from the parquet inputs.
#:
#: THE MEMO ONLY EVER HOLDS PURE PLANS: a construction that launched
#: ANY Spark job (eager synopsis persist+count barriers, driver-side
#: resolution cutovers that embed an ExistingRDD, sampled skew probes,
#: bloom bitmap builds, …) is NEVER memoized — caching such a plan
#: would carry computed RESULTS across bench passes, which is result
#: caching, not plan reuse. The job-count guard makes the distinction
#: definitional rather than a hand-maintained list. Streaming plans are
#: never memoized either. The corpus fingerprint (per-table mtimes, the
#: read-memo's signal) invalidates the memo the moment testdata is
#: regenerated; stage_artifacts() clears it whenever it builds a new
#: artifact so a plan captured against the in-session fallback can't
#: outlive the staging that supersedes it. Lives ON the session object
#: (dies with it, the r15 session-memo discipline).
_PLAN_CACHE_ATTR = "_deva_query_plan_cache"


def _jobs_submitted(spark: SparkSession) -> int | None:
    """Monotonic count of jobs ever submitted to this session's DAG
    scheduler — the pure-plan guard's signal. One py4j call returning
    one int (~1 ms idle, ~8 ms under a 16-thread drain). The
    StatusTracker alternative scans the retained-jobs store and
    measured 238 ms/call under the bench's 16-way concurrency — 2 calls
    per construction convoyed the whole suite (r15). Returns None if
    the scheduler internals ever move, which degrades to never
    memoizing (safe: plans are rebuilt per call, exactly the
    pre-memo behavior)."""
    try:
        return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    except Exception:  # noqa: BLE001 — internal API, degrade safely
        return None


def _plan_cache(spark: SparkSession) -> dict:
    cache = getattr(spark, _PLAN_CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _PLAN_CACHE_ATTR, cache)
    return cache


#: Session confs that query CONSTRUCTION branches on (adaptive cutover
#: thresholds). They are part of the plan-memo key: a test (or caller)
#: flipping one mid-session must get a freshly constructed plan, not a
#: memoized plan built under the old threshold. Any new spark.deva.*
#: construction-time conf must be added here.
_PLAN_CONF_KEYS = (
    "spark.deva.positional.smallInputBytes",
    "spark.deva.graph.driverMaxEdges",
    "spark.deva.bpe.driverMaxWords",
)


def _corpus_fingerprint(spark: SparkSession, sf_dir: str) -> tuple:
    """(name, mtime) per present table — ~10 stat calls, the same
    invalidation signal session.read_table keys its read memo on —
    plus the construction-time cutover confs."""
    from deva_spark.session import TABLES, table_path

    out = []
    for t in TABLES:
        p = table_path(sf_dir, t)
        try:
            out.append((t, _os.path.getmtime(p)))
        except OSError:
            pass
    for k in _PLAN_CONF_KEYS:
        out.append((k, spark.conf.get(k, None)))
    # the artifact root decides whether constructions see staged parquet
    # or the in-session fallback (tests monkeypatch it per-case)
    out.append(("DEVA_ARTIFACT_DIR", _os.environ.get("DEVA_ARTIFACT_DIR")))
    return tuple(out)


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair. The registered callable
    memoizes the constructed plan per (session, sf_dir, corpus
    fingerprint) — see :data:`_PLAN_CACHE_ATTR`."""

    def deco(fn: QueryFn) -> QueryFn:
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (name, sf_dir, _corpus_fingerprint(spark, sf_dir))
            cache = _plan_cache(spark)
            df = cache.get(key)
            if df is None:
                before = _jobs_submitted(spark)
                df = fn(spark, sf_dir)
                ran_jobs = before is None or _jobs_submitted(spark) != before
                if ran_jobs or df.isStreaming:
                    return df
                cache[key] = df
            # hand back a FRESH node over the memoized analyzed plan,
            # never the same DataFrame object: re-executing one object
            # reuses its physical plan's shuffle outputs (Spark skips
            # stages whose map output still exists), which would carry
            # intermediate RESULTS across bench passes. select("*")
            # forces a new QueryExecution — optimizer, physical
            # planning, codegen and every stage re-run per action; only
            # the driver-side CONSTRUCTION of the logical plan is
            # reused (measured: the select-star wrapper re-executes
            # with byte-identical results and full stage re-runs).
            return df.select("*")

        build.__name__ = fn.__name__
        build.__doc__ = fn.__doc__
        SPARK_QUERIES[name] = build
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


#: Shared materialized artifacts — the IndexStream pattern: an index is
#: built once and queried by many queries (x12 keywords + x13 search
#: share one posting table; x06+x15 one signature table; x44/x45/x55 one
#: shingle index; x05+x41 one near-dup pair set).
#:
#: Two tiers (VERDICT r5 "wrong" #2 — the 100 TB story IS the
#: materialized table, so the local mechanism now matches it):
#:
#: 1. STAGED PARQUET, once per (sf_dir, builder version), under
#:    ``spark-warehouse/deva_artifacts`` (override: $DEVA_ARTIFACT_DIR).
#:    ``stage_artifacts()`` writes any missing artifact; afterwards every
#:    consumer just scans the parquet — no first-toucher paying another
#:    query's index build inside its own timed window, and a
#:    ``clearCache`` can't silently re-impose the build. bench.py stages
#:    before timing and reports the staging seconds separately.
#: 2. IN-SESSION persisted fallback when nothing is staged (ad-hoc use,
#:    correctness runs): cached per live session with an eager barrier
#:    (a lazily-cached DF referenced twice inside one job races its own
#:    materialization). WeakKeyDictionary on the session object: entries
#:    die with their session, and a recycled id() can't collide
#:    (VERDICT r2 defect #3).
import os as _os
import weakref

_SHARED: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()

#: bump when any artifact builder's logic changes — stale staged parquet
#: from an older definition must never satisfy a newer read
_ARTIFACT_VERSION = 3  # v3: ivfpq_app split is scale-invariant (% 10)


def _session_cache(spark: SparkSession) -> dict:
    return _SHARED.setdefault(spark, {})


def _build_doc_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deva_spark.functions.search import build_index

    return build_index(_t(spark, sf_dir, "documents"))


def _build_doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(
        F.size(T.words(F.col("text"))) >= 3
    )
    return mh.signatures(docs)


def _build_shingle5_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", T.words(F.col("text")).alias("_ws"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(T.shingles_from_words(F.col("_ws"), n=5))
            ).alias("_s"),
        )
        .select("doc_id", "source", F.xxhash64("_s").alias("_sh"))
    )


def _build_shingle5_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DISTINCT 5-gram counts ``(doc_id, n)`` — the bounded size
    table the incremental overlap tier reads instead of re-aggregating
    the full shingle index (sizes are per-doc constants, so the table
    appends with the index — the `old_sizes=` contract). Derives from
    the shared shingle5 artifact tier, so staging both pays the corpus
    tokenize+explode ONCE (staged parquet or the persisted session
    cache), never a second raw-documents pass."""
    return (
        _shared_artifact(spark, sf_dir, "shingle5")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _build_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mh.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), pct_threshold=30
    )


def _build_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text statistics ``(doc_id, source, q, lang_pred,
    n_tokens, fp)`` — exact per-doc functions of the text, computed once
    by the stats job so curation runs (x15) are pure relational work
    over staged tables (VERDICT r6 #5)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        T.quality_score(F.col("text")).alias("q"),
        T.lang_id(F.col("text")).alias("lang_pred"),
        T.token_count(F.col("text")).alias("n_tokens"),
        T.fingerprint(F.col("text")).alias("fp"),
    )


def _build_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide MinHash near-dup pair set ``(id_a, id_b, est_sim)``
    at the standard min_matches=6 bar — x06's answer table, and x15's
    drop set (a doc's signature is independent of the rest of the
    corpus, so in-subset pairs = full-corpus pairs restricted to
    both-endpoints-in-subset)."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.size(T.words(F.col("text"))) >= 3
    )
    # _doc_signatures: staged doc_sigs when present (stage_artifacts
    # stages doc_sigs first — dict order), else the session-cached build
    return mh.near_duplicates(
        docs, min_matches=6, sigs=_doc_signatures(spark, sf_dir)
    )


def _build_simhash_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 48-bit simhash fingerprint table ``(doc_id, fp)`` — the
    simhash analog of doc_sigs (a per-doc function of the text); x07's
    banding/verify joins run off it without re-paying the fingerprint
    UDF pass."""
    from deva_spark.functions import simhash as _sh

    return _sh.fingerprints(_t(spark, sf_dir, "documents"))


def _build_shingle5_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level 5-gram index ``(_sh, _srcs)``: per shingle hash,
    the SORTED array of sources containing it — x55's overlap input,
    derived from the doc-level shingle5 index (staged first: dict
    order). v2 pre-aggregates the per-shingle source sets at staging
    (VERDICT r7 #8: the collect_set shuffle was ~1.0 s of x55's 1.0 s
    floor), so the per-run query is scan → explode in-array pairs →
    one pair-level aggregate. The array is bounded by the SOURCE count
    (not docs) per shingle — metadata-sized rows at any corpus scale."""
    sh = _shingle5_hashes(spark, sf_dir).select("source", "_sh").distinct()
    return sh.groupBy("_sh").agg(
        F.array_sort(F.collect_set("source")).alias("_srcs")
    )


def _pr_raw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The x61 customer<->supplier DIRECTED edge list with the numeric
    node encoding (custkey*2 even / suppkey*2+1 odd — disjoint by
    parity). ONE copy of the encoding (r11 review: x61's unstaged
    branch carried a verbatim duplicate, so an encoding change in one
    place would silently diverge staged vs unstaged graphs)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


def _build_pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x61's symmetrized customer<->supplier edge list (numeric node
    ids: custkey*2 / suppkey*2+1), DENORMALIZED with each edge's source
    out-degree (VERDICT r7 #4) — the pagerank operator's documented
    cluster path: stage this table once (bucketed by src at cluster
    scale), pass ``stage=None, outdeg_col="outdeg"``, and the per-run
    degree pass and degree join both disappear. Same edge rows the
    in-query symmetrize produces; outdeg is their pure aggregate."""
    e0 = _pr_raw_edges(spark, sf_dir)
    edges = e0.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
            )
        ).alias("_e")
    ).select(F.col("_e.s").alias("src"), F.col("_e.d").alias("dst"))
    deg = edges.groupBy(F.col("src").alias("_dn")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    return edges.join(
        F.broadcast(deg), edges.src == F.col("_dn")
    ).select("src", "dst", "outdeg")


def _build_emb_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector hyperplane-LSH bucket table ``(vid, e, n, bs)`` at
    x23's (n_planes=6, n_tables=4) — norms and bucket signatures are
    per-vector functions of the embedding (the doc_sigs pattern)."""
    return V.neardup_base(_t(spark, sf_dir, "embeddings"))


def _build_subwin8g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x74's pair-ready grouped window index ``(wh, sorted doc array)``
    (`substring.window_doc_groups`) — the shingle5_src move: the
    groupBy-wh shuffle happens at staging time, so the timed pair query
    is one scan + in-array pair explode + one aggregate. Measured vs
    the flat (doc_id, wh) join route at sf1: 0.6-0.7 s vs 1.1-1.3 s
    warm (identical pairs, parity-tested)."""
    from deva_spark.functions.substring import window_doc_groups

    return window_doc_groups(_t(spark, sf_dir, "documents"), window=8)


def _build_subpos8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x76's positioned 8-word-window hash index ``(doc_id, pos, wh)``
    (`substring.window_hash_positions`) — referenced twice by the
    removal pass (mask aggregate + cover join), so staging it means two
    parquet scans instead of two window explodes."""
    from deva_spark.functions.substring import window_hash_positions

    return window_hash_positions(_t(spark, sf_dir, "documents"), window=8)


def _build_subpos8g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x75's pair-ready positioned group index ``(wh, dps)``
    (`substring.position_groups`): the groupBy-wh shuffle runs at
    staging time and the >=2-occurrence prune drops the unique-window
    bulk, so the timed run-measurement query is one scan + in-array
    pair explode + the island aggregate (the subwin8g move)."""
    from deva_spark.functions.substring import position_groups

    return position_groups(_t(spark, sf_dir, "documents"), window=8)


def _pruned_pair_index(idx: DataFrame, key: str) -> DataFrame:
    """The PAIR-FORMING prune shared by the flat per-doc indexes: keep
    only ``key`` values held by >= 2 documents. A hash held by one doc
    can never form a dup pair, and that unique bulk is ~90% of the
    index at sf1, so the incremental pair joins read ~10x fewer rows
    with a result identical by construction (VERDICT r9 #6).
    Maintenance contract at 100 TB: the batch appends its rows and a
    standing key-count synopsis merges per batch; keys newly reaching
    count 2 promote their rows — the same append-plus-promotion shape
    as subpos8g's group rewrite. File-count shaping (keeping the staged
    table from being 32 near-empty files whose open/footer overhead
    dominates the timed read) happens at STAGING-WRITE time via
    ``ARTIFACT_WRITE_PARTITIONS`` — not here: a ``coalesce`` in the
    logical plan propagates upward and collapses this count aggregate
    and join to 8 tasks on the inline-fallback route (ADVICE r10)."""
    dup = (
        idx.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select(key)
    )
    return idx.join(dup, key)


def _build_subwin8d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x77/x78's pair-forming flat window index: distinct ``(doc_id,
    wh)`` restricted by :func:`_pruned_pair_index` (2.36M -> 215k rows
    at sf1; measured 2.0s -> 0.8s warm). Derives from the staged
    subpos8 tier — one distinct + one count aggregate, no second
    corpus tokenize."""
    idx = (
        _shared_artifact(spark, sf_dir, "subpos8")
        .select("doc_id", "wh")
        .distinct()
    )
    return _pruned_pair_index(idx, "wh")


def _build_shingle5d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x86's pair-forming shingle index: ``(doc_id, _sh)`` restricted by
    :func:`_pruned_pair_index`. |A∩B| over the pruned index is exact
    (every shared shingle is held by >= 2 docs by definition); per-doc
    SIZES must then come from the full-index `shingle5_sizes` table
    (the `new_sizes`/`old_sizes` contract of
    incremental_shingle_overlap)."""
    idx = _shared_artifact(spark, sf_dir, "shingle5").select("doc_id", "_sh")
    return _pruned_pair_index(idx, "_sh")


def _build_dup_assign_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x81's staged PRE-BATCH cluster assignment: canonical assignments
    over the old corpus's (doc_id % 10 != 0 — the scale-invariant
    modular arrival split, replacing the degenerate `< 450` cutoff; the
    artifact RENAME is the split-dependent invalidation the x86 recipe
    calls for) own pair set — what a previous resolution run left
    behind. Pair membership is a pure function of the two docs, so
    filtering the full staged pair set to old x old reproduces exactly
    the pair set the old corpus alone would yield."""
    from deva_spark.operators import graphs

    pairs = _jaccard_pairs(spark, sf_dir)
    return graphs.canonical_assignments(
        pairs.filter(
            (F.col("id_a") % 10 != 0) & (F.col("id_b") % 10 != 0)
        ).select(
            "id_a", "id_b"
        )
    )


def _build_dup_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus cluster assignment table (x41's own answer) — the
    governance ring's staged state: x89 retracts a forget-list from it
    (only forgotten-member clusters re-resolve) and x90 picks keep-best
    survivors per cluster from it. Derived from the shared jaccard_pairs
    artifact, which stage_artifacts builds first (dict order)."""
    pairs = _jaccard_pairs(spark, sf_dir)
    return graphs.canonical_assignments(pairs.select("id_a", "id_b"))


def _build_cms_day_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x94's per-day Count-Min partials — the frequency tier's staged/
    appendable object: each arrival day reduces to <= depth*width cell
    rows (keyed by ``_b``), built with the engine-portable md5-LE64
    family ONCE at staging; merges, retractions, and point estimates
    run over cell rows alone."""
    from deva_spark.operators import aggregates as agg

    ev = _t(spark, sf_dir, "events").withColumn(
        "_b", F.dayofmonth("ts") % 3
    )
    return ev.transform(agg.cms_partials("event_type", 4, 256, keys=["_b"]))


def _build_doc_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x83's staged digest table ``(doc_id, _h)`` — the exact-dedup
    tier's appendable per-doc index (`dedup.digests`), materialized so
    the incremental query joins staged rows instead of re-hashing text
    at query time (the docstring's 'staged digest table', now real)."""
    from deva_spark.operators import dedup as _dd

    return _dd.digests(_t(spark, sf_dir, "documents"))


def _build_kmv_day_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x85's per-(event_type, day) KMV user synopses — the distinct-count
    tier's staged/appendable object (one k=64 smallest-hash row set per
    group-day); the rollup estimate folds these cell rows alone."""
    from deva_spark.operators import aggregates as agg

    ev = _t(spark, sf_dir, "events").withColumn("_day", F.to_date("ts"))
    return ev.transform(
        agg.kmv_partials("user_id", keys=["event_type", "_day"], k=64)
    )


def _build_quant_day_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x93's per-(event_type, day) quantile bin counts — the
    order-statistics tier's staged/appendable object; merge folds any
    batch set into p50/p90/p99 without re-scanning events."""
    from deva_spark.operators import aggregates as agg

    ev = _t(spark, sf_dir, "events").withColumn("_day", F.to_date("ts"))
    return ev.transform(
        agg.quantile_partials("value", keys=["event_type", "_day"], width=25.0)
    )


def _build_cms_ord_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x106's orders-side Count-Min synopsis on o_custkey — the staged/
    appendable cell table (<= depth*width rows) the join-cardinality
    preflight folds, so the estimate never scans the fact side at query
    time (VERDICT r9 #7: x106 previously rebuilt BOTH sketches from raw
    scans while claiming otherwise)."""
    from deva_spark.operators import aggregates as agg

    return _t(spark, sf_dir, "orders").transform(
        agg.cms_partials("o_custkey", 4, 256)
    )


def _build_cms_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x106's customer-side Count-Min synopsis on c_custkey (see
    :func:`_build_cms_ord_cust`)."""
    from deva_spark.operators import aggregates as agg

    return _t(spark, sf_dir, "customer").transform(
        agg.cms_partials("c_custkey", 4, 256)
    )


def _build_kmv_syn_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x96's per-(source, batch) KMV vocabulary synopses — the sketch
    tier's staged/appendable object: each batch row is the k=64 smallest
    distinct 5-gram hashes of one (source, arrival-batch) slice, so the
    table is synopsis-sized (sources x batches rows) and the overlap
    algebra never re-scans text."""
    from deva_spark.operators import aggregates as agg

    docs = _t(spark, sf_dir, "documents")
    ex = docs.select(
        "source",
        (F.col("doc_id") % 3).alias("_b"),
        T.words(F.col("text")).alias("_ws"),
    ).select(
        "source",
        "_b",
        F.explode(
            F.array_distinct(T.shingles_from_words(F.col("_ws"), n=5))
        ).alias("_s"),
    )
    return ex.transform(agg.kmv_partials("_s", keys=["source", "_b"], k=64))


def _build_img_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x117's staged corpus index: dhash64 of every 25th document's
    synthesized base image (`multimodal.synthesize_doc_images` — the
    EXACT synthesis x115 runs inline, so staged and inline corpora are
    bit-identical). One (image_id, dhash) row per image: the table a
    100 TB image pipeline keeps warm so each day's crawl batch joins
    against it instead of rehashing the corpus."""
    from deva_spark.functions.imagehash import image_hashes
    from deva_spark.functions.multimodal import synthesize_doc_images

    base = synthesize_doc_images(
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", "text")
    )
    return image_hashes(base, id_col="image_id", hashes=("dhash",))


def _build_vid_fdhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x119's staged corpus index: per-frame dhash64 of every 25th
    document's synthesized BASE video (`multimodal.synthesize_doc_videos`
    — the EXACT synthesis x118 runs inline, so staged and inline corpora
    are bit-identical). One (video_id, frame_idx, dhash) row per sampled
    frame: the table a 100 TB video pipeline keeps warm so each day's
    crawl batch joins against it instead of rehashing the corpus."""
    from deva_spark.functions.multimodal import synthesize_doc_videos
    from deva_spark.functions.videofp import video_frame_hashes

    base = synthesize_doc_videos(
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", "text")
    )
    return video_frame_hashes(base)


def _build_bpe_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x121's staged vocabulary: the corpus's distinct words with their
    FINAL segmentation after the 12 x120 merge rounds (`functions.bpe`,
    same loop x120 runs inline) — the train-once/price-many table a
    loader pipeline keeps warm so token budgeting is a broadcast join,
    not a re-train."""
    from deva_spark.functions import bpe
    from deva_spark.queries.curation import _BPE_N

    words = bpe.word_counts(_t(spark, sf_dir, "documents"))
    # keep_cached: the parquet write that follows materializes `final`
    # on top of the word synopsis — without it the one corpus-scale
    # aggregation runs twice (review r14); staging clears nothing
    # afterwards because the cache is synopsis-sized and session-local
    _, final = bpe.train_bpe(words, _BPE_N, keep_cached=True)
    return final


def _build_bpe_merges7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x124's staged tokenizer: the merge table trained on the
    ``doc_id % 7 <> 3`` corpus slice (the ``% 7 = 3`` docs are the
    held-out "tomorrow's crawl" batch, so their words can be genuinely
    unseen). 12 rows — the whole artifact is driver-sized by nature;
    staging it keeps pricing runs train-free like every other staged
    index."""
    from deva_spark.functions import bpe
    from deva_spark.queries.curation import _BPE_N

    words = bpe.word_counts(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 != 3)
    )
    merges, _ = bpe.train_bpe(words, _BPE_N)
    return bpe.merges_df(spark, merges)


ARTIFACT_BUILDERS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "img_dhash": _build_img_dhash,
    "vid_fdhash": _build_vid_fdhash,
    "bpe_seg": _build_bpe_seg,
    "bpe_merges7": _build_bpe_merges7,
    "doc_index": _build_doc_index,
    "doc_sigs": _build_doc_signatures,
    "shingle5": _build_shingle5_hashes,
    "shingle5_sizes": _build_shingle5_sizes,
    "jaccard_pairs": _build_jaccard_pairs,
    "doc_stats": _build_doc_stats,
    "neardup_pairs": _build_neardup_pairs,
    "simhash_fps": _build_simhash_fps,
    "emb_base": _build_emb_base,
    "pr_edges": _build_pr_edges,
    "shingle5_src": _build_shingle5_src,
    "subwin8g": _build_subwin8g,
    "subpos8": _build_subpos8,
    "subpos8g": _build_subpos8g,
    "subwin8d": _build_subwin8d,
    "shingle5d": _build_shingle5d,
    "dup_assign_old": _build_dup_assign_old,
    "dup_assign": _build_dup_assign,
    "kmv_syn_src": _build_kmv_syn_src,
    "cms_day_cells": _build_cms_day_cells,
    "cms_ord_cust": _build_cms_ord_cust,
    "cms_cust": _build_cms_cust,
    "doc_digests": _build_doc_digests,
    "kmv_day_users": _build_kmv_day_users,
    "quant_day_cells": _build_quant_day_cells,
}

#: Staging-WRITE file-count shaping (ADVICE r10): these synopsis-small
#: artifacts would otherwise stage as 32 near-empty files whose
#: open/footer overhead dominates the timed read. The repartition lives
#: HERE — applied only on the write path in ``stage_artifacts`` — so the
#: in-session fallback plan keeps full parallelism (a ``coalesce`` in
#: the builder would propagate into the pair joins). At corpus scale the
#: equivalent knob is ``maxRecordsPerFile`` on the staging job.
ARTIFACT_WRITE_PARTITIONS: dict[str, int] = {
    "subwin8d": 8,
    "shingle5d": 8,
    # r14: these two hot indexes (the shared 5-gram index and the x76
    # positioned window index) staged as ONE ~2 MB file because their
    # builders are narrow over a single-split documents scan — so every
    # consumer's scan-rooted stage (mask aggregate, pair join map side)
    # ran as ONE task. 8 files give consumers 8-way scans at test scale
    # while staying far from the 32-near-empty-files footer-overhead
    # regime (ADVICE r10); at corpus scale the staging job writes many
    # real-sized files and this knob is maxRecordsPerFile.
    "shingle5": 8,
    "subpos8": 8,
}


def _stage_ivf16(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Cell-partitioned IVF table + centers sidecar (x32's 100 TB
    "train once, search many" layout — VERDICT r6 #2). Not a plain
    DataFrame write: `ivf_stage` partitions by cell and drops a
    `_ivf_centers.json` sidecar, so it stages via this custom writer."""
    V.ivf_stage(_t(spark, sf_dir, "embeddings"), path, n_cells=16)


#: Artifacts whose staging is NOT a plain ``df.write.parquet`` —
#: name -> writer(spark, sf_dir, path). Completeness marker below.
def _stage_li_zorder(spark: SparkSession, sf_dir: str, path: str) -> None:
    """x98's z-ordered lineitem relayout (`layout.write_zordered`):
    range-partitioned + sorted on the Morton code of (l_quantity,
    l_extendedprice) with 2 MB row groups so 2-D box scans prune at
    row-group granularity. Row-identical to the raw table — a LAYOUT
    artifact, not a derived index."""
    from deva_spark.sources.layout import write_zordered

    write_zordered(
        _t(spark, sf_dir, "lineitem"),
        path,
        ["l_quantity", "l_extendedprice"],
        bits=10,
        n_files=8,
        row_group_bytes=1 << 21,
    )


def _stage_ivfpq16(spark: SparkSession, sf_dir: str, path: str) -> None:
    """x101/x102's IVF-PQ layout (`vectors.ivfpq_stage`): cell-partitioned
    parquet of (vec_id, codes) + centers/codebooks sidecar. iters=1 /
    n_codes=16 so the DuckDB oracle mirrors the quantizer training
    exactly (one Lloyd step per subspace, the x32 discipline)."""
    V.ivfpq_stage(
        _t(spark, sf_dir, "embeddings"),
        path,
        n_cells=16,
        m=8,
        n_codes=16,
        iters=1,
    )


def _stage_ivfpq_app(spark: SparkSession, sf_dir: str, path: str) -> None:
    """x103's appended IVF-PQ layout: stage on the pre-append corpus
    (vec_id % 10 != 0, a scale-invariant 90% — both quantizers train on
    OLD data only), then
    `ivfpq_append` the new batch against the frozen quantizers. The
    append runs INSIDE staging so the artifact is immutable afterwards
    (a query-time append would grow the table on every run); the
    `_APPENDED` marker lands only after the append, so a half-staged
    dir is never read."""
    emb = _t(spark, sf_dir, "embeddings")
    # scale-invariant 90/10 split (the x86 lesson: an absolute vec_id
    # cutoff degenerates to a 99% "batch" on amplified bench tables)
    V.ivfpq_stage(
        emb.filter(F.col("vec_id") % 10 != 0),
        path,
        n_cells=16,
        m=8,
        n_codes=16,
        iters=1,
    )
    V.ivfpq_append(spark, path, emb.filter(F.col("vec_id") % 10 == 0))
    with open(_os.path.join(path, "_APPENDED"), "w") as fh:
        fh.write("")


def _stage_wds_txt_320(spark: SparkSession, sf_dir: str, path: str) -> None:
    """x114's audited training-export artifact: every 10th document as
    WebDataset tar shards (`webdataset.to_webdataset`, shard_size=320 —
    keyed into the artifact NAME since shard geometry changes the
    bytes). Shards rename-publish atomically per attempt; the _SUCCESS
    marker lands only after the manifest materializes, so a killed
    staging job re-runs whole."""
    from deva_spark.sources.webdataset import to_webdataset

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    _os.makedirs(path, exist_ok=True)
    to_webdataset(docs, path, shard_size=320, overwrite=True).collect()
    with open(_os.path.join(path, "_SUCCESS"), "w"):
        pass


ARTIFACT_STAGERS: dict[str, Callable[[SparkSession, str, str], None]] = {
    "ivf16": _stage_ivf16,
    "li_zorder": _stage_li_zorder,
    "ivfpq16": _stage_ivfpq16,
    "ivfpq_app": _stage_ivfpq_app,
    "wds_txt_320": _stage_wds_txt_320,
}

#: Which testdata file(s) key an artifact's cache-invalidation mtime
#: (default: documents.parquet). EVERY table the builder reads must be
#: listed — the key uses the max mtime across them, so regenerating any
#: one source invalidates the staged copy (ADVICE r7: pr_edges keyed on
#: lineitem only, silently reusing a stale graph when orders changed).
_ARTIFACT_SOURCE: dict[str, tuple[str, ...]] = {
    "ivf16": ("embeddings.parquet",),
    "ivfpq16": ("embeddings.parquet",),
    "ivfpq_app": ("embeddings.parquet",),
    "emb_base": ("embeddings.parquet",),
    "pr_edges": ("orders.parquet", "lineitem.parquet"),
    "li_zorder": ("lineitem.parquet",),
    "cms_day_cells": ("events.parquet",),
    "cms_ord_cust": ("orders.parquet",),
    "cms_cust": ("customer.parquet",),
    "kmv_day_users": ("events.parquet",),
    "quant_day_cells": ("events.parquet",),
    "wds_txt_320": ("documents.parquet",),
    "img_dhash": ("documents.parquet",),
}

#: File proving a COMPLETE artifact. ivf16's centers sidecar is written
#: after the parquet (overwrite clears the dir first), so the sidecar —
#: not _SUCCESS — is its completion marker.
_ARTIFACT_MARKER = {
    "ivf16": "_ivf_centers.json",
    "ivfpq16": "_ivfpq_meta.json",
    "ivfpq_app": "_APPENDED",
}


def _artifact_path(sf_dir: str, name: str) -> str:
    """Deterministic staging dir for one artifact: keyed on the absolute
    data dir, the builder version, and the documents.parquet mtime (new
    testdata invalidates automatically)."""
    import hashlib

    root = _os.environ.get(
        "DEVA_ARTIFACT_DIR",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "spark-warehouse",
            "deva_artifacts",
        ),
    )
    srcs = _ARTIFACT_SOURCE.get(name, ("documents.parquet",))
    mt = 0
    for src in srcs:
        try:
            mt = max(mt, int(_os.path.getmtime(_os.path.join(sf_dir, src))))
        except OSError:
            # a declared source that doesn't exist silently disables
            # mtime invalidation — the exact stale-artifact hazard this
            # key exists to prevent (r11 review); surface it once
            import warnings

            warnings.warn(
                f"artifact {name!r} declares source {src!r} which does "
                f"not exist under {sf_dir} — staleness invalidation is "
                "incomplete for it",
                stacklevel=2,
            )
    key = hashlib.md5(
        f"{_os.path.abspath(sf_dir)}|{name}|v{_ARTIFACT_VERSION}|{mt}".encode()
    ).hexdigest()[:16]
    return _os.path.join(root, f"{name}-{key}")


def staged_artifact_path(sf_dir: str, name: str) -> str | None:
    """Path of a completely-written staged artifact, else None (the
    completion marker — _SUCCESS, or an artifact-specific sidecar —
    guards against reading a half-written directory)."""
    path = _artifact_path(sf_dir, name)
    marker = _ARTIFACT_MARKER.get(name, "_SUCCESS")
    return path if _os.path.exists(_os.path.join(path, marker)) else None


def stage_artifacts(
    spark: SparkSession, sf_dir: str, names: Sequence[str] | None = None
) -> dict[str, float]:
    """Write any missing shared artifacts to parquet; returns name ->
    build+write seconds (0.0 when already staged). This is the explicit
    materialization step a 100 TB pipeline schedules as its own job —
    bench.py runs it before the timed passes so no query's timed cost
    includes another query's index build."""
    import time as _time

    took: dict[str, float] = {}
    all_names = list(ARTIFACT_BUILDERS) + list(ARTIFACT_STAGERS)
    # explicit-empty means "nothing to stage", not "stage everything" —
    # `names or all_names` turned an already-satisfied missing-set call
    # into a full ~29-artifact rebuild (r11 review)
    for name in (all_names if names is None else names):
        if staged_artifact_path(sf_dir, name):
            took[name] = 0.0
            continue
        t0 = _time.perf_counter()
        if name in ARTIFACT_STAGERS:
            ARTIFACT_STAGERS[name](spark, sf_dir, _artifact_path(sf_dir, name))
        else:
            built = ARTIFACT_BUILDERS[name](spark, sf_dir)
            nparts = ARTIFACT_WRITE_PARTITIONS.get(name)
            if nparts:
                built = built.repartition(nparts)
            built.write.mode("overwrite").parquet(
                _artifact_path(sf_dir, name)
            )
        took[name] = round(_time.perf_counter() - t0, 3)
    if any(took.values()):
        # plans memoized BEFORE an artifact existed captured the
        # in-session fallback lineage — drop them so consumers rebuild
        # against the staged parquet
        getattr(spark, _PLAN_CACHE_ATTR, {}).clear()
    return took


def _shared_artifact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    staged = staged_artifact_path(sf_dir, name)
    if staged:
        return read_parquet(spark, staged)
    cache = _session_cache(spark)
    key = (sf_dir, name)
    if key not in cache:
        cache[key] = ARTIFACT_BUILDERS[name](spark, sf_dir)
    df = cache[key]
    # (re-)materialize: a catalog clearCache silently drops both the
    # blocks and the persistence flag
    if df.storageLevel.useMemory is False and df.storageLevel.useDisk is False:
        df.persist()
        df.count()  # eager barrier before multi-reference use
    return df


def _doc_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared posting/TF-IDF table (x12 keywords + x13 search)."""
    return _shared_artifact(spark, sf_dir, "doc_index")


def _doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared MinHash signature table over documents with >=3 tokens
    (x06 near-dup join + x15 curation funnel)."""
    return _shared_artifact(spark, sf_dir, "doc_sigs")


def _shingle5_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-doc DISTINCT 5-gram hash explode ``(doc_id, source,
    _sh)`` with the words array projected before the shingle lambda
    (x44 decontamination, x45 boilerplate, x55 overlap matrix)."""
    return _shared_artifact(spark, sf_dir, "shingle5")


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared near-dup pair set: x05 reports the pairs, x41 resolves
    them into clusters — one LSH-index pass serves both."""
    return _shared_artifact(spark, sf_dir, "jaccard_pairs")


# ---------------------------------------------------------------------------
# M1 — relational core
# ---------------------------------------------------------------------------


