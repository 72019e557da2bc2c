"""Governance / retraction ring: opt-out removal against every staged
index tier, cluster repair after deletion, keep-best representatives,
per-doc curation audit, and stats-tier retraction.

Contract under test (the deletion mirror of the incremental-append
contract): for every staged projection,
``retract(index(corpus), forget) == index(corpus minus forget)`` — and
for the one index with non-local deletion effects (cluster
assignments), only forgotten-member clusters re-resolve while untouched
clusters keep their exact rows.
"""

import os

import pytest
from pyspark.sql import functions as F

from deva_spark.operators import aggregates as agg
from deva_spark.operators import dedup, graphs
from deva_spark.plans import corpus as corpus_plan

from conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _forget(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "forget_id long")


# ---------------------------------------------------------------------------
# retract_assignments: cluster repair
# ---------------------------------------------------------------------------

# path 1-2-3-4 (removing 2 or 3 splits), triangle 10-11-12 (removing one
# keeps the rest connected), pair 20-21 (removing 20 dissolves it and
# relabels nothing else), chain 30-31-32 where 30 is the canonical min
# (removing 30 relabels the cluster to 31)
PAIRS = [
    (1, 2), (2, 3), (3, 4),
    (10, 11), (10, 12), (11, 12),
    (20, 21),
    (30, 31), (31, 32),
]


def _pairs_df(spark, pairs=PAIRS):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _assign_map(df):
    return {r.doc_id: (r.cluster_id, r.is_canonical) for r in df.collect()}


def _retract_case(spark, forget_ids, driver_threshold=None):
    pairs = _pairs_df(spark)
    old = graphs.canonical_assignments(pairs)
    got = graphs.retract_assignments(
        old, pairs, _forget(spark, forget_ids),
        driver_threshold=driver_threshold,
    )
    fg = set(forget_ids)
    surv = [(a, b) for a, b in PAIRS if a not in fg and b not in fg]
    want = graphs.canonical_assignments(_pairs_df(spark, surv))
    assert _assign_map(got) == _assign_map(want)
    return _assign_map(got)


def test_retract_bridge_splits_cluster(spark):
    # forgetting 2 splits 1-2-3-4 into {1} (pairless, omitted) and {3,4}
    got = _retract_case(spark, [2])
    assert 2 not in got and 1 not in got
    assert got[3] == (3, True) and got[4] == (3, False)


def test_retract_canonical_min_relabels(spark):
    # forgetting 30 leaves 31-32: the cluster relabels to min=31
    got = _retract_case(spark, [30])
    assert got[31] == (31, True) and got[32] == (31, False)


def test_retract_triangle_member_keeps_cluster(spark):
    got = _retract_case(spark, [12])
    assert got[10] == (10, True) and got[11] == (10, False)


def test_retract_multiple_and_distributed_path_agree(spark):
    a = _retract_case(spark, [2, 30, 21])
    b = _retract_case(spark, [2, 30, 21], driver_threshold=0)
    assert a == b


def test_retract_untouched_clusters_keep_exact_rows(spark):
    pairs = _pairs_df(spark)
    old = graphs.canonical_assignments(pairs)
    got = graphs.retract_assignments(old, pairs, _forget(spark, [2]))
    old_m = _assign_map(old)
    got_m = _assign_map(got)
    for doc in (10, 11, 12, 20, 21, 30, 31, 32):
        assert got_m[doc] == old_m[doc]


def test_retract_unclustered_forget_is_identity(spark):
    # forgetting ids that appear in no pair changes nothing
    pairs = _pairs_df(spark)
    old = graphs.canonical_assignments(pairs)
    got = graphs.retract_assignments(old, pairs, _forget(spark, [999, 1000]))
    assert _assign_map(got) == _assign_map(old)


def test_retract_assignments_on_corpus_pairs(spark):
    # real pair set: exact-jaccard pairs over the sf0.001 documents;
    # forget a slice and compare against full re-resolution
    from deva_spark.functions import minhash as mh

    pairs = mh.ngram_jaccard_pairs(_docs(spark), pct_threshold=30).select(
        "id_a", "id_b"
    )
    pairs = pairs.persist()
    try:
        old = graphs.canonical_assignments(pairs)
        member_ids = sorted(r.doc_id for r in old.select("doc_id").collect())
        assert member_ids, "sf0.001 corpus must have near-dup clusters"
        fg = member_ids[::3]
        got = graphs.retract_assignments(old, pairs, _forget(spark, fg))
        surv = pairs.filter(
            ~F.col("id_a").isin(fg) & ~F.col("id_b").isin(fg)
        )
        want = graphs.canonical_assignments(surv)
        assert _assign_map(got) == _assign_map(want)
    finally:
        pairs.unpersist()


# ---------------------------------------------------------------------------
# flat / grouped index retraction parity
# ---------------------------------------------------------------------------


def test_retract_rows_equals_rebuild_per_artifact(spark):
    docs = _docs(spark)
    fg_ids = [r.doc_id for r in docs.select("doc_id").limit(7).collect()]
    fg = _forget(spark, fg_ids)
    remaining = docs.filter(~F.col("doc_id").isin(fg_ids))

    from deva_spark.functions import minhash as mh
    from deva_spark.functions import simhash as sh
    from deva_spark.functions import substring as sub

    builders = {
        "digests": lambda d: dedup.digests(d),
        "band_keys": lambda d: mh.band_keys(mh.signatures(d)),
        "chunk_keys": lambda d: sh.chunk_keys(sh.fingerprints(d)),
        "window_hashes": lambda d: sub.window_hashes(d, window=8),
    }
    for name, build in builders.items():
        got = dedup.retract_rows(build(docs), fg)
        want = build(remaining)
        assert got.exceptAll(want).count() == 0, name
        assert want.exceptAll(got).count() == 0, name


def test_retract_grouped_equals_rebuild(spark):
    from deva_spark.functions import substring as sub

    docs = _docs(spark)
    fg_ids = [r.doc_id for r in docs.select("doc_id").limit(5).collect()]
    remaining = docs.filter(~F.col("doc_id").isin(fg_ids))

    # window_doc_groups keeps singleton groups, so min_size=1 for parity
    got = dedup.retract_grouped(
        sub.window_doc_groups(docs, window=8), fg_ids, "ids", min_size=1
    )
    want = sub.window_doc_groups(remaining, window=8)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # position_groups prunes to >=2 occurrences at build time: the
    # default min_size=2 reproduces that prune after the rewrite
    got_p = dedup.retract_grouped(
        sub.position_groups(docs, window=8), fg_ids, "dps", member="doc_id"
    )
    want_p = sub.position_groups(remaining, window=8)
    assert got_p.exceptAll(want_p).count() == 0
    assert want_p.exceptAll(got_p).count() == 0


# ---------------------------------------------------------------------------
# cluster representatives (keep-best)
# ---------------------------------------------------------------------------


def test_cluster_representatives_picks_best_quality(spark):
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    feats = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (10, 5.0), (11, 5.0)],
        "doc_id long, q double",
    )
    reps = dedup.cluster_representatives(
        assign, feats, [F.col("q").desc(), F.col("doc_id")]
    )
    got = {r.cluster_id: (r.keep_id, r.n_members) for r in reps.collect()}
    # cluster 1: best q wins; cluster 10: q ties, min id breaks
    assert got == {1: (2, 3), 10: (10, 2)}


def test_drop_non_representatives_rewrites_corpus(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 10, 11, 42)],
        "doc_id long, text string",
    )
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    feats = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (10, 5.0), (11, 7.0)],
        "doc_id long, q double",
    )
    kept = dedup.drop_non_representatives(
        docs, assign, feats, [F.col("q").desc(), F.col("doc_id")]
    )
    # 42 is unclustered and survives untouched
    assert sorted(r.doc_id for r in kept.collect()) == [2, 11, 42]


# ---------------------------------------------------------------------------
# curation audit
# ---------------------------------------------------------------------------


def test_curation_audit_matches_funnel_output(spark):
    from deva_spark.functions import minhash as mh

    docs = _docs(spark)
    from deva_spark.functions import text as T

    stats = docs.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("q"),
        T.lang_id(F.col("text")).alias("lang_pred"),
        T.token_count(F.col("text")).alias("n_tokens"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    sigs = mh.signatures(docs)
    audit = corpus_plan.curation_audit(stats, sigs=sigs).persist()
    try:
        # every input doc gets exactly one verdict row
        assert audit.count() == docs.count()
        kept = {r.doc_id for r in audit.filter("verdict = 'kept'").collect()}
        funnel = corpus_plan.curate_from_stats(stats, sigs=sigs)
        want = {r.doc_id for r in funnel.collect()}
        assert kept == want
        rows = {r.doc_id: r for r in audit.collect()}
        # dup_of set exactly for the dup verdicts, and always lower-id
        for r in rows.values():
            if r.verdict in ("exact_dup", "near_dup"):
                assert r.dup_of is not None and r.dup_of < r.doc_id
            else:
                assert r.dup_of is None
        # exact_dup defers to the minimum gated doc of its fingerprint
        for r in rows.values():
            if r.verdict == "exact_dup":
                assert rows[r.dup_of].verdict in ("kept", "near_dup")
    finally:
        audit.unpersist()


def test_curation_audit_verdict_order_and_dup_of(spark):
    # handcrafted stats: quality beats language; exact keeper is the
    # min GATED id (doc 5's fp collides with rejected doc 4 — no dup)
    rows = [
        # doc_id, q, lang_pred, n_tokens, fp
        (1, 10.0, "en", 5, "a"),     # quality (even though lang ok)
        (2, 50.0, "other", 5, "b"),  # language
        (3, 50.0, "en", 5, "c"),     # kept
        (4, 10.0, "en", 5, "d"),     # quality — NOT an exact keeper
        (5, 50.0, "en", 5, "d"),     # kept: only gated doc with fp=d
        (6, 50.0, "en", 5, "c"),     # exact_dup of 3
    ]
    stats = spark.createDataFrame(
        rows, "doc_id long, q double, lang_pred string, n_tokens long, fp string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    audit = corpus_plan.curation_audit(stats, pairs=pairs)
    got = {r.doc_id: (r.verdict, r.dup_of) for r in audit.collect()}
    assert got == {
        1: ("quality", None),
        2: ("language", None),
        3: ("kept", None),
        4: ("quality", None),
        5: ("kept", None),
        6: ("exact_dup", 3),
    }


def test_curation_audit_near_dup_chain(spark):
    # pair chain 1-2, 2-3: both 2 and 3 drop; dup_of points to the
    # smallest lower-id partner (pairwise, may chain)
    rows = [
        (1, 50.0, "en", 5, "a"),
        (2, 50.0, "en", 5, "b"),
        (3, 50.0, "en", 5, "c"),
    ]
    stats = spark.createDataFrame(
        rows, "doc_id long, q double, lang_pred string, n_tokens long, fp string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    audit = corpus_plan.curation_audit(stats, pairs=pairs)
    got = {r.doc_id: (r.verdict, r.dup_of) for r in audit.collect()}
    assert got == {
        1: ("kept", None),
        2: ("near_dup", 1),
        3: ("near_dup", 2),
    }


# ---------------------------------------------------------------------------
# stats-tier retraction
# ---------------------------------------------------------------------------


def test_retract_stat_partials_exact_linear_moments(spark):
    docs = _docs(spark)
    from deva_spark.functions import text as T

    vals = docs.select(
        "lang", "doc_id", T.token_count(F.col("text")).alias("v")
    )
    fg_ids = [r.doc_id for r in docs.select("doc_id").limit(9).collect()]
    forgotten = vals.filter(F.col("doc_id").isin(fg_ids))
    surviving = vals.filter(~F.col("doc_id").isin(fg_ids))

    base = vals.transform(agg.stats_partials("v", keys=["lang"]))
    neg = forgotten.transform(agg.retract_stat_partials("v", keys=["lang"]))
    merged = base.unionByName(neg).transform(
        agg.merge_stat_partials(keys=["lang"])
    )
    direct = surviving.transform(agg.stats_partials("v", keys=["lang"])).transform(
        agg.merge_stat_partials(keys=["lang"])
    )
    got = {
        r.lang: (r.cnt, r.s, r.mean, r.var) for r in merged.collect()
    }
    want = {
        r.lang: (r.cnt, r.s, r.mean, r.var) for r in direct.collect()
    }
    assert got == want
    # retraction-touched groups conservatively NULL their extrema
    for r in merged.collect():
        assert r.mn is None and r.mx is None


def test_retract_stat_partials_untouched_groups_keep_extrema(spark):
    rows = [("a", 1), ("a", 5), ("b", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    base = df.transform(agg.stats_partials("v", keys=["g"]))
    neg = (
        df.filter("g = 'a' and v = 5")
        .transform(agg.retract_stat_partials("v", keys=["g"]))
    )
    out = {
        r.g: r
        for r in base.unionByName(neg)
        .transform(agg.merge_stat_partials(keys=["g"]))
        .collect()
    }
    assert out["a"].cnt == 1 and out["a"].mn is None and out["a"].mx is None
    assert out["b"].cnt == 1 and out["b"].mn == 7 and out["b"].mx == 7


def test_retract_whole_group_disappears(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, v long")
    base = df.transform(agg.stats_partials("v", keys=["g"]))
    neg = df.filter("g = 'a'").transform(
        agg.retract_stat_partials("v", keys=["g"])
    )
    out = base.unionByName(neg).transform(agg.merge_stat_partials(keys=["g"]))
    assert [r.g for r in out.collect()] == ["b"]
