"""Connected components: small (driver union-find) and large (distributed
label propagation) paths must agree; canonical assignment marks min-id."""

from pyspark.sql import functions as F

from deva_spark.operators import graphs

# two chains, one triangle, one isolated edge:
#   0-1-2-3   10-11-12   20-21, 21-22, 20-22   30-31
EDGES = [
    (0, 1), (1, 2), (2, 3),
    (10, 11), (11, 12),
    (20, 21), (21, 22), (20, 22),
    (30, 31),
]
EXPECTED = {
    0: 0, 1: 0, 2: 0, 3: 0,
    10: 10, 11: 10, 12: 10,
    20: 20, 21: 20, 22: 20,
    30: 30, 31: 30,
}


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_connected_components_driver_path(spark):
    out = graphs.connected_components(_edges_df(spark))
    got = {r.node: r.comp for r in out.collect()}
    assert got == EXPECTED


def test_connected_components_distributed_path(spark):
    # driver_threshold=0 forces the iterative label-propagation path
    out = graphs.connected_components(_edges_df(spark), driver_threshold=0)
    got = {r.node: r.comp for r in out.collect()}
    assert got == EXPECTED


def test_canonical_assignments_flags_min_id(spark):
    pairs = spark.createDataFrame(EDGES, "id_a long, id_b long")
    out = graphs.canonical_assignments(pairs).collect()
    canon = {r.doc_id for r in out if r.is_canonical}
    assert canon == {0, 10, 20, 30}
    assert all(r.cluster_id == EXPECTED[r.doc_id] for r in out)


def test_connected_components_conf_threshold(spark):
    # driverMaxEdges=0 forces the distributed path via the conf (no
    # explicit driver_threshold arg); results must match either way.
    spark.conf.set("spark.deva.graph.driverMaxEdges", "0")
    try:
        out = graphs.connected_components(_edges_df(spark))
        got = {r.node: r.comp for r in out.collect()}
        assert got == EXPECTED
    finally:
        spark.conf.unset("spark.deva.graph.driverMaxEdges")


def test_incremental_canonical_assignments_matches_full(spark):
    # merging a batch's pairs into a STAGED assignment must equal the
    # full resolution over the union pair set — including the hard
    # case: one new edge bridges two previously-distinct old clusters
    # (0-chain and 10-chain) and the WHOLE old 10-cluster relabels to 0.
    new_pairs = [
        (3, 10),    # bridges cluster 0 and cluster 10
        (40, 41),   # brand-new docs, new cluster
        (42, 20),   # new doc attaches to old cluster 20
    ]
    old_assign = graphs.canonical_assignments(
        spark.createDataFrame(EDGES, "id_a long, id_b long")
    )
    new_df = spark.createDataFrame(new_pairs, "id_a long, id_b long")
    full = graphs.canonical_assignments(
        spark.createDataFrame(EDGES + new_pairs, "id_a long, id_b long")
    )
    want = {(r.doc_id, r.cluster_id, r.is_canonical) for r in full.collect()}
    for kw in ({}, {"driver_threshold": 0}):
        got = {
            (r.doc_id, r.cluster_id, r.is_canonical)
            for r in graphs.incremental_canonical_assignments(
                old_assign, new_df, **kw
            ).collect()
        }
        assert got == want, kw
    # sanity on the merge itself: 10-chain members now label 0
    merged = {r.doc_id: r.cluster_id for r in full.collect()}
    assert merged[10] == merged[11] == merged[12] == 0
    assert merged[42] == 20 and merged[40] == 40


def test_incremental_assignments_empty_batch_is_identity(spark):
    # no new pairs -> the staged assignment survives unchanged (star
    # edges alone reconstruct every old cluster exactly)
    old_assign = graphs.canonical_assignments(
        spark.createDataFrame(EDGES, "id_a long, id_b long")
    )
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in graphs.incremental_canonical_assignments(old_assign, empty).collect()
    }
    want = {(r.doc_id, r.cluster_id, r.is_canonical) for r in old_assign.collect()}
    assert got == want


SCALE = 1_000_000_000_000

# directed star: hub 1 -> leaves 2,3,4 (symmetrized inside pagerank)
STAR = [(1, 2), (1, 3), (1, 4)]
# hand-computed integer ranks after two steps (teleport 150e9, damping 85):
#   iter1: r(hub) = 150e9 + 3*(85e12 div 100)      = 2_700_000_000_000
#          r(leaf) = 150e9 + (85e12 div 300)        =   433_333_333_333
#   iter2: r(hub) = 150e9 + 3*((r_leaf*85) div 100) = 1_254_999_999_999
#          r(leaf) = 150e9 + (r_hub*85) div 300     =   915_000_000_000
STAR_EXPECTED = {
    1: 1_254_999_999_999,
    2: 915_000_000_000,
    3: 915_000_000_000,
    4: 915_000_000_000,
}


def test_pagerank_star_two_steps(spark):
    edges = spark.createDataFrame(STAR, "src long, dst long")
    out = graphs.pagerank(edges, n_iter=2, symmetrize=True)
    got = {r.node: r.rank_scaled for r in out.collect()}
    assert got == STAR_EXPECTED


def test_pagerank_stage_modes_agree(spark):
    edges = spark.createDataFrame(STAR, "src long, dst long")
    for kw in (
        {"stage": "persist"},
        {"stage": None},
        {"broadcast_ranks": False},
    ):
        out = graphs.pagerank(edges, n_iter=2, symmetrize=True, **kw)
        got = {r.node: r.rank_scaled for r in out.collect()}
        assert got == STAR_EXPECTED, kw


def test_pagerank_denorm_outdeg_agrees(spark):
    # the staged-graph fast path (edges carrying src outdeg,
    # VERDICT r7 #4) is bit-identical to the join-per-iteration path
    sym = STAR + [(d, s) for s, d in STAR]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    edges = spark.createDataFrame(
        [(s, d, deg[s]) for s, d in sym], "src long, dst long, outdeg long"
    )
    for kw in ({}, {"stage": None}, {"broadcast_ranks": False}):
        out = graphs.pagerank(
            edges, n_iter=2, symmetrize=False, outdeg_col="outdeg", **kw
        )
        got = {r.node: r.rank_scaled for r in out.collect()}
        assert got == STAR_EXPECTED, kw
    # deeper loop exercises the rank-join and lineage-truncation arms
    a = graphs.pagerank(
        edges, n_iter=4, symmetrize=False, outdeg_col="outdeg",
        checkpoint_every=2,
    )
    b = graphs.pagerank(
        spark.createDataFrame(sym, "src long, dst long"), n_iter=4,
        symmetrize=False,
    )
    assert {r.node: r.rank_scaled for r in a.collect()} == {
        r.node: r.rank_scaled for r in b.collect()
    }
    # symmetrize+outdeg_col is a contract violation
    import pytest

    with pytest.raises(ValueError, match="pre-symmetrized"):
        graphs.pagerank(edges, symmetrize=True, outdeg_col="outdeg")


def test_pagerank_regular_graph_fixed_point(spark):
    # On a d-regular symmetric graph the uniform rank is an exact integer
    # fixed point: every node sends d * ((SCALE*85) div (d*100)) and the
    # teleport tops it back up to SCALE. Convergence in the strongest
    # sense — bit-identical at every iteration depth; checkpoint_every=2
    # exercises the loop's lineage-truncation path.
    cycle = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = spark.createDataFrame(cycle, "src long, dst long")
    out = graphs.pagerank(
        edges, n_iter=5, symmetrize=True, checkpoint_every=2
    )
    got = {r.node: r.rank_scaled for r in out.collect()}
    assert got == {0: SCALE, 1: SCALE, 2: SCALE, 3: SCALE}


def test_redact_pii_patterns(spark):
    from deva_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@sub.example.co.uk end",),
            ("ip 192.168.0.1 and phone +86-800-1234-567",),
            ("clean text with no pii at all",),
        ],
        "t string",
    )
    got = [r.r for r in df.select(redact_pii(F.col("t")).alias("r")).collect()]
    assert got[0] == "mail <EMAIL> end"
    assert got[1] == "ip <IP> and phone <PHONE>"
    assert got[2] == "clean text with no pii at all"


def test_repetition_signals_counts(spark):
    from deva_spark.functions.text import repetition_signals

    df = spark.createDataFrame([("a b a b a",), ("x",)], "t string")
    rows = df.select(repetition_signals(F.col("t")).alias("s")).select("s.*").collect()
    r = rows[0]
    # words: a b a b a -> bigrams: [a b, b a, a b, b a] top count 2
    assert (r.n_words, r.n_distinct_words) == (5, 2)
    assert (r.n_bigrams, r.top_bigram_count) == (4, 2)
    assert (r.n_trigrams, r.n_distinct_trigrams) == (3, 2)
    r1 = rows[1]
    assert (r1.n_words, r1.n_bigrams, r1.top_bigram_count, r1.n_trigrams) == (1, 0, 0, 0)


def test_contamination_counts_shared_ngrams(spark):
    from deva_spark.plans.corpus import contamination_counts

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here now okay then"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "quick brown fox jumps over the lazy")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_shared for r in contamination_counts(docs, bench, n=5).collect()}
    # doc 1 shares 3 distinct 5-grams with the benchmark text; doc 2 none
    assert got == {1: 3}


def test_pagerank_directed_keeps_indegree_zero_sources(spark):
    # r11 review: on a DIRECTED chain 1 -> 2 -> 3, node 1 never appears
    # as a dst; its rank is exactly the teleport mass every round and it
    # must (a) keep feeding node 2 in later rounds, (b) appear in the
    # output. The inner rank-degree join dropped both.
    t = (SCALE * 15) // 100  # teleport
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    for kw in ({}, {"stage": None}):
        out = graphs.pagerank(edges, n_iter=2, symmetrize=False, **kw)
        got = {r.node: r.rank_scaled for r in out.collect()}
        r2_1 = t + (SCALE * 85) // 100          # iter1 rank of node 2
        want = {
            1: t,
            2: t + (t * 85) // 100,             # fed by node 1's teleport
            3: t + (r2_1 * 85) // 100,
        }
        assert got == want
    # denorm path (edges carry outdeg): same recurrence
    dn = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1)], "src long, dst long, outdeg long"
    )
    out = graphs.pagerank(dn, n_iter=2, outdeg_col="outdeg")
    got = {r.node: r.rank_scaled for r in out.collect()}
    assert got == want


def test_connected_components_nonconvergence_raises(spark):
    # r11 review: propagation on a chain of diameter d needs ~d rounds;
    # exhausting max_iter must raise, not return silently split
    # components.
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graphs.connected_components(
            chain, max_iter=2, driver_threshold=0, algorithm="propagation"
        )
    ok = graphs.connected_components(
        chain, max_iter=15, driver_threshold=0, algorithm="propagation"
    )
    assert {r.comp for r in ok.collect()} == {0}


def test_star_converges_where_propagation_budget_fails(spark):
    # VERDICT r11 #3: large-star/small-star contracts in ~1.2*log2(n)
    # rounds regardless of diameter (measured: a 200-chain converges in
    # 9-10). A 200-long chain exceeds a 12-round propagation budget by
    # 16x but the star path converges within it.
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graphs.connected_components(
            chain, max_iter=12, driver_threshold=0, algorithm="propagation"
        )
    got = graphs.connected_components(
        chain, max_iter=12, driver_threshold=0
    )  # default algorithm="star"
    rows = {(r.node, r.comp) for r in got.collect()}
    assert rows == {(i, 0) for i in range(201)}


def test_star_matches_union_find_on_random_graphs(spark):
    # the star path's output is a pure function of the graph: parity
    # against the driver union-find across shapes (cliques, chains,
    # bridges, isolated pairs, string-keyed components)
    import random

    rng = random.Random(12)
    edges = []
    # three cliques
    for base in (0, 100, 200):
        ids = [base + i for i in range(6)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    # a long chain bridging two of them
    edges += [(5, 300), (300, 301), (301, 302), (302, 100)]
    # random sprinkle
    for _ in range(80):
        a, b = rng.randrange(400, 500), rng.randrange(400, 500)
        if a != b:
            edges.append((a, b))
    df = spark.createDataFrame(edges, "src long, dst long")
    want = {
        (r.node, r.comp)
        for r in graphs.connected_components(df).collect()  # union-find
    }
    got = {
        (r.node, r.comp)
        for r in graphs.connected_components(df, driver_threshold=0).collect()
    }
    assert got == want


def test_incremental_singleton_clusters_survive_distributed_path(spark):
    # r12 review: an incremental assignment table encodes a singleton
    # cluster as an EXACT self-loop star edge (doc 5 -> cluster 5); the
    # star path dropped self-loops, so singletons silently vanished
    # above the driver cutover — the output must be identical across
    # driver_threshold.
    old = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (5, 5, True)],
        "doc_id long, cluster_id long, is_canonical boolean",
    )
    new_pairs = spark.createDataFrame([(2, 7)], "id_a long, id_b long")
    want = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in graphs.incremental_canonical_assignments(
            old, new_pairs
        ).collect()
    }
    assert (5, 5, True) in want
    got = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in graphs.incremental_canonical_assignments(
            old, new_pairs, driver_threshold=0
        ).collect()
    }
    assert got == want


def test_reliable_checkpoint_survives_block_loss(spark, tmp_path):
    # VERDICT r11 #4: localCheckpoint blocks die with executors — a
    # reliable checkpoint_dir stage must survive losing every cached
    # block, where the localCheckpoint path cannot recompute (lineage
    # truncated). Simulate executor loss by unpersisting all blocks.
    ckpt = str(tmp_path / "ckpt")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(150)], "src long, dst long"
    )
    labels = graphs.connected_components(
        chain, driver_threshold=0, checkpoint_dir=ckpt
    )
    # blow away every persisted/cached block (what a lost executor does)
    jsc = spark.sparkContext._jsc.sc()
    pr = jsc.getPersistentRDDs()
    it = pr.iterator()
    while it.hasNext():
        it.next()._2().unpersist(True)
    # the reliably-checkpointed labels re-read from files and still work
    rows = {(r.node, r.comp) for r in labels.collect()}
    assert rows == {(i, 0) for i in range(151)}
    # pagerank's periodic rank stage takes the same knob
    pr_out = graphs.pagerank(
        chain, n_iter=9, checkpoint_every=2, checkpoint_dir=ckpt
    )
    assert pr_out.count() == 151


def test_concurrent_stagers_share_checkpoint_dir(spark, tmp_path):
    # VERDICT r12 #3: two resolutions pointed at the SAME checkpoint_dir
    # used to share slot-0/slot-1 and delete each other's round files
    # mid-iteration. Interleave two stagers past the slot-rotation point
    # (round >= 2 triggers the k-2 delete) and verify every staged round
    # of BOTH runs still reads back — per-run subdirectories mean each
    # rotation only ever collects its own rounds.
    import os

    ckpt = str(tmp_path / "shared-ckpt")
    a = graphs._round_stager(spark, ckpt)
    b = graphs._round_stager(spark, ckpt)
    df = spark.range(100).withColumnRenamed("id", "v")
    last = {}
    for rnd in range(4):  # past round>=2, where slot rotation deletes
        last["a"] = a(df.withColumn("run", F.lit("a")))
        last["b"] = b(df.withColumn("run", F.lit("b")))
    # The rotation guarantees each run's LATEST round survives its own
    # staging. Under the old shared-slot layout, b's round-k staging
    # deleted the slot that a's round-k files had just landed in, so
    # a's latest round was gone by here. Per-run subdirectories mean a
    # rotation only ever collects its own consumed rounds.
    assert last["a"].count() == 100
    assert last["b"].count() == 100
    run_dirs = [d for d in os.listdir(ckpt) if d.startswith("run-")]
    assert len(run_dirs) == 2, run_dirs


def test_finish_retains_single_snapshot(spark, tmp_path):
    # r13 review #3: per-run unique dirs would otherwise accumulate two
    # snapshots per completed run forever; finish() drops the
    # superseded slot so retention is exactly the ONE snapshot backing
    # the returned DataFrame (released by deleting checkpoint_dir after
    # the result is written out).
    import os

    ckpt = str(tmp_path / "ckpt")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "src long, dst long"
    )
    labels = graphs.connected_components(
        chain, driver_threshold=0, checkpoint_dir=ckpt
    )
    run_dirs = [d for d in os.listdir(ckpt) if d.startswith("run-")]
    assert len(run_dirs) == 1
    slots = [
        d for d in os.listdir(os.path.join(ckpt, run_dirs[0]))
        if d.startswith("slot-")
    ]
    assert len(slots) == 1, slots  # superseded slot dropped at finish
    # the surviving snapshot still backs the result
    assert {(r.node, r.comp) for r in labels.collect()} == {
        (i, 0) for i in range(121)
    }
