"""Quantile-synopsis, Count-Min, and Bloom-prune tiers (round 8).

The quantile and CMS tiers follow the incremental-ring partials contract
(stats_partials / kmv_partials): batch rows append, merges are integer
algebra (bit-identical under any split), and — because counts are
invertible, unlike KMV hashes or extrema — both support EXACT
retraction. The Bloom-pruned join is the explicit semi-join-reduction
pattern: false positives only pass extra rows to the exact join, so the
result is identical to the plain join.
"""

import math

from pyspark.sql import functions as F

from deva_spark.operators import aggregates as agg
from deva_spark.operators import joins


def _rows(n=400):
    # deterministic multimodal-ish values, 3 groups
    return [
        (i % 3, float((i * 7919) % 997) / 2.0 + (i % 3) * 50) for i in range(n)
    ]


def _exact_pct(vs, p):
    # rank = ceil(p*n/100), 1-indexed over the sorted values
    vs = sorted(vs)
    rank = -(-p * len(vs) // 100)
    return vs[rank - 1]


def test_quantile_partials_merge_split_invariance_and_bound(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "k long, v double")
    width = 25.0

    def merged(n_batches):
        parts = None
        for b in range(n_batches):
            p = df.filter(F.col("v").cast("long") % n_batches == b)
            pp = p.transform(agg.quantile_partials("v", keys=["k"], width=width))
            parts = pp if parts is None else parts.unionByName(pp)
        return {
            r.k: (r.n, r.p50, r.p90, r.p99)
            for r in parts.transform(
                agg.merge_quantile_partials(keys=["k"], width=width)
            ).collect()
        }

    one = merged(1)
    assert merged(3) == one
    assert merged(5) == one
    # estimate = lower bin edge: 0 <= exact - est < width
    for k in (0, 1, 2):
        vs = [v for kk, v in rows if kk == k]
        n, p50, p90, p99 = one[k]
        assert n == len(vs)
        for p, est in ((50, p50), (90, p90), (99, p99)):
            exact = _exact_pct(vs, p)
            assert 0 <= exact - est < width, (k, p, est, exact)


def test_quantile_partials_retraction_exact(spark):
    # merge(partials(all) + retract(forgotten)) == merge(partials(survivors))
    rows = _rows()
    df = spark.createDataFrame(rows, "k long, v double")
    forgotten = df.filter(F.col("v").cast("long") % 7 == 2)
    survivors = df.filter(F.col("v").cast("long") % 7 != 2)
    direct = survivors.transform(
        agg.quantile_partials("v", keys=["k"])
    ).transform(agg.merge_quantile_partials(keys=["k"]))
    retracted = (
        df.transform(agg.quantile_partials("v", keys=["k"]))
        .unionByName(
            forgotten.transform(agg.retract_quantile_partials("v", keys=["k"]))
        )
        .transform(agg.merge_quantile_partials(keys=["k"]))
    )
    key = lambda r: (r.k, r.n, r.p50, r.p90, r.p99)  # noqa: E731
    assert sorted(map(key, direct.collect())) == sorted(
        map(key, retracted.collect())
    )


def test_quantile_merge_plan_has_no_window(spark):
    # the merge is hash-agg + in-array scan: no window function, no
    # single-reducer stage
    df = spark.createDataFrame(_rows(), "k long, v double")
    out = df.transform(agg.quantile_partials("v", keys=["k"])).transform(
        agg.merge_quantile_partials(keys=["k"])
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan


def test_cms_overestimates_and_merge_retract(spark):
    rows = [(f"key{(i * 13) % 40}",) for i in range(2000)]
    # plant a heavy hitter
    rows += [("heavy",)] * 500
    df = spark.createDataFrame(rows, "k string")
    depth, width = 4, 256
    sketch = df.transform(agg.cms_partials("k", depth, width)).transform(
        agg.cms_merge_partials()
    )
    keys = df.select("k").distinct()
    est = {
        r.k: r.est
        for r in agg.cms_point_estimates(sketch, keys, "k", depth, width).collect()
    }
    exact = {r.k: r.cnt for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    # CMS never underestimates
    for k, c in exact.items():
        assert est[k] >= c, (k, est[k], c)
    # the planted heavy hitter ranks first by estimate
    assert max(est, key=est.get) == "heavy"
    # eps*N bound: overestimate <= (e/width) * N at the ~1-e^-depth level;
    # with deterministic data just assert the bound holds for every key
    n_total = sum(exact.values())
    bound = math.e / width * n_total
    for k in exact:
        assert est[k] - exact[k] <= bound + 1e-9, (k, est[k], exact[k])

    # split-merge invariance: cells are integer sums
    one = sorted((r.i, r.bucket, r.cnt) for r in sketch.collect())
    parts = None
    for b in range(3):
        p = df.filter(F.length("k") % 3 == b).transform(
            agg.cms_partials("k", depth, width)
        )
        parts = p if parts is None else parts.unionByName(p)
    split = sorted(
        (r.i, r.bucket, r.cnt)
        for r in parts.transform(agg.cms_merge_partials()).collect()
    )
    assert split == one

    # exact retraction: forget the heavy hitter entirely
    forgotten = df.filter(F.col("k") == "heavy")
    retracted = (
        df.transform(agg.cms_partials("k", depth, width))
        .unionByName(forgotten.transform(agg.cms_retract_partials("k", depth, width)))
        .transform(agg.cms_merge_partials())
    )
    direct = df.filter(F.col("k") != "heavy").transform(
        agg.cms_partials("k", depth, width)
    ).transform(agg.cms_merge_partials())
    assert sorted((r.i, r.bucket, r.cnt) for r in retracted.collect()) == sorted(
        (r.i, r.bucket, r.cnt) for r in direct.collect()
    )


def test_bloom_pruned_join_identity_and_plan(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    plain = orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "inner")
    bloomed = joins.bloom_pruned_join(
        orders, cust, "o_custkey", "c_custkey", n_hashes=3, n_bits=1 << 14
    )
    a = sorted(r.o_orderkey for r in plain.select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in bloomed.select("o_orderkey").collect())
    assert a == b
    plan = bloomed._jdf.queryExecution().executedPlan().toString()
    # literal-bitmap formulation: the prune is a scan-stage filter, not
    # semi joins — exactly one real join in the plan
    assert "LeftSemi" not in plan
    assert "shiftright" in plan and "element_at" in plan
    assert "CartesianProduct" not in plan


def test_bloom_prune_drops_nonmatching_rows(spark):
    # survivors of the prune alone: all matches kept, most non-matches
    # dropped (false positives may let a few through — never the reverse)
    big = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    small = spark.createDataFrame([(i * 100,) for i in range(10)], "k long")
    out = joins.bloom_pruned_join(big, small, "k", "k", n_hashes=3, n_bits=1 << 14)
    got = sorted(r[0] for r in out.select(big["k"]).collect())
    assert got == [i * 100 for i in range(10)]


def test_kmv_overlap_exact_below_k(spark):
    # below-k regime: all synopses complete, so union/intersection/
    # jaccard are EXACT
    rows = [("a", f"v{i}") for i in range(30)] + [
        ("b", f"v{i}") for i in range(20, 50)
    ]
    df = spark.createDataFrame(rows, "src string, v string")
    out = (
        df.transform(agg.kmv_partials("v", keys=["src"], k=64))
        .transform(agg.kmv_overlap("src", k=64))
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert (r.src_a, r.src_b) == ("a", "b")
    assert r.est_union == 50 and r.est_inter == 10
    assert r.jaccard == 0.2


def test_kmv_overlap_split_invariance_and_estimator_accuracy(spark):
    # estimator regime: per-batch synopses merged == one-shot (the KMV
    # lossless-merge argument extends to the pair estimates), and the
    # union estimate lands within the ~1/sqrt(k) band of truth
    rows = [("a", f"x{i}") for i in range(4000)] + [
        ("b", f"x{i}") for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "src string, v string")

    def overlap(n_batches):
        parts = None
        for b in range(n_batches):
            p = df.filter(F.crc32(F.col("v")) % n_batches == b).withColumn(
                "_b", F.lit(b)
            )
            pp = p.transform(agg.kmv_partials("v", keys=["src", "_b"], k=64))
            parts = pp if parts is None else parts.unionByName(pp)
        return [
            (r.src_a, r.src_b, r.est_union, r.est_inter, r.jaccard)
            for r in parts.transform(agg.kmv_overlap("src", k=64)).collect()
        ]

    one = overlap(1)
    assert overlap(4) == one
    (_, _, est_u, est_i, _) = one[0]
    assert abs(est_u - 6000) / 6000 < 0.40
    # intersection is noisier (c ~ k * 1/3); just require the right scale
    assert 0 < est_i < 2 * 2000


def test_cms_keyed_retraction_per_group(spark):
    # forget one day from the keyed cell table by appending its negated
    # partial — the merged sketch equals one built over the survivors
    import datetime as dt

    rows = [("a", dt.date(2024, 1, 1))] * 50 + [
        ("a", dt.date(2024, 1, 2))
    ] * 30 + [("b", dt.date(2024, 1, 2))] * 10
    df = spark.createDataFrame(rows, "k string, day date")
    daily = df.transform(agg.cms_partials("k", 4, 64, keys=["day"]))
    forget = df.filter(F.col("day") == "2024-01-02")
    neg = forget.transform(agg.cms_retract_partials("k", 4, 64, keys=["day"]))
    merged = (
        daily.unionByName(neg)
        .transform(agg.cms_merge_partials())
        .collect()
    )
    survivors = (
        df.filter(F.col("day") != "2024-01-02")
        .transform(agg.cms_partials("k", 4, 64))
        .transform(agg.cms_merge_partials())
        .collect()
    )
    assert sorted(map(tuple, merged)) == sorted(map(tuple, survivors))


def test_cms_join_size_overestimates_and_is_tight(spark):
    # planted multiplicities: key k appears (k+1) times in A and twice
    # in B for even k -> true join size = sum over even k of 2*(k+1)
    rows_a = [(f"k{k}",) for k in range(40) for _ in range(k + 1)]
    rows_b = [(f"k{k}",) for k in range(0, 40, 2) for _ in range(2)]
    A = spark.createDataFrame(rows_a, "k string")
    B = spark.createDataFrame(rows_b, "k string")
    truth = sum(2 * (k + 1) for k in range(0, 40, 2))
    depth, width = 4, 256
    sa = A.transform(agg.cms_partials("k", depth, width)).transform(
        agg.cms_merge_partials()
    )
    sb = B.transform(agg.cms_partials("k", depth, width)).transform(
        agg.cms_merge_partials()
    )
    est = agg.cms_join_size(sa, sb, depth).collect()[0].est_join_rows
    # never underestimates; eps*|A|*|B| bound with eps = e/width
    assert est >= truth
    assert est - truth <= math.e / width * len(rows_a) * len(rows_b) + 1e-9
    # and at this width it is tight (few collisions)
    assert est <= truth * 1.2


def test_sketch_tiers_skip_null_values(spark):
    # r11 review: NULLs corrupted every binned/hashed tier differently —
    # KMV's NULL hash ranked first and burned a top-k slot (collect_list
    # then dropped it, firing the exact branch with a wrong count);
    # quantile partials emitted a NULL bin that inflated n; both
    # histogram variants counted NULLs as edge values (least/greatest
    # skip NULL operands). All now skip NULLs like F.count(col).
    rows = [(1, v) for v in [10, 20, 30, 40, 50, 60]] + [(1, None)] * 3
    df = spark.createDataFrame(rows, "g int, v long")

    got = df.transform(agg.kmv_distinct("v", keys=("g",), k=4)).collect()
    clean = df.filter(F.col("v").isNotNull()).transform(
        agg.kmv_distinct("v", keys=("g",), k=4)
    ).collect()
    # NULLs are invisible: identical estimate with or without them (the
    # buggy version burned a top-k slot and fired the exact branch with
    # a shrunk array, diverging from the NULL-free input)
    assert got[0]["est_distinct"] == clean[0]["est_distinct"]
    # and below k the exact branch counts the 3 present distincts, not 2
    small = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (1, None)], "g int, v long"
    )
    assert small.transform(agg.kmv_distinct("v", keys=("g",), k=4)).collect()[
        0
    ]["est_distinct"] == 3

    qp = df.transform(agg.quantile_partials("v", keys=("g",), width=25.0))
    merged = qp.transform(agg.merge_quantile_partials(keys=("g",), width=25.0, pcts=(50,)))
    row = merged.collect()[0]
    assert row["n"] == 6 and row["p50"] is not None

    hist = {r["bucket"]: r["cnt"] for r in df.transform(
        agg.histogram_fixed_width("v", n_buckets=5)).collect()}
    assert sum(hist.values()) == 6  # NULLs not binned anywhere

    hp = {r["bucket"]: r["cnt"] for r in df.transform(
        agg.histogram_partials("v", lo=0.0, hi=100.0, n_buckets=4)).collect()}
    assert sum(hp.values()) == 6 and hp.get(0, 0) == 2  # 10, 20 only


def test_stats_partials_exact_for_large_longs(spark):
    # r11 review: v*v in bigint overflowed at |v| > ~3.04e9 (ANSI crash)
    # despite the DECIMAL exactness contract; squares now widen first.
    big = 4_000_000_000
    df = spark.createDataFrame([(big,), (big + 1,)], "v long")
    row = df.transform(agg.stats_partials("v")).collect()[0]
    assert int(row["s"]) == 2 * big + 1
    assert int(row["s2"]) == big * big + (big + 1) * (big + 1)


def test_batch_drift_global_keys(spark):
    # r11 review: keys=() crashed in PySpark's join([]); and with no
    # history at all the batch row must survive (flagged drifted).
    hist = spark.createDataFrame([(100,)], "v long").transform(agg.stats_partials("v"))
    batch = spark.createDataFrame([(500,)], "v long").transform(agg.stats_partials("v"))
    out = agg.batch_drift(hist, batch).collect()
    assert len(out) == 1 and out[0]["batch_cnt"] == 1
    empty_hist = hist.filter(F.lit(False))
    out2 = agg.batch_drift(empty_hist, batch).collect()
    assert len(out2) == 1 and out2[0]["drifted"] is True


def test_extreme_values_clip_not_crash(spark):
    # r12 review: under ANSI mode a huge outlier made floor().cast(int)
    # raise ARITHMETIC_OVERFLOW in histogram_partials/quantile_partials,
    # and +/-inf collapsed histogram_fixed_width into bucket 0 through
    # the bounds. Outliers now clip to the edge bins; infinities are
    # filtered like NULL/NaN.
    df = spark.createDataFrame(
        [(1.0,), (50.0,), (1e11,), (-1e11,), (float("inf",),),
         (float("-inf"),), (float("nan"),), (None,)],
        "v double",
    )
    hp = {r.bucket: r.cnt for r in df.transform(
        agg.histogram_partials("v", lo=0.0, hi=100.0, n_buckets=20)
    ).collect()}
    # the FIXED grid declares lo/hi, so everything out of range —
    # including +/-inf — clips to its edge bucket: 1.0 -> 0, {-1e11,
    # -inf} -> 0, 50 -> 10, {1e11, +inf} -> 19
    assert hp == {0: 3, 10: 1, 19: 2}
    qp = {r.bin: r.cnt for r in df.transform(
        agg.quantile_partials("v", width=25.0)
    ).collect()}
    # 1e11/25 = 4e9 > 2^31: saturates to the int edges instead of an
    # ANSI overflow kill; +/-inf filtered with NULL/NaN
    assert qp[(1 << 31) - 1] == 1 and qp[-(1 << 31)] == 1
    assert sum(qp.values()) == 4
    hw = {r.bucket: r.cnt for r in df.transform(
        agg.histogram_fixed_width("v", n_buckets=10)
    ).collect()}
    # finite values only (1.0, 50.0, 1e11, -1e11); must NOT all be 0
    assert sum(hw.values()) == 4 and len(hw) > 1


def test_drift_gates_align_null_group_keys(spark):
    # r12 review: a NULL group key is a real group, but plain-equality
    # joins never matched it — batch_drift alarmed "appeared from
    # nowhere" forever and psi_drift computed a garbage PSI.
    hist = spark.createDataFrame(
        [(None, 100), (None, 102), ("a", 100)], "g string, v long"
    ).transform(agg.stats_partials("v", keys=["g"]))
    batch = spark.createDataFrame(
        [(None, 101), ("a", 100)], "g string, v long"
    ).transform(agg.stats_partials("v", keys=["g"]))
    out = {r.g: r for r in agg.batch_drift(hist, batch, keys=["g"]).collect()}
    assert out[None]["hist_cnt"] == 2  # history FOUND for the NULL group
    assert out[None]["drifted"] is not True or out[None]["hist_cnt"] is not None
    bh = spark.createDataFrame(
        [(None, 5.0), (None, 6.0)], "g string, v double"
    ).transform(agg.histogram_partials("v", lo=0.0, hi=10.0, n_buckets=5, keys=["g"]))
    hh = spark.createDataFrame(
        [(None, 5.5), (None, 6.5)], "g string, v double"
    ).transform(agg.histogram_partials("v", lo=0.0, hi=10.0, n_buckets=5, keys=["g"]))
    psi = {r.g: r.psi for r in agg.psi_drift(bh, hh, keys=["g"], n_buckets=5).collect()}
    # identical-shape distributions: PSI ~ 0, not the garbage-large
    # value unaligned sides produced
    assert abs(psi[None]) < 0.1


def test_cms_join_size_survives_huge_counts(spark):
    # r12 review: the dot product summed in bigint — two multi-billion
    # cell counts overflowed 2^63 and ANSI killed the job. DECIMAL now.
    big = 4_000_000_000
    a = spark.createDataFrame([(0, 1, big), (1, 1, big)], "i int, bucket int, cnt long")
    b = spark.createDataFrame([(0, 1, big), (1, 1, big)], "i int, bucket int, cnt long")
    out = agg.cms_join_size(a, b, depth=2).collect()[0]
    # 1.6e19 exceeds int64: the bigint output saturates at Long.Max
    # instead of an ANSI kill — "do not run this join" either way
    assert out.est_join_rows == (1 << 63) - 1
    # below the saturation point the estimate stays exact
    small = 1_000_000
    c = spark.createDataFrame([(0, 1, small), (1, 1, small)], "i int, bucket int, cnt long")
    out2 = agg.cms_join_size(c, c, depth=2).collect()[0]
    assert out2.est_join_rows == small * small


def test_global_positions_width_path_survives_nan(spark):
    # r12 review: one NaN made _hi=NaN in the width bucketing, every
    # width_bucket NULL, and the whole input silently collapsed into
    # ONE bucket (single reducer). NaN now buckets at the top (it sorts
    # above everything) and the numbering stays correct.
    from deva_spark.operators.windows import global_positions

    rows = [(float(i), i) for i in range(100)] + [(float("nan"), 100)]
    df = spark.createDataFrame(rows, "score double, id long").repartition(7)
    prev = spark.conf.get("spark.deva.positional.smallInputBytes", None)
    spark.conf.set("spark.deva.positional.smallInputBytes", "0")
    try:
        out = global_positions(
            df, order=["score", "id"], out="_rn", buckets=8
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.deva.positional.smallInputBytes")
        else:
            spark.conf.set("spark.deva.positional.smallInputBytes", prev)
    got = {r.id: r._rn for r in out}
    # finite scores number 1..100 in order; the NaN row is LAST (101)
    assert got[100] == 101
    assert [got[i] for i in range(100)] == list(range(1, 101))
