"""Skew/bucketing mitigations: correctness AND the plan shape they buy."""

from pyspark.sql import functions as F

from deva_spark.operators.skew import salted_group_agg
from deva_spark.session import read_table
from deva_spark.sources.writers import write_bucketed


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    salted = ev.transform(
        salted_group_agg(
            ["user_id"],
            {
                "total": (F.sum(F.col("value").cast("decimal(30,6)")), F.sum),
                "c": (F.count(F.lit(1)), F.sum),
            },
            n_salts=8,
        )
    )
    plain = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(30,6)")).alias("total"),
        F.count(F.lit(1)).alias("c"),
    )
    a = sorted((r.user_id, r.total, r.c) for r in salted.collect())
    b = sorted((r.user_id, r.total, r.c) for r in plain.collect())
    assert a == b  # exact: decimal addition is associative


def test_salted_agg_two_phase_plan(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    df = ev.transform(
        salted_group_agg(["user_id"], {"c": (F.count(F.lit(1)), F.sum)}, n_salts=8)
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    # phase 1 shuffles on (user_id, salt) — the hot-key fan-out
    assert "hashpartitioning(user_id" in p and "_salt" in p


def test_salted_agg_splits_planted_hot_key(spark):
    # planted power-law key: one shingle hash carried by 90% of rows.
    # Phase 1 must split the hot key across salt groups — no single
    # reducer sees anywhere near the full hot row set — and the combined
    # counts must stay exact.
    n_hot, n_salts = 20_000, 8
    hot = spark.range(n_hot).select(
        F.lit(7777).alias("_sh"), F.col("id").alias("_id")
    )
    cold = spark.range(2_000).select(
        (F.col("id") % 500 + 10_000).alias("_sh"), F.col("id").alias("_id")
    )
    df = hot.unionByName(cold).repartition(8)
    # phase-1 partials observed directly: group by (key, salt)
    phase1 = (
        df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy("_sh", "_salt")
        .agg(F.count(F.lit(1)).alias("_p"))
        .filter(F.col("_sh") == 7777)
        .collect()
    )
    assert len(phase1) == n_salts  # hot key fanned out over every salt
    biggest = max(r._p for r in phase1)
    assert biggest < n_hot * 0.25  # no salt group holds a hot-key bulk
    # end-to-end exactness through the operator
    out = df.transform(
        salted_group_agg(["_sh"], {"c": (F.count(F.lit(1)), F.sum)}, n_salts=n_salts)
    )
    got = {r._sh: r.c for r in out.collect()}
    assert got[7777] == n_hot
    assert sum(got.values()) == n_hot + 2_000


def test_boilerplate_salted_counts_match_window_semantics(spark):
    # the salted groupBy+tag-join formulation must reproduce the old
    # count-over-window semantics exactly
    from deva_spark.plans.corpus import boilerplate_stats_prehashed

    rows = [
        (1, 100), (1, 101), (1, 102),
        (2, 100), (2, 103),
        (3, 100), (3, 101),
        (4, 104),
    ]
    exploded = spark.createDataFrame(rows, "_id long, _sh long")
    got = {
        r.doc_id: (r.n_shingles, r.n_common)
        for r in boilerplate_stats_prehashed(exploded, min_docs=2).collect()
    }
    # _sh 100 in 3 docs, 101 in 2 docs -> common; 102/103/104 singletons
    assert got == {1: (3, 2), 2: (2, 1), 3: (2, 2), 4: (1, 0)}


def test_bucketed_join_needs_no_exchange(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    write_bucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"), "b_orders", "o_custkey", buckets=4)
    write_bucketed(customer.select("c_custkey", "c_name"), "b_customer", "c_custkey", buckets=4)
    a = spark.table("b_orders")
    b = spark.table("b_customer")
    # forbid broadcast so the test exercises the bucketed path
    joined = a.hint("merge").join(b, a.o_custkey == b.c_custkey)
    p = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p
    # the whole point: bucket layout satisfies the join distribution —
    # no shuffle on either side
    assert "Exchange hashpartitioning" not in p
    # and it still returns the right rows
    assert joined.count() == orders.join(customer, orders.o_custkey == customer.c_custkey).count()
