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
