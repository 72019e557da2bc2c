"""Micro-fixtures from the reference's doctests (FIXTURES.md §5):
map/filter squares & evens (`core/core.py:1357-1392`, `1531-1539`),
starmap sums (`core.py:1485-1494`), pluck (`ops.py:541-550`),
set ops, union, top-k.
"""

from pyspark.sql import functions as F

from deva_spark.operators import core as C


def test_map_squares(spark):
    df = spark.range(5).select(F.col("id").alias("x"))
    out = df.transform(C.project((F.col("x") * F.col("x")).alias("sq")))
    assert [r.sq for r in out.orderBy("sq").collect()] == [0, 1, 4, 9, 16]


def test_filter_evens_and_remove(spark):
    df = spark.range(5).select(F.col("id").alias("x"))
    evens = df.transform(C.where(F.col("x") % 2 == 0))
    odds = df.transform(C.remove(F.col("x") % 2 == 0))
    assert sorted(r.x for r in evens.collect()) == [0, 2, 4]
    assert sorted(r.x for r in odds.collect()) == [1, 3]


def test_starmap_sums(spark):
    df = spark.createDataFrame([(i, i) for i in range(5)], "a int, b int")
    out = df.select((F.col("a") + F.col("b")).alias("s"))
    assert sorted(r.s for r in out.collect()) == [0, 2, 4, 6, 8]


def test_pluck(spark):
    df = spark.createDataFrame([{"name": "n1", "v": 1}, {"name": "n2", "v": 2}])
    out = df.transform(C.pluck("name"))
    assert out.columns == ["name"]
    assert sorted(r.name for r in out.collect()) == ["n1", "n2"]


def test_explode_flatten(spark):
    df = spark.createDataFrame([([1, 2, 3],), ([4],)], "xs array<int>")
    out = df.transform(C.explode_col("xs", "x")).select("x")
    assert sorted(r.x for r in out.collect()) == [1, 2, 3, 4]


def test_union_and_distinct(spark):
    a = spark.createDataFrame([(1,), (2,)], "k int")
    b = spark.createDataFrame([(2,), (3,)], "k int")
    u = a.transform(C.union_all(b))
    assert sorted(r.k for r in u.collect()) == [1, 2, 2, 3]
    assert sorted(r.k for r in C.distinct_rows(u).collect()) == [1, 2, 3]


def test_set_ops(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    assert sorted(r.k for r in a.transform(C.intersect_keys(b)).collect()) == [2, 3]
    assert sorted(r.k for r in a.transform(C.except_distinct(b)).collect()) == [1]


def test_top_k_plan_uses_take_ordered(spark):
    # sort|head must plan as TakeOrderedAndProject (per-partition heap),
    # never a full global sort — the 100 TB-safe shape.
    df = spark.range(1000).select(F.col("id").alias("x"))
    out = df.transform(C.top_k(3, F.col("x").desc()))
    assert [r.x for r in out.collect()] == [999, 998, 997]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
