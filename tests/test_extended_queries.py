"""Edge cases for the x23-x29 operator additions (oracle parity is covered
by the driver gate; these pin the corners oracles can't reach)."""

import numpy as np
from pyspark.sql import functions as F

from deva_spark.functions import text as T
from deva_spark.functions import vectors as V
from deva_spark.operators import aggregates as agg


def test_cosine_neardup_finds_planted_duplicate(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 64))
    vecs[7] = vecs[3] + rng.normal(scale=1e-3, size=64)  # planted near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b): r.cos for r in V.cosine_neardup_pairs(df, threshold=0.95).collect()}
    assert (3, 7) in pairs and pairs[(3, 7)] > 0.999
    assert all(c >= 0.95 for c in pairs.values())


def test_histogram_constant_column(spark):
    df = spark.createDataFrame([(5.0,)] * 4, "value double")
    out = df.transform(agg.histogram_fixed_width("value", 10)).collect()
    assert [(r.bucket, r.cnt) for r in out] == [(0, 4)]


def test_histogram_bounds_inclusive(spark):
    df = spark.createDataFrame([(0.0,), (10.0,), (9.99,), (5.0,)], "value double")
    out = {r.bucket: r.cnt for r in df.transform(agg.histogram_fixed_width("value", 10)).collect()}
    assert out[0] == 1 and out[9] == 2 and out[5] == 1  # max closes into top bucket


def test_pivot_counts_zero_fill(spark):
    df = spark.createDataFrame(
        [("2024-01-01", "a"), ("2024-01-01", "a"), ("2024-01-02", "b")],
        "d string, k string",
    )
    out = {r.day: (r.a, r.b) for r in df.transform(
        agg.pivot_counts(F.col("d"), "day", "k", ["a", "b"])
    ).collect()}
    assert out == {"2024-01-01": (2, 0), "2024-01-02": (0, 1)}


def test_rolling_hash_known_value(spark):
    M = (1 << 61) - 1
    expected = 0
    for ch in "abc123":
        expected = (expected * 257 + ord(ch)) % M
    df = spark.createDataFrame([("A b-C 1_23!",), ("",), (None,)], "text string")
    rows = df.select(T.rolling_hash(F.col("text")).alias("h")).collect()
    assert rows[0].h == expected  # normalization strips to 'abc123'
    assert rows[1].h == 0


def test_llm_stage_error_side_output(spark):
    # http.stub_fetcher doubles as a client that fails on non-URL prompts
    # (ValueError = non-retryable -> captured once, no retries)
    from deva_spark.functions import llm
    from deva_spark.functions.http import stub_fetcher

    df = spark.createDataFrame([("https://p/1",), ("notaurl",)], "prompt string")
    out = {r.prompt: (r.completion, r.err) for r in llm.llm_stage(
        df, client=stub_fetcher, err_col="err", base_delay=0.01
    ).collect()}
    assert out["https://p/1"][0].startswith("<html>stub:") and out["https://p/1"][1] is None
    assert out["notaurl"][0] is None and "ValueError" in out["notaurl"][1]


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([("Hello, world 42!",)], "text string")
    row = df.select(
        T.bpe_ish_tokens(F.col("text")).alias("p"),
        T.bpe_ish_token_count(F.col("text")).alias("n"),
    ).collect()[0]
    # letters merge, digits split, symbols alone
    assert list(row.p) == ["hello", ",", "world", "4", "2", "!"]
    assert row.n == 6
