"""Mergeable weighted-reservoir sampling (x99) and document chunking
(x100) — the sampling tier of the incremental-corpus ring and the
long-side complement of sequence packing."""

import pytest
from pyspark.sql import functions as F

from deva_spark.operators.packing import chunk_documents
from deva_spark.operators.sampling import (
    merge_reservoir_partials,
    reservoir_partials,
    weighted_sample_topk,
)


def _corpus(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
        (F.col("id") % 17 + 1).alias("w"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_reservoir_merge_equals_one_shot_under_any_split(spark):
    # the ring's core contract: batch synopses merged == the one-shot
    # per-group E-S sample over the whole corpus, bit-identical
    df = _corpus(spark)
    expected = _rows(
        weighted_sample_topk(df, 7, "w", ["src"]).select(
            "src", "doc_id", F.col("w").cast("bigint"), "skey", "rnk"
        )
    )
    for n_batches in (1, 3, 5):
        parts = None
        for b in range(n_batches):
            p = df.filter(F.col("doc_id") % n_batches == b).transform(
                reservoir_partials(7, "w", keys=["src"])
            )
            parts = p if parts is None else parts.unionByName(p)
        got = _rows(
            parts.transform(merge_reservoir_partials(7, keys=["src"])).select(
                "src", "doc_id", "w", "skey", "rnk"
            )
        )
        assert got == expected, f"split into {n_batches} diverged"


def test_reservoir_partials_are_bounded_and_positive_weight_only(spark):
    df = _corpus(spark).withColumn(
        "w", F.when(F.col("doc_id") % 5 == 0, -1).otherwise(F.col("w"))
    )
    parts = df.transform(reservoir_partials(7, "w", keys=["src"])).collect()
    assert 0 < len(parts) <= 4  # one synopsis row per group
    sampled_ids = {s._id for r in parts for s in r._rs}
    assert all(len(r._rs) <= 7 for r in parts)
    assert not any(i % 5 == 0 for i in sampled_ids)  # w<=0 excluded


def test_chunking_single_chunk_for_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(f"t{i}" for i in range(10)))],
        "doc_id long, text string",
    )
    out = df.transform(chunk_documents(max_tokens=10, overlap=3)).collect()
    by_id = {(r.doc_id, r.chunk_id): r for r in out}
    assert len(out) == 2
    assert by_id[(1, 0)].n_tokens == 3 and by_id[(1, 0)].chunk_text == "a b c"
    assert by_id[(2, 0)].n_tokens == 10


def test_chunking_covers_every_token_and_reconstructs(spark):
    # stride positions [i*stride, i*stride+max) must reconstruct the doc:
    # dropping each chunk's first `overlap` tokens (except chunk 0) and
    # concatenating yields the original text exactly
    n, mx, ov = 257, 64, 16
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        df.transform(chunk_documents(max_tokens=mx, overlap=ov)).collect(),
        key=lambda r: r.chunk_id,
    )
    stride = mx - ov
    import math

    assert len(chunks) == 1 + math.ceil((n - mx) / stride)
    rebuilt = chunks[0].chunk_text.split()
    for c in chunks[1:]:
        toks = c.chunk_text.split()
        assert toks[:ov] == rebuilt[c.chunk_id * stride : c.chunk_id * stride + ov]
        rebuilt.extend(toks[ov:])
    assert rebuilt == text.split()
    # final chunk is longer than the overlap (no degenerate tail)
    assert chunks[-1].n_tokens > ov


def test_chunking_exact_boundary_has_no_empty_tail(spark):
    # n == max + k*stride lands the last window exactly on n
    mx, ov = 8, 2
    stride = mx - ov
    n = mx + 2 * stride  # 20
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = df.transform(chunk_documents(max_tokens=mx, overlap=ov)).collect()
    assert len(chunks) == 3
    assert all(c.n_tokens == mx for c in chunks)


def test_chunking_validates_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(max_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(max_tokens=8, overlap=-1)


def test_chunking_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = (
        df.transform(chunk_documents(max_tokens=3, overlap=1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # row-local: pipelines inside the scan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    n=st.integers(min_value=1, max_value=200),
    mx=st.integers(min_value=2, max_value=40),
    ov_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunking_matches_python_reference(spark, n, mx, ov_frac):
    import math

    ov = min(int(mx * ov_frac), mx - 1)
    stride = mx - ov
    words = [f"w{i}" for i in range(n)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got = sorted(
        (r.chunk_id, r.n_tokens, r.chunk_text)
        for r in df.transform(chunk_documents(max_tokens=mx, overlap=ov)).collect()
    )
    nc = 1 if n <= mx else 1 + math.ceil((n - mx) / stride)
    expected = sorted(
        (
            i,
            len(words[i * stride : i * stride + mx]),
            " ".join(words[i * stride : i * stride + mx]),
        )
        for i in range(nc)
    )
    assert got == expected
