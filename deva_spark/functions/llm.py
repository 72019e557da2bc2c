"""LLM batch-inference stage for data pipelines.

Reference surface: ``sync_gpt``/``async_gpt``/``async_json_gpt``
(`/root/reference/deva/llm/client.py:48-326`) — per-call, single-process.
The Spark-native shape is a ``mapInPandas`` stage: each executor partition
batches prompts, fans them out with bounded concurrency, and joins results
back as columns — with a prompt-hash cache table so reruns (and duplicate
prompts at corpus scale) skip the API entirely, the same memoization role
DBStream plays in the reference.

No network egress exists in this container, so the default client is a
deterministic stub; the ``client`` argument injects a real one
(``Callable[[str], str]``). The Spark-side plumbing — batching, partition
fan-out, cache join — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_stub_client(prompt: str) -> str:
    """Offline stand-in: deterministic, clearly fake."""
    import hashlib

    return f"stub:{hashlib.md5(prompt.encode()).hexdigest()[:8]}"


def llm_stage(
    df: DataFrame,
    prompt_col: str = "prompt",
    out_col: str = "completion",
    client: Callable[[str], str] | None = None,
    max_concurrency: int = 8,
    max_retries: int = 3,
    base_delay: float = 0.5,
    rate_per_partition: float | None = None,
    err_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` = client(prompt) for every row, batched per
    partition via mapInPandas (Arrow transfer, no per-row Python overhead).

    Endpoint contract (shared with the crawler — ``http.fetch_with_policy``):
    ``max_concurrency`` bounds in-flight calls per partition;
    ``rate_per_partition`` spaces request starts (requests/sec, multiplied
    across executors — size partitions to your account limit); retryable
    failures (timeouts, connection errors, HTTP 5xx/429 if the client
    raises urllib errors) back off exponentially up to ``max_retries``.
    With ``err_col`` set, failures are captured per row (side-output);
    without it the stage raises — annotation pipelines usually want the
    side-output, scoring gates usually want the failure.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from deva_spark.functions.http import _RateGate, fetch_with_policy, is_retryable

    call = client or deterministic_stub_client
    fields = df.schema.fieldNames()
    # fresh StructType — StructType.add would mutate the DataFrame's cached
    # schema object in place and corrupt downstream analysis
    extra = [StructField(out_col, StringType())]
    if err_col:
        extra.append(StructField(err_col, StringType()))
    out_schema = StructType(df.schema.fields + extra)
    out_cols = fields + [out_col] + ([err_col] if err_col else [])

    def run_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        gate = _RateGate(rate_per_partition)

        def one(prompt: str) -> tuple[str | None, str | None]:
            return fetch_with_policy(
                call, prompt, gate, max_retries, base_delay, None, is_retryable
            )

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in pdfs:
                results = list(pool.map(one, pdf[prompt_col].tolist()))
                pdf = pdf.copy()
                if err_col:
                    pdf[out_col] = [r[0] for r in results]
                    pdf[err_col] = [r[1] for r in results]
                else:
                    failed = next((r[1] for r in results if r[1]), None)
                    if failed:
                        raise RuntimeError(f"llm call failed after retries: {failed}")
                    pdf[out_col] = [r[0] for r in results]
                yield pdf

    return df.mapInPandas(run_partition, schema=out_schema).select(*out_cols)


def llm_stage_cached(
    df: DataFrame,
    cache_path: str,
    prompt_col: str = "prompt",
    out_col: str = "completion",
    client: Callable[[str], str] | None = None,
) -> DataFrame:
    """Memoized variant: a parquet cache table keyed by prompt MD5.

    1. left-join the cache (hash → completion);
    2. run the LLM stage ONLY on cache misses (distinct prompts — dedup
       before spend, the single biggest cost lever at corpus scale);
    3. append the new completions to the cache;
    4. return hits ∪ fresh.
    """
    spark = df.sparkSession

    def read_cache() -> DataFrame:
        try:
            c = spark.read.parquet(cache_path)
        except Exception:  # noqa: BLE001 — first run: empty cache
            c = spark.createDataFrame([], "_ph string, _cached string")
        # the cache is append-only: two racing runs (or a retried batch) can
        # land duplicate _ph rows, and a dup on the join side would multiply
        # input rows — dedupe at read time.
        return c.dropDuplicates(["_ph"])

    hashed = df.withColumn("_ph", F.md5(F.col(prompt_col)))
    cache = read_cache()
    joined = hashed.join(F.broadcast(cache), "_ph", "left")
    misses = (
        joined.filter(F.col("_cached").isNull())
        .select("_ph", prompt_col)
        .dropDuplicates(["_ph"])
    )
    if misses.take(1):
        fresh = llm_stage(misses, prompt_col, "_fresh", client)
        fresh.select("_ph", F.col("_fresh").alias("_cached")).write.mode(
            "append"
        ).parquet(cache_path)
        cache = read_cache()
        joined = hashed.join(F.broadcast(cache), "_ph", "left")
    return joined.withColumn(out_col, F.col("_cached")).drop("_ph", "_cached")
