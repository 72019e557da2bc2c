"""HTTP fetch stage (crawler/httpx analog).

Reference surface: ``Stream.crawler`` — async per-event HTTP fetch with a
worker pool (`/root/reference/deva/core/core.py:1655-1851`), ``httpx``
(`core.py:1560-1652`), ``read_from``/``post_to`` (`pipe.py:1199-1378`).

Spark mapping: a ``mapInPandas`` stage — each partition fans its URLs out
through a bounded thread pool (the ``workers=`` knob), so total
concurrency = executors × pool size. The crawler contract lives here too:
bounded exponential-backoff retries on retryable failures (timeouts,
connection errors, 5xx), a requests-per-second rate limit per partition
(multiplied across executors — size partitions accordingly), and an
optional post-fetch ``render`` hook (the JS-render seam).

The default fetcher is a stdlib urllib GET for real deployments; this
container has no egress, so tests inject a deterministic stub. The Spark
plumbing — batching, bounded fan-out, retry/ratelimit, per-row error
capture — is real and tested.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 — for callers
from pyspark.sql.types import StringType, StructField, StructType


def stub_fetcher(url: str) -> str:
    """Offline deterministic stand-in for an HTTP GET."""
    import hashlib

    if not url.startswith(("http://", "https://")):
        raise ValueError(f"bad url: {url}")
    return f"<html>stub:{hashlib.md5(url.encode()).hexdigest()[:8]}</html>"


def spool_recording_fetcher(spool_dir: str, url: str) -> str:
    """Deterministic offline fetcher that ALSO drops one file per call
    into ``spool_dir`` — the auditable network-call counter for
    cache-effectiveness tests and crawl dry-runs (executor processes
    can't mutate driver state, so the count rides the filesystem).
    Partial-apply the dir (picklable package function). URLs ending in
    ``boom`` raise — the per-row error-capture probe."""
    import hashlib
    import os
    import uuid

    os.makedirs(spool_dir, exist_ok=True)
    with open(os.path.join(spool_dir, uuid.uuid4().hex), "w") as fh:
        fh.write(url)
    if url.endswith("boom"):
        raise ValueError("bad url")
    return f"<html>fetched:{hashlib.md5(url.encode()).hexdigest()[:8]}</html>"


def default_fetcher(url: str, timeout: float = 15.0) -> str:
    """Stdlib HTTP GET (executor-side default for real deployments)."""
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "deva-spark/1.0"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return resp.read().decode("utf-8", errors="replace")


def is_retryable(exc: Exception) -> bool:
    """Crawler retry policy: connection-level failures, 5xx, and 429
    (rate-limited — back off and come back) retry; other 4xx/parse errors
    don't (they won't get better)."""
    import urllib.error

    if isinstance(exc, urllib.error.HTTPError):
        return exc.code >= 500 or exc.code == 429
    return isinstance(exc, (OSError, TimeoutError))


class _RateGate:
    """Per-partition requests-per-second gate: spaces request STARTS at
    least 1/rate apart across the partition's worker threads."""

    def __init__(self, rate: float | None):
        self.interval = 1.0 / rate if rate else 0.0
        self.lock = threading.Lock()
        self.next_at = 0.0

    def wait(self) -> None:
        if not self.interval:
            return
        with self.lock:
            now = time.monotonic()
            at = max(now, self.next_at)
            self.next_at = at + self.interval
        delay = at - now
        if delay > 0:
            time.sleep(delay)


def fetch_with_policy(
    call: Callable[[str], str],
    url: str,
    gate: _RateGate | None = None,
    max_retries: int = 3,
    base_delay: float = 0.2,
    render: Callable[[str, str], str] | None = None,
    retryable: Callable[[Exception], bool] = is_retryable,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[str | None, str | None]:
    """One URL under the crawler policy: rate-gate each attempt, retry
    retryable failures with exponential backoff, run the render hook on
    success. Returns (body, error) — exactly one is non-None."""
    last: Exception | None = None
    for attempt in range(max_retries):
        if gate is not None:
            gate.wait()
        try:
            body = call(url)
            return (render(url, body) if render else body), None
        except Exception as e:  # noqa: BLE001 — per-row capture
            last = e
            if not retryable(e) or attempt == max_retries - 1:
                break
            sleep(base_delay * (2**attempt))
    return None, f"{type(last).__name__}: {last}"


def fetch_stage(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "body",
    err_col: str = "fetch_error",
    fetcher: Callable[[str], str] | None = None,
    workers: int = 10,
    max_retries: int = 3,
    base_delay: float = 0.2,
    rate_per_partition: float | None = None,
    render: Callable[[str, str], str] | None = None,
    retryable: Callable[[Exception], bool] = is_retryable,
) -> DataFrame:
    """Append ``out_col`` = fetch(url) per row; failures captured into
    ``err_col`` (side-output pattern) instead of failing the stage —
    matching the crawler's per-event error tolerance.

    Each attempt waits for the rate gate; retryable failures back off
    exponentially up to ``max_retries`` attempts; ``render(url, body)``
    post-processes successful fetches (the JS-render hook — inject a
    headless-browser call there). All injected callables must be
    picklable (module-level functions / functools.partial)."""
    call = fetcher or default_fetcher
    out_schema = StructType(
        df.schema.fields
        + [StructField(out_col, StringType()), StructField(err_col, StringType())]
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        gate = _RateGate(rate_per_partition)

        def one(url: str) -> tuple[str | None, str | None]:
            return fetch_with_policy(
                call, url, gate, max_retries, base_delay, render, retryable
            )

        with ThreadPoolExecutor(max_workers=workers) as pool:
            for pdf in pdfs:
                results = list(pool.map(one, pdf[url_col].tolist()))
                pdf = pdf.copy()
                pdf[out_col] = [r[0] for r in results]
                pdf[err_col] = [r[1] for r in results]
                yield pdf

    return df.mapInPandas(run, schema=out_schema)


def fetch_stage_cached(
    df: DataFrame,
    cache_path: str,
    url_col: str = "url",
    out_col: str = "body",
    err_col: str = "fetch_error",
    fetcher: Callable[[str], str] | None = None,
    **fetch_kwargs,
) -> DataFrame:
    """CACHE-FIRST crawl — the reference browser's tab/LRU contract
    (`/root/reference/deva/browser.py:1-518`: "tab 在请求网络前，先判断
    缓存，缓存存在就获取缓存") at pipeline scale: a parquet response
    cache keyed by URL MD5 short-circuits BEFORE any network call, so a
    re-crawl of an already-fetched URL set does zero fetches.

    1. left-join the cache (url hash -> body);
    2. run :func:`fetch_stage` ONLY on cache misses, deduped by URL
       (duplicate URLs across the corpus cost one fetch — the
       llm_stage_cached spend lever applied to the crawler);
    3. append SUCCESSFUL bodies to the cache (failures stay uncached so
       the next crawl retries them — an LRU never pins an error);
    4. return hits ∪ fresh, same (out_col, err_col) contract as
       fetch_stage (cache hits have NULL err_col).

    The cache table is append-only parquet; racing crawls can land
    duplicate hash rows, deduped at read (same discipline as
    llm_stage_cached). At 100 TB the cache join is a hash join on
    16-byte digests — bodies shuffle only for the miss set.

    ``keep_runs`` (in ``fetch_kwargs``, default 3): miss fetches
    materialize once into a ``<cache>_runs/<id>`` dir (they feed two
    consumers); only the newest ``keep_runs`` run dirs are kept."""
    spark = df.sparkSession

    def read_cache() -> DataFrame:
        # existence check, not a bare except (r11 review): a transient
        # read failure on an existing cache must surface, not silently
        # re-crawl the whole miss set. Probed through the Hadoop
        # FileSystem (ADVICE r11 #1): os.path.exists misreads a REMOTE
        # cache (hdfs://, s3a://) as empty and re-crawls the full miss
        # set every run — the exact failure the check exists to prevent.
        from deva_spark.sources.fs import path_exists

        if not path_exists(spark, cache_path):
            return spark.createDataFrame([], "_uh string, _cbody string")
        return spark.read.parquet(cache_path).dropDuplicates(["_uh"])

    # md5(NULL) is NULL and NULL join keys never match — a NULL-url row
    # would lose its captured fetch error at the re-join and be re-tried
    # on every crawl; hash a sentinel instead so the row flows through
    # the same paths (the fetcher itself reports the bad input per-row)
    hashed = df.withColumn(
        "_uh", F.md5(F.coalesce(F.col(url_col), F.lit("<null-url>")))
    )
    joined = hashed.join(read_cache(), "_uh", "left")
    misses = (
        joined.filter(F.col("_cbody").isNull())
        .select("_uh", url_col)
        .dropDuplicates(["_uh"])
    )
    if misses.take(1):
        import uuid

        # materialize the miss fetches EXACTLY ONCE: the result feeds two
        # consumers (cache append + error surfacing) and a lazy plan would
        # re-run the network stage per consumer. The run dir doubles as
        # the crawl audit trail (llm_stage_cached has one consumer, so it
        # writes the cache directly; here the single write is the run).
        # Bounded: keep the newest `keep_runs` run dirs — a recurring
        # crawl with one permanently-failing URL would otherwise grow a
        # new full-bodies dir per invocation forever. Pruned dirs belong
        # to PRIOR invocations whose returned plans are long consumed.
        keep_runs = int(fetch_kwargs.pop("keep_runs", 3))
        runs_root = f"{cache_path}_runs"
        # prune through the Hadoop FS so a remote cache's run dirs are
        # bounded too (os.listdir only saw local ones — ADVICE r11 #1)
        from deva_spark.sources.fs import delete_path, list_subdirs_by_mtime

        old = list_subdirs_by_mtime(spark, runs_root)
        for d in old[: max(0, len(old) - (keep_runs - 1))]:
            try:
                delete_path(spark, d)
            except Exception:
                pass  # best-effort GC, same as the old ignore_errors
        run_path = f"{runs_root.rstrip('/')}/{uuid.uuid4().hex[:12]}"
        fetch_stage(
            misses, url_col, "_fbody", "_ferr", fetcher, **fetch_kwargs
        ).write.parquet(run_path)
        run = spark.read.parquet(run_path)
        run.filter(F.col("_ferr").isNull()).select(
            "_uh", F.col("_fbody").alias("_cbody")
        ).write.mode("append").parquet(cache_path)
        # errors of THIS crawl surface on the returned rows: re-join the
        # updated cache for bodies, then left-join the miss errors by hash.
        # The error set is materialized EAGERLY (ADVICE r9): the returned
        # plan must not reference run_path lazily, because a later
        # invocation's keep_runs pruning could delete it before the caller
        # collects — a bounded driver collect (one short string per failed
        # URL of this batch, and the batch is the caller's crawl list, not
        # the corpus) buys a plan with no dangling file dependency. Each
        # _ferr is TRUNCATED before the collect (ADVICE r10): a fetcher
        # that stuffs a response body into its exception message must not
        # turn a high-failure crawl into a driver-memory hazard.
        err_rows = (
            run.filter(F.col("_ferr").isNotNull())
            .select("_uh", F.substring("_ferr", 1, 512).alias("_ferr"))
            .collect()
        )
        errs = spark.createDataFrame(err_rows, "_uh string, _ferr string")
        joined = (
            hashed.join(read_cache(), "_uh", "left")
            .join(F.broadcast(errs), "_uh", "left")
        )
        return (
            joined.withColumn(out_col, F.col("_cbody"))
            .withColumn(err_col, F.col("_ferr"))
            .drop("_uh", "_cbody", "_ferr")
        )
    return (
        joined.withColumn(out_col, F.col("_cbody"))
        .withColumn(err_col, F.lit(None).cast("string"))
        .drop("_uh", "_cbody")
    )
