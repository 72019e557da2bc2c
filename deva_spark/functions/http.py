"""HTTP fetch stage (crawler/httpx analog).

Reference surface: ``Stream.crawler`` — async per-event HTTP fetch with a
worker pool (`/root/reference/deva/core/core.py:1655-1851`), ``httpx``
(`core.py:1560-1652`), ``read_from``/``post_to`` (`pipe.py:1199-1378`).

Spark mapping: a ``mapInPandas`` stage — each partition fans its URLs out
through a bounded thread pool (the ``workers=`` knob), so total
concurrency = executors × pool size, rate-limited upstream by partition
sizing (``maxOffsetsPerTrigger`` in streaming).

This container has no network egress, so the default fetcher is a
deterministic stub; inject a real one (``Callable[[str], str]`` — e.g.
``lambda u: requests.get(u).text``). The Spark plumbing — batching,
bounded fan-out, error capture per row — is real and tested.
"""

from __future__ import annotations

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


def fetch_stage(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "body",
    err_col: str = "fetch_error",
    fetcher: Callable[[str], str] | None = None,
    workers: int = 10,
) -> DataFrame:
    """Append ``out_col`` = fetch(url) per row; failures captured into
    ``err_col`` (side-output pattern) instead of failing the stage —
    matching the crawler's per-event error tolerance."""
    call = fetcher or stub_fetcher
    out_schema = StructType(
        df.schema.fields
        + [StructField(out_col, StringType()), StructField(err_col, StringType())]
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        def one(url: str) -> tuple[str | None, str | None]:
            try:
                return call(url), None
            except Exception as e:  # noqa: BLE001 — per-row error capture
                return None, f"{type(e).__name__}: {e}"

        with ThreadPoolExecutor(max_workers=workers) as pool:
            for pdf in pdfs:
                results = list(pool.map(one, pdf[url_col].tolist()))
                pdf = pdf.copy()
                pdf[out_col] = [r[0] for r in results]
                pdf[err_col] = [r[1] for r in results]
                yield pdf

    return df.mapInPandas(run, schema=out_schema)
