"""WebDataset-style sharded tar export/import for training dataloaders.

The reference's sinks write streams to files/sockets/brokers
(`/root/reference/deva/core/sources.py`, `namespace.py` persistence);
the training-data extension a 100 TB pipeline actually ships to GPUs is
the sharded-tar layout WebDataset/DALI-style loaders stream: N samples
per ``shard-%06d.tar``, each sample a group of ``<key>.<ext>`` entries,
keys zero-padded and sorted so a shard reads sequentially.

Scale shape:
  * WRITE — one shuffle keyed on shard id (the payload is the sample
    rows themselves, unavoidable: a shard is a sequential file), then
    one ``applyInPandas`` group per shard builds its tar on the
    executor and emits a one-row manifest. Parallelism = number of
    shards; per-task memory = one shard (bounded by ``shard_size`` —
    pick it so a shard is O(100 MB-1 GB), the layout loaders want
    anyway). Each task attempt writes an ATTEMPT-UNIQUE temp file and
    publishes via rename, so neither a killed job nor a speculative /
    zombie retry of the same shard group can leave a torn tar.
  * READ — a tiny DataFrame of shard paths fans out via
    ``mapInPandas``; each task streams its tar sequentially. Entry
    bytes never pass through the driver in either direction.

Local/posix (or file://) paths only, rejected loudly otherwise
(:func:`deva_spark.sources.fs.require_local` — tarfile is a posix-fd
protocol; for object stores, write locally and upload, or mount).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from deva_spark.sources.fs import require_local

#: manifest row emitted per shard by :func:`to_webdataset`
MANIFEST_SCHEMA = (
    "shard_id long, path string, n_samples long, n_entries long, "
    "data_bytes long, tar_bytes long, entries_digest string"
)


def _entry_name(key, ext: str) -> str:
    """WebDataset member name: zero-padded for integer keys — Python or
    numpy (``iterrows`` keeps ``np.int64`` on homogeneous numeric
    frames) — so tar listing order == numeric key order; verbatim for
    string keys."""
    if isinstance(key, (int, np.integer)) and not isinstance(key, bool):
        return f"{int(key):012d}.{ext}"
    return f"{key}.{ext}"


def _existing_shards(path: str) -> list[str]:
    try:
        return sorted(
            f for f in os.listdir(path)
            if f.startswith("shard-") and (f.endswith(".tar") or ".tmp" in f)
        )
    except FileNotFoundError:
        return []


def to_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    columns: dict[str, str] | None = None,
    shard_size: int = 1000,
    shard_col: str | None = None,
    overwrite: bool = False,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``path``; returns the
    per-shard manifest (``MANIFEST_SCHEMA``) — a normal DataFrame, so
    the caller materializes it with the action of their choice (and a
    pipeline can join it against expectations as a write audit).

    ``columns`` maps column -> entry extension (default
    ``{"text": "txt"}``): string values write UTF-8 bytes, binary
    values write verbatim, NULLs write an empty entry (so every sample
    contributes the same entry set and loaders never desynchronize on
    sparse columns). NULL keys or shard ids raise — a loader key must
    exist. Sharding is ``key // shard_size`` (deterministic, no extra
    scan) unless ``shard_col`` names a precomputed assignment.
    ``entries_digest`` is the md5 over the shard's ordered
    ``(name, md5(bytes))`` pairs — the cheap equality check for
    re-export comparisons and the read-back audit.

    A destination already holding ``shard-*.tar`` files raises unless
    ``overwrite=True``, which deletes them EAGERLY (at call time, not
    at materialization): a re-export of a SMALLER dataset would
    otherwise leave stale high-numbered shards that
    :func:`read_webdataset` silently includes — phantom samples from
    deleted data, the classic stale-artifact hazard.
    """
    path = require_local(path, "to_webdataset")
    columns = dict(columns or {"text": "txt"})
    for col in (key_col, *columns, *((shard_col,) if shard_col else ())):
        if col not in df.columns:
            raise ValueError(f"column {col!r} not in DataFrame")
    # Entry columns must be string or binary AT VALIDATION TIME: any
    # other type would fall through to ``bytes(v)`` on the executor,
    # where an int value serializes as N zero bytes — silent corruption
    # for the natural "label column -> .cls entry" case (ADVICE r13).
    # Encode explicitly (CAST to string, or pack to binary) and resubmit.
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    bad = {c: types[c] for c in columns if types[c] not in ("string", "binary")}
    if bad:
        raise ValueError(
            f"entry columns must be string or binary, got {bad}: cast "
            "explicitly (e.g. CAST(label AS STRING)) — bytes(int) would "
            "silently write N zero bytes, not the value"
        )
    stale = _existing_shards(path)
    if stale:
        if not overwrite:
            raise ValueError(
                f"{path!r} already holds {len(stale)} shard file(s); pass "
                "overwrite=True to replace them (stale shards would "
                "otherwise survive a smaller re-export and feed loaders "
                "phantom samples)"
            )
        for f in stale:
            os.remove(os.path.join(path, f))
    os.makedirs(path, exist_ok=True)
    shard = (
        F.col(shard_col)
        if shard_col
        # ``div`` = JVM integer division: float ``/`` + floor goes
        # through double and mis-shards int64 keys past 2^53
        # (ADVICE r13); negative keys are rejected in write_shard.
        # Backticks: a hyphenated or reserved-word key column must
        # parse as ONE identifier, not an arithmetic expression.
        else F.expr(f"`{key_col}` div {int(shard_size)}")
    ).cast("long").alias("_shard")
    src = df.select(shard, key_col, *columns)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["_shard"].isna().any() or pdf[key_col].isna().any():
            raise ValueError(
                "NULL shard id / key: every sample needs a loader key "
                f"(key_col={key_col!r}"
                + (f", shard_col={shard_col!r})" if shard_col else ")")
            )
        sid = int(pdf["_shard"].iloc[0])
        keys_neg = (
            pd.api.types.is_numeric_dtype(pdf[key_col])
            and bool((pdf[key_col] < 0).any())
        )
        if sid < 0 or keys_neg:
            # a negative shard id would mint 'shard--00001.tar' and
            # break the read-side basename parse (and `div` truncates
            # toward zero, so key -5 // 10 still lands in shard 0 with
            # a '-00000000005.txt' member) — loader keys are >= 0
            raise ValueError(
                f"negative key/shard id (shard {sid}): loader keys must "
                f"be >= 0 (key_col={key_col!r})"
            )
        pdf = pdf.sort_values(key_col, kind="mergesort")
        dst = os.path.join(path, f"shard-{sid:06d}.tar")
        # attempt-unique temp name: a speculative or zombie retry of
        # this group must not interleave writes into one fd — each
        # attempt builds its own file and the rename publishes exactly
        # one of them whole
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        tmp = f"{dst}.{attempt}.tmp"
        n_entries = 0
        data_bytes = 0
        digest = hashlib.md5()
        try:
            with tarfile.open(tmp, "w") as tf:
                for _, row in pdf.iterrows():
                    for col, ext in columns.items():
                        v = row[col]
                        if v is None or (
                            isinstance(v, float) and pd.isna(v)
                        ):
                            data = b""
                        elif isinstance(v, str):
                            data = v.encode("utf-8")
                        else:
                            data = bytes(v)
                        name = _entry_name(row[key_col], ext)
                        info = tarfile.TarInfo(name=name)
                        info.size = len(data)
                        info.mtime = 0  # deterministic: same df, same tar
                        tf.addfile(info, io.BytesIO(data))
                        n_entries += 1
                        data_bytes += len(data)
                        digest.update(name.encode())
                        digest.update(hashlib.md5(data).digest())
            os.replace(tmp, dst)
        finally:
            if os.path.exists(tmp):  # failed attempt: no litter
                os.remove(tmp)
        return pd.DataFrame(
            [
                (
                    sid, dst, len(pdf), n_entries, data_bytes,
                    os.path.getsize(dst), digest.hexdigest(),
                )
            ],
            columns=[
                "shard_id", "path", "n_samples", "n_entries",
                "data_bytes", "tar_bytes", "entries_digest",
            ],
        )

    return src.groupBy("_shard").applyInPandas(
        write_shard, schema=MANIFEST_SCHEMA
    )


def read_webdataset(
    spark: SparkSession, path: str, parallelism: int | None = None
) -> DataFrame:
    """Read tar shards written by :func:`to_webdataset` (or any
    WebDataset-convention tars) back as
    ``(shard_id, key, ext, data binary)`` — one row per tar entry,
    streamed sequentially per shard on executors. Entry names split at
    the FIRST dot of the basename (the WebDataset convention), so
    multi-part extensions like ``000123.seg.png`` keep the sample key
    ``000123`` and ext ``seg.png``."""
    path = require_local(path, "read_webdataset")
    shards = sorted(
        f for f in os.listdir(path)
        if f.startswith("shard-") and f.endswith(".tar")
    )
    if not shards:
        raise ValueError(f"no shard-*.tar files under {path!r}")
    files = spark.createDataFrame(
        [(os.path.join(path, f),) for f in shards], "path string"
    ).repartition(parallelism or len(shards))

    def read_shard(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            for p in pdf["path"]:
                sid = int(os.path.basename(p)[6:-4])
                rows = []
                with tarfile.open(p, "r") as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        stem, _, ext = m.name.partition(".")
                        fh = tf.extractfile(m)
                        rows.append(
                            (sid, stem, ext, fh.read() if fh else b"")
                        )
                yield pd.DataFrame(
                    rows, columns=["shard_id", "key", "ext", "data"]
                )

    return files.mapInPandas(
        read_shard, schema="shard_id long, key string, ext string, data binary"
    )
