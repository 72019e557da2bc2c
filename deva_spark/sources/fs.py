"""Filesystem helpers that see what Spark sees.

``spark.read/write.parquet`` accept any Hadoop-registered URI scheme
(``hdfs://``, ``s3a://``, ``file://``), but ``os.path.exists`` only sees
the driver's local filesystem — so an existence probe on a REMOTE table
silently answers "absent" and first-write fast paths overwrite or
re-compute data that is very much there (ADVICE r11 #1). These helpers
route existence/listing/deletion through the same Hadoop ``FileSystem``
the scans use, and :func:`require_local` rejects remote schemes for the
functions whose rename-swap protocol is genuinely local-only.

Reference surface: the DBStream persistence layer
(`/root/reference/deva/core/store.py:174-304`) assumes one local sqlite
file; on Spark the storage is a URI and the driver-side protocol has to
be honest about which schemes it supports.
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def path_scheme(path: str) -> str:
    """URI scheme of ``path`` ('' for scheme-less local paths)."""
    m = _SCHEME_RE.match(path)
    return m.group(0)[:-1].lower() if m else ""


def require_local(path: str, op: str) -> str:
    """Reject non-local URIs for driver-side rename-swap protocols.

    ``merge_upsert_by_key`` / ``compact_table`` / ``evict_older_than``
    stage with ``os.rename``/``shutil.rmtree`` — atomic only on a local
    posix filesystem. On a remote URI the old code's ``os.path.exists``
    probe returned False and ``mode('overwrite')`` replaced the table
    with only the new rows (silent data loss). Fail loudly instead and
    point at the distributed alternative. Returns the path with any
    ``file:`` prefix stripped so the os-level calls work."""
    scheme = path_scheme(path)
    if scheme in ("", "file"):
        return re.sub(r"^file:(//)?", "", path)
    raise ValueError(
        f"{op} uses a local rename-swap commit protocol and cannot "
        f"operate on {scheme}:// URIs (got {path!r}). Use "
        "upsert_by_partition (dynamic partition overwrite) or a "
        "transactional table format for remote storage."
    )


def _fs_and_path(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark, path: str) -> bool:
    """Existence through the Hadoop FileSystem API — true for any scheme
    Spark itself can read, unlike ``os.path.exists`` (ADVICE r11 #1:
    a remote cache misread as empty re-crawls / re-bills the full miss
    set every run)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def list_subdirs_by_mtime(spark, path: str) -> list[str]:
    """Immediate subdirectories of ``path`` as URI strings, oldest
    first — the run-dir pruning primitive, scheme-agnostic."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    entries = [
        (st.getModificationTime(), st.getPath().toString())
        for st in fs.listStatus(hpath)
        if st.isDirectory()
    ]
    return [p for _, p in sorted(entries)]


def delete_path(spark, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem (rmtree analog)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, True))
