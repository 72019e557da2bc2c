"""Manifest-based snapshots: time travel for the staged operational
tables (assignment tables, band/window/digest indexes, synopsis tables).

The incremental-corpus ring appends to its staged projections and the
governance ring rewrites them (retraction, keep-best) — at 100 TB both
need the property a bare parquet directory cannot give: reading
YESTERDAY's table while today's append/retract lands, auditing what an
earlier resolution saw, and rolling a bad batch back without a restore
job. Table formats (Iceberg/Delta) solve this with manifest files; this
is the same idea at minimum viable size, with no new dependencies:

  * data files are IMMUTABLE once written (each commit writes into its
    own ``data/snap-<version>-<uuid>/`` directory — never into another
    version's);
  * a VERSION is a JSON manifest listing exactly the data directories
    visible in it; manifests are written to a temp name and RENAMED into
    place, so a version is either fully present or absent (single-file
    rename — the only atomicity primitive this needs);
  * readers resolve a manifest, then scan only its directories — a
    reader holding version N is untouched by any later commit, append,
    rollback, or expiry that keeps N.

Rollback is NON-destructive (a new version that re-lists an old
version's files), so audit history survives it; `expire_snapshots` is
the explicit garbage collector, exactly like Iceberg's.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:06d}.json")


def snapshot_versions(path: str) -> list[int]:
    """Committed versions, ascending. Ignores temp files (a crashed
    commit leaves only a temp manifest, which is invisible here)."""
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        m = re.fullmatch(r"v(\d{6})\.json", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _commit_manifest(path: str, manifest: dict, version: int) -> bool:
    """Atomically claim ``version`` for ``manifest``. Writes a temp file
    then hard-links it to the final name — ``os.link`` fails with EEXIST
    if another committer already claimed the version (POSIX ``rename``
    would silently REPLACE it, losing that commit from the lineage).
    Returns False on a lost race so the caller can retry with the next
    version number (ADVICE r8 #1)."""
    os.makedirs(_manifest_dir(path), exist_ok=True)
    tmp = os.path.join(_manifest_dir(path), f"_tmp_{uuid.uuid4().hex[:8]}.json")
    with open(tmp, "w") as fh:
        # Stats are normalized BY TYPE at collection time
        # (_normalize_stat, ADVICE r11 #3) — every value in the manifest
        # is already JSON-native (number or ISO string), so no default=
        # escape hatch that would silently stringify a Decimal into
        # lexicographic comparisons ('9' > '10').
        json.dump(manifest, fh)
    try:
        os.link(tmp, _manifest_path(path, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def _normalize_stat(value, round_down: bool, col: str = ""):
    """JSON-native, ORDER-PRESERVING stat encoding (ADVICE r11 #3): the
    old blanket ``json.dump(default=str)`` serialized Decimal stats as
    strings, and ``read_snapshot_pruned``'s lexicographic compare
    ('9' > '10') could then wrongly prune directories that CONTAIN
    matching rows — silent wrong results. Normalize by type instead:

    - int/float/str/bool/None pass through (JSON-native, right order);
    - date/datetime → ``isoformat()`` (ISO-8601 strings compare
      correctly as strings);
    - Decimal → float, WIDENED outward (min rounds down, max rounds up)
      so float rounding can only keep extra directories, never lose a
      matching one — pruning stays sound;
    - anything else → TypeError at commit time, not a corrupt manifest.
    """
    import datetime as _dt
    import math
    from decimal import Decimal

    if value is None or isinstance(value, (bool, int, str)):
        return value
    if isinstance(value, float):
        return value
    if isinstance(value, _dt.datetime) or isinstance(value, _dt.date):
        return value.isoformat()
    if isinstance(value, Decimal):
        f = float(value)
        if round_down and Decimal(f) > value:
            f = math.nextafter(f, -math.inf)
        elif not round_down and Decimal(f) < value:
            f = math.nextafter(f, math.inf)
        return f
    raise TypeError(
        f"stats_cols column {col!r} has unsupported stat type "
        f"{type(value).__name__}; supported: numeric, string, date, "
        "timestamp, decimal"
    )


class SnapshotConflictError(RuntimeError):
    """A ``require_parent`` commit lost its claim race: the latest
    version moved past the one the caller's DataFrame was computed
    against. The caller recomputes against the new latest and retries —
    the Iceberg-style optimistic-concurrency contract for REWRITE
    commits, whose payload (unlike an append's) is a function of the
    version it read."""


def commit_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "append",
    note: str = "",
    stats_cols: list[str] | None = None,
    require_parent: int | None | bool = False,
) -> int:
    """Write ``df`` as a new immutable data directory and commit a new
    version. ``mode="append"``: the new version sees the previous
    version's directories plus the new one (the arrival-batch shape —
    index rows append). ``mode="overwrite"``: the new version sees ONLY
    the new directory (the governance shape — retraction/keep-best
    rewrites), while every older version still resolves its own files.
    Returns the committed version number.

    ``require_parent`` (pass a version number, or ``None`` for "the
    lineage must still be empty") makes the commit CONDITIONAL on the
    latest version still being that value at claim time: a lost race
    raises :class:`SnapshotConflictError` after removing the orphaned
    data directory, instead of silently committing a payload computed
    against a superseded version (ADVICE r10 — the index_retract
    read→anti-join→overwrite window). Appends of NEW rows don't need it;
    every read-modify-rewrite does."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite (got {mode!r})")
    guarded = require_parent is not False
    versions = snapshot_versions(path)
    prev = versions[-1] if versions else None
    new_version = (prev + 1) if prev is not None else 1
    data_dir = f"snap-{new_version:06d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(os.path.join(path, "data", data_dir))
    fresh_stats: dict = {}
    if stats_cols:
        # Iceberg-lite manifest stats: per-commit min/max per column (one
        # bounded aggregate over the just-written directory) lets readers
        # prune whole DIRECTORIES before any file is opened — the level
        # above parquet row-group skipping, and the one that matters when
        # an append lineage holds thousands of batch dirs
        from pyspark.sql import functions as F

        spark = df.sparkSession
        fresh = spark.read.parquet(os.path.join(path, "data", data_dir))
        row = fresh.agg(
            *[F.min(c).alias(f"_mn_{c}") for c in stats_cols],
            *[F.max(c).alias(f"_mx_{c}") for c in stats_cols],
        ).collect()[0]
        fresh_stats[data_dir] = {
            c: [
                _normalize_stat(row[f"_mn_{c}"], round_down=True, col=c),
                _normalize_stat(row[f"_mx_{c}"], round_down=False, col=c),
            ]
            for c in stats_cols
        }
    # claim loop: a racing committer that wins the exclusive-create makes
    # us recompute the visible set against the NEW latest version and try
    # the next number — both commits land, neither's rows vanish. Under
    # ``require_parent`` the retry is NOT taken: the payload was computed
    # against the superseded version, so the caller must recompute.
    while True:
        if guarded and prev != require_parent:
            import shutil

            shutil.rmtree(
                os.path.join(path, "data", data_dir), ignore_errors=True
            )
            raise SnapshotConflictError(
                f"latest version is {prev}, expected {require_parent} "
                f"under {path}"
            )
        dirs = [data_dir]
        dir_stats = dict(fresh_stats)
        if mode == "append" and prev is not None:
            prev_manifest = _read_manifest(path, prev)
            dirs = prev_manifest["data_dirs"] + dirs
            dir_stats = {**prev_manifest.get("dir_stats", {}), **fresh_stats}
        manifest = {
            "version": new_version,
            "parent": prev,
            "mode": mode,
            "note": note,
            "data_dirs": dirs,
            "dir_stats": dir_stats,
        }
        if _commit_manifest(path, manifest, new_version):
            return new_version
        versions = snapshot_versions(path)
        prev = versions[-1] if versions else None
        new_version = (prev + 1) if prev is not None else 1


def read_snapshot(spark, path: str, version: int | None = None) -> DataFrame:
    """Scan a version (default: latest). The returned plan reads only
    that version's directories — immune to concurrent commits."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots committed under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    dirs = _read_manifest(path, v)["data_dirs"]
    # mergeSchema: append-lineage versions may span a column addition
    # (schema evolution); the merged read presents the union schema with
    # NULLs for files written before the column existed
    return spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, "data", d) for d in dirs]
    )


def snapshot_history(path: str) -> list[dict]:
    """All committed manifests, ascending by version (the audit trail:
    parent links, commit mode, note, visible directories)."""
    return [_read_manifest(path, v) for v in snapshot_versions(path)]


def rollback_snapshot(path: str, to_version: int, note: str = "") -> int:
    """Commit a NEW version whose visible set is exactly
    ``to_version``'s — a non-destructive undo (history keeps the bad
    version for audit; `expire_snapshots` reclaims it later)."""
    versions = snapshot_versions(path)
    if to_version not in versions:
        raise FileNotFoundError(f"version {to_version} not in {versions}")
    target = _read_manifest(path, to_version)
    target_dirs = list(target["data_dirs"])
    # carry dir_stats forward (restricted to the re-listed dirs) so a
    # rollback does not silently disable manifest-level data skipping
    # for every pre-rollback directory (ADVICE r8 #2)
    target_stats = {
        d: s
        for d, s in target.get("dir_stats", {}).items()
        if d in set(target_dirs)
    }
    prev = versions[-1]
    new_version = prev + 1
    while True:
        manifest = {
            "version": new_version,
            "parent": prev,
            "mode": "rollback",
            "note": note or f"rollback to v{to_version}",
            "data_dirs": target_dirs,
            "dir_stats": target_stats,
        }
        if _commit_manifest(path, manifest, new_version):
            return new_version
        prev = snapshot_versions(path)[-1]
        new_version = prev + 1


def expire_snapshots(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions and DELETE data
    directories no surviving version references — the explicit GC
    (append-mode data dirs shared by surviving versions are kept).
    Returns the expired version numbers."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snapshot_versions(path)
    expired = versions[:-keep_last]
    if not expired:
        return []
    keep = versions[-keep_last:]
    live = {d for v in keep for d in _read_manifest(path, v)["data_dirs"]}
    dead = {
        d
        for v in expired
        for d in _read_manifest(path, v)["data_dirs"]
        if d not in live
    }
    for v in expired:
        os.remove(_manifest_path(path, v))
    for d in dead:
        shutil.rmtree(os.path.join(path, "data", d), ignore_errors=True)
    return expired


def _dir_size(path: str, data_dir: str) -> tuple[int, int]:
    """(rows, bytes) of one data directory from parquet FOOTERS and file
    metadata only — no scan. Footer num_rows is exact; bytes are the
    on-disk parquet sizes. O(files) driver-side metadata reads, the same
    cost class as manifest resolution."""
    import pyarrow.parquet as pq

    d = os.path.join(path, "data", data_dir)
    rows = nbytes = 0
    for name in os.listdir(d):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(d, name)
        rows += pq.ParquetFile(p).metadata.num_rows
        nbytes += os.path.getsize(p)
    return rows, nbytes


def evict_to_cap(
    path: str,
    max_rows: int | None = None,
    max_bytes: int | None = None,
    note: str = "",
) -> tuple[int, list[str]]:
    """SIZE-CAPPED retention on the snapshot lineage — the reference
    DBStream's eviction contract (`/root/reference/deva/core/store.py:174-197`
    evicts oldest rows once a max-size cap is exceeded; the age-based
    sibling is `writers.evict_older_than`): commit a NEW version whose
    visible set drops the OLDEST data directories (append order) until
    the remaining total fits ``max_rows`` / ``max_bytes`` (whichever
    caps are given; both must hold). Granularity is a whole batch
    directory — the append-lineage analog of the reference's
    oldest-rows delete, and an O(1) manifest operation instead of a
    data rewrite.

    NON-destructive like :func:`rollback_snapshot`: older versions
    still resolve their own files for audit until
    :func:`expire_snapshots` reclaims them. The newest directory is
    always kept, even when it alone exceeds the cap (evicting the data
    that just arrived would make every append a no-op). Returns
    ``(version, dropped_dirs)`` — the current latest version and ``[]``
    when already within cap (no empty commit)."""
    if max_rows is None and max_bytes is None:
        raise ValueError("give max_rows and/or max_bytes")
    # Claim-retry LOOP (not recursion — ADVICE r10: sustained contention
    # must not exhaust the interpreter stack, and each retry legitimately
    # re-reads footers because eviction is RELATIVE to the latest visible
    # set: the racer's commit may have appended a directory a stale list
    # would silently drop). Bounded: a maintenance job that loses this
    # many consecutive races should surface, not spin.
    for _attempt in range(20):
        versions = snapshot_versions(path)
        if not versions:
            raise FileNotFoundError(f"no snapshots committed under {path}")
        prev = versions[-1]
        manifest = _read_manifest(path, prev)
        dirs = list(manifest["data_dirs"])
        sizes = {d: _dir_size(path, d) for d in dirs}
        total_rows = sum(r for r, _ in sizes.values())
        total_bytes = sum(b for _, b in sizes.values())

        def over() -> bool:
            return (max_rows is not None and total_rows > max_rows) or (
                max_bytes is not None and total_bytes > max_bytes
            )

        dropped: list[str] = []
        while over() and len(dirs) > 1:
            oldest = dirs.pop(0)
            dropped.append(oldest)
            r, b = sizes[oldest]
            total_rows -= r
            total_bytes -= b
        if not dropped:
            return prev, []
        keep_stats = {
            d: s
            for d, s in manifest.get("dir_stats", {}).items()
            if d in set(dirs)
        }
        m = {
            "version": prev + 1,
            "parent": prev,
            "mode": "evict",
            "note": note or f"evict_to_cap dropped {len(dropped)} dir(s)",
            "data_dirs": dirs,
            "dir_stats": keep_stats,
        }
        if _commit_manifest(path, m, prev + 1):
            return prev + 1, dropped
    raise RuntimeError(
        f"evict_to_cap lost 20 consecutive commit races under {path}"
    )


def snapshot_diff(
    spark,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: list[str],
) -> "DataFrame":
    """Row-level diff between two versions keyed by ``key_cols``:
    returns ``key_cols..., change`` with change in ``added | removed``
    (a key present in both versions with different payload shows as
    removed + added only if the payload is part of the key; pass the
    full column list for full-row diff semantics). Two anti-joins over
    the two versions' scans — the audit query behind every governance
    review: what did the retraction actually remove, what did the batch
    actually add."""
    from pyspark.sql import functions as F

    a = read_snapshot(spark, path, from_version).select(*key_cols)
    b = read_snapshot(spark, path, to_version).select(*key_cols)
    added = b.join(a, key_cols, "left_anti").withColumn(
        "change", F.lit("added")
    )
    removed = a.join(b, key_cols, "left_anti").withColumn(
        "change", F.lit("removed")
    )
    return added.unionByName(removed)


def compact_snapshots(spark, path: str, note: str = "compaction") -> int:
    """Rewrite the CURRENT visible set as one fresh data directory and
    commit it — the snapshot-table form of `writers.compact_table`: an
    append-heavy lineage accumulates one directory per batch, and at
    100 TB directory/file count (not bytes) throttles the scan planner.
    History is untouched (old versions still resolve their own dirs
    until `expire_snapshots` reclaims them); readers switch to the
    compacted version atomically at its manifest rename."""
    return commit_snapshot(
        read_snapshot(spark, path), path, mode="overwrite", note=note
    )


def read_snapshot_pruned(
    spark,
    path: str,
    bounds: dict[str, tuple],
    version: int | None = None,
) -> "DataFrame":
    """Version read with MANIFEST-LEVEL data skipping: directories whose
    committed min/max stats (``commit_snapshot(stats_cols=...)``) fall
    entirely outside every ``col: (lo, hi)`` band are dropped from the
    scan before a single file opens — the directory-granularity layer
    above parquet row-group skipping. Directories without stats always
    survive (sound by construction: no stats, no pruning). The residual
    filter still applies inside surviving dirs via the ordinary pushed
    predicate the CALLER adds — this function only shrinks the file
    listing."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots committed under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    manifest = _read_manifest(path, v)
    stats = manifest.get("dir_stats", {})
    # normalize caller bounds with the SAME encoding the commit used —
    # a Decimal/date bound must compare against float/ISO stats in the
    # stats' own domain, widened outward so rounding never over-prunes
    bounds = {
        col: (
            _normalize_stat(lo, round_down=True, col=col),
            _normalize_stat(hi, round_down=False, col=col),
        )
        for col, (lo, hi) in bounds.items()
    }
    keep = []
    for d in manifest["data_dirs"]:
        st = stats.get(d)
        hit = True
        if st:
            for col, (lo, hi) in bounds.items():
                if col in st and st[col][0] is not None:
                    mn, mx = st[col]
                    if mx < lo or mn > hi:
                        hit = False
                        break
        if hit:
            keep.append(d)
    if not keep:  # empty result with the right schema
        return read_snapshot(spark, path, v).limit(0)
    return spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, "data", d) for d in keep]
    )
