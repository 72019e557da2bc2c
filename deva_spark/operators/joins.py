"""Joins and stream-alignment combinators.

The reference has no relational join in its engine — joins appear as stream
combinators (``zip`` `/root/reference/deva/core/compute/ops.py:178-288`,
``combine_latest`` `ops.py:290-354`, ``zip_latest`` `ops.py:617-679`) and as
pandas merges in the app layer (`deva/naja/strategy/entry.py:682-698`).
Here they all become DataFrame joins / window functions.

Scale notes: dimension enrichment broadcasts the small side (no shuffle of
the fact table); fact-fact joins are shuffle hash / sort-merge on the join
key with AQE skew splitting. ``zip`` (positional) and as-of alignment key
on explicit ``(ts, event_id)`` because a distributed engine has no ambient
arrival order (SURVEY.md §7.3).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: `asof_join(tolerance=...)` is interpolated into `F.expr(f"INTERVAL
#: {tolerance}")`; restrict it to the day-time interval grammar so an
#: arbitrary string can't smuggle SQL into the plan (ADVICE r7)
_INTERVAL_RE = re.compile(
    r"^'?\d+(\.\d+)?'?\s+"
    r"(microsecond|millisecond|second|minute|hour|day|week)s?$",
    re.IGNORECASE,
)


def _validate_interval(tolerance: str) -> None:
    if not isinstance(tolerance, str) or not _INTERVAL_RE.match(
        tolerance.strip()
    ):
        raise ValueError(
            "tolerance must be a day-time INTERVAL string like '1 hour' "
            f"or '30 seconds', got {tolerance!r}"
        )


def broadcast_join_null_safe(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Inner broadcast equi-join on ``keys`` with NULL-SAFE equality
    (``<=>``): a name-based equi-join uses null-REJECTING equality, so a
    left row whose key is NULL is silently dropped even when the right
    side carries its matching NULL-keyed aggregate row (``groupBy`` keeps
    the NULL group; SQL window partitions do too — the r11 review found
    two group-total joins diverging from their window-based oracles
    exactly this way). Right-side key columns are renamed away and
    dropped, so the output carries left's key columns plus right's
    payload. Right is broadcast: this is the group-total / offset-table
    shape — metadata-sized by contract."""
    renames = {g: f"_rk_{g}" for g in keys}
    r = right
    for g, rg in renames.items():
        r = r.withColumnRenamed(g, rg)
    cond = F.lit(True)
    for g, rg in renames.items():
        cond = cond & F.col(g).eqNullSafe(F.col(rg))
    return left.join(F.broadcast(r), cond).drop(*renames.values())


def enrich(
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> Callable[[DataFrame], DataFrame]:
    """Dimension-enrich join (naja merge analog, `entry.py:682-698`).

    ``broadcast_dim=True`` ships the dim table to every executor — the fact
    side never shuffles. Only disable for dims too big to broadcast.
    """

    def _t(df: DataFrame) -> DataFrame:
        right = F.broadcast(dim) if broadcast_dim else dim
        return df.join(right, on=on, how=how)

    return _t


def semi_join(other: DataFrame, on: str | list[str] | Column) -> Callable[[DataFrame], DataFrame]:
    """EXISTS — left semi join: probe side emits each row at most once and
    the build side carries only the key columns."""

    def _t(df: DataFrame) -> DataFrame:
        return df.join(other, on=on, how="left_semi")

    return _t


def anti_join(other: DataFrame, on: str | list[str] | Column) -> Callable[[DataFrame], DataFrame]:
    """NOT EXISTS — left anti join."""

    def _t(df: DataFrame) -> DataFrame:
        return df.join(other, on=on, how="left_anti")

    return _t


def positional_zip(
    left: DataFrame,
    right: DataFrame,
    order: Sequence[str],
    left_cols: dict[str, str],
    right_cols: dict[str, str],
) -> DataFrame:
    """``zip`` analog (`ops.py:178-288`): pair the i-th element of each input.

    Each side gets a global sequence number via the two-phase
    :func:`~deva_spark.operators.windows.global_positions` (quantile
    range-buckets + partition-local row_number + broadcast offsets — no
    single-reducer window), then an inner join on the sequence id
    (unmatched tails drop, matching the reference's bounded-buffer
    behavior).
    """
    from deva_spark.operators.windows import global_positions

    l = global_positions(left, order, out="rn").select(
        *[F.col(c).alias(a) for c, a in left_cols.items()], "rn"
    )
    r = global_positions(right, order, out="rn").select(
        *[F.col(c).alias(a) for c, a in right_cols.items()], "rn"
    )
    return l.join(r, "rn", "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """True as-of JOIN between two tables: each left row gets the most
    recent right row (per key) with ``right_ts <= left_ts``.

    Union-then-window formulation: tag both sides, sort by (key, ts, side)
    and carry the last right values forward — ONE shuffle on the key, no
    range self-join blowup (the naive `left.join(right, ts<=) + max` is
    quadratic per key). This is the scalable as-of shape; the reference's
    ``combine_latest`` (`ops.py:290-354`) is the single-stream special
    case.

    ``tolerance``: an INTERVAL string (e.g. ``"1 hour"``) — a match
    older than ``left_ts - tolerance`` is nulled out (the pandas
    ``merge_asof(tolerance=...)`` semantics). Implemented by carrying
    the matched right ROW as one (ts, values...) struct and masking in
    the output projection: same single shuffle, no extra pass.

    Match semantics are ROW-level (DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof``): the matched right row supplies ALL value columns,
    including its NULLs — values never mix across right rows, so the
    tolerance gate always applies to the row that supplied each value
    (ADVICE r7: per-column last-non-null carry let an out-of-tolerance
    older value slip through when the newest row had a NULL).
    """
    if tolerance is not None:
        _validate_interval(tolerance)
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    # a NULL right_ts can never satisfy right_ts <= left_ts (DuckDB
    # ASOF and pandas merge_asof both agree) — but in the union-window
    # formulation it sorted FIRST (asc nulls-first) and its non-null
    # row struct was carried forward by last(ignorenulls), handing left
    # rows with no real predecessor the NULL-ts row's values (r12
    # review, reproduced). Drop such rows up front.
    rt = (
        right.filter(F.col(right_ts).isNotNull())
        .withColumn("_side", F.lit(0))
        .withColumn("_ats", F.col(right_ts))
    )
    rts_type = right.schema[right_ts].dataType
    # the matched right row travels as ONE struct (its own ts + values):
    # last(ignorenulls) over the struct carries whole rows, never a mix
    row_struct_fields = [F.col(right_ts).alias("__rts")] + [
        F.col(c).alias(c) for c in value_cols
    ]
    null_struct = F.lit(None).cast(
        "struct<__rts:{}, {}>".format(
            rts_type.simpleString(),
            ", ".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in value_cols
            ),
        )
    )
    # shared union schema: left columns + the right-row struct slot
    lt2 = lt.select(*left.columns, "_side", "_ats", null_struct.alias("_rrow"))
    rt2 = rt.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in rt.columns
            else F.col(c)
            for c in left.columns
        ],
        F.col("_side"),
        F.col("_ats"),
        F.struct(*row_struct_fields).alias("_rrow"),
    )
    u = lt2.unionByName(rt2)
    # right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so
    # an exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rrow", ignorenulls=True).over(w)
    if tolerance is not None:
        matched = F.when(
            matched["__rts"] >= F.col("_ats") - F.expr(f"INTERVAL {tolerance}"),
            matched,
        )
    carried = u.select("*", matched.alias("_m"))
    out_vals = [F.col("_m")[c].alias(f"{c}{suffix}") for c in value_cols]
    base_cols = [c for c in left.columns]
    return (
        carried.filter(F.col("_side") == 1)
        .select(*base_cols, *out_vals)
    )


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range (theta) join: assign each fact row the band whose
    [lo, hi) interval contains its value. The band table is broadcast
    (bands are inherently small); the join is a broadcast nested-loop with
    a range predicate — no shuffle of the fact side."""

    return facts.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )


def asof_latest(
    value_when: Column,
    partition: str,
    order: Sequence[str],
    out: str,
) -> Callable[[DataFrame], DataFrame]:
    """``combine_latest``/``zip_latest`` analog (`ops.py:290-354`, `617-679`).

    As-of alignment: for every row, the most recent non-null value of
    ``value_when`` (an expression that is NULL on non-trigger rows) within
    the partition, in event-time order. One window shuffle on the partition
    key; no join.
    """

    def _t(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(partition)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out, F.last(value_when, ignorenulls=True).over(w))

    return _t


def build_bloom_bitmap(
    small: DataFrame,
    key: str,
    n_hashes: int = 3,
    n_bits: int = 1 << 16,
) -> list[int]:
    """The bloom filter of ``small[key]`` as ``n_bits / 64`` packed
    longs — a STAGEABLE artifact: 8 KB at the default geometry, a pure
    function of the key set, so pipelines build it once (a benchmark
    set, yesterday's digest table) and prune many scans against it via
    :func:`bloom_prune`. One bounded aggregate; the driver receives
    bytes fixed by geometry, never by data size."""
    word_rows = (
        small.select(
            F.explode(
                F.array(*[_bloom_pos(F.col(key), i, n_bits) for i in range(n_hashes)])
            ).alias("b")
        )
        .groupBy(F.expr("b div 64").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(b % 64 as int)))"
            ).alias("m")
        )
        .collect()
    )
    set_words = {r.w: r.m for r in word_rows}
    return [set_words.get(w, 0) for w in range(n_bits >> 6)]


def bloom_prune(
    df: DataFrame,
    key: str,
    bitmap: list[int],
    n_hashes: int = 3,
) -> DataFrame:
    """Drop rows whose key is definitely not in the set the ``bitmap``
    encodes (no false negatives; false positives pass through, to be
    resolved by whatever exact operation follows). The bitmap embeds as
    a constant-folded array literal and the membership test is
    scan-stage shift/mask algebra — zero joins, zero shuffles."""
    return df.filter(bloom_member(F.col(key), bitmap, n_hashes))


def bloom_member(col: Column, bitmap: list[int], n_hashes: int = 3) -> Column:
    """Boolean membership test against a packed-longs bloom ``bitmap``
    as a single Column expression — same shift/mask algebra the filter
    always used (``p div 64`` == ``shiftright(p, 6)`` for the
    non-negative pmod positions), without the scaffolding projections
    of one ``_bf_p{i}`` column per probe (r15)."""
    n_bits = len(bitmap) << 6
    arr = F.lit(bitmap)
    cond = None
    for i in range(n_hashes):
        p = _bloom_pos(col, i, n_bits)
        word = F.element_at(arr, (F.shiftright(p, 6) + F.lit(1)).cast("int"))
        bit = F.call_function(
            "shiftright", word, (p % F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1)) == F.lit(1)
        cond = bit if cond is None else cond & bit
    return cond


def _bloom_pos(col: Column, i: int, n_bits: int) -> Column:
    """xxhash64 probe position — internal pruning hash (never compared
    cross-engine; see :func:`bloom_pruned_join` docstring)."""
    return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)).cast("int")


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_hashes: int = 3,
    n_bits: int = 1 << 16,
    how: str = "inner",
    bitmap: list[int] | None = None,
) -> DataFrame:
    """Join with an explicit BLOOM semi-join reduction of the big side —
    the classic 100 TB shuffle-avoidance pattern (Bloom 1970; the
    runtime-filter idea behind Spark's
    ``spark.sql.optimizer.runtimeFilter.bloomFilter``, made explicit and
    engine-portable): the small side's keys set ``n_hashes``
    ``xxhash64(key, seed_i)`` bit positions in an ``n_bits`` filter;
    big-side rows whose key misses ANY position cannot join and are
    dropped by constant-folded shift/mask column algebra BEFORE the join
    shuffle ever materializes them. False positives only let extra rows
    through to the exact join — the result is IDENTICAL to the plain
    join for every ``how`` that doesn't preserve unmatched big rows
    (inner/semi), which is what makes it oracle-checkable against the
    un-pruned SQL.

    Plan shape: ONE bounded aggregate over the small side builds the
    filter as ``n_bits / 64`` packed longs (8 KB at the default geometry
    — a pure function of ``n_bits``, never of data size), which embed in
    the big side's plan as an ARRAY LITERAL; membership is then plain
    shift/mask column algebra evaluated INSIDE the big side's scan stage
    (whole-stage codegen, no extra join, no shuffle before the prune).
    This is exactly how engine runtime filters broadcast — a fixed-size
    bitmap, not a key set — with the big side scanned once and the real
    join running on the survivors only.

    The bitmap build is an EAGER bounded job at plan-build time (the
    ivf_search_staged probe-assignment pattern: driver receives
    ``n_bits / 8`` bytes, fixed by geometry) — callers timing the
    returned plan should expect the small-side scan to have already
    run.

    Hash family: native ``xxhash64(key, seed_i)`` — the filter is
    INTERNAL pruning, never compared across engines (the oracle checks
    the plain join's result), so the engine-portable-but-expensive
    md5-LE64 family the sketch tiers need is deliberately NOT used here;
    a hot 100 TB probe side hashes at memory speed instead."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            "bloom pruning drops big-side rows, so only joins that do "
            f"not preserve unmatched big rows are sound (got {how!r})"
        )
    if bitmap is None:
        bitmap = build_bloom_bitmap(small, small_key, n_hashes, n_bits)
    else:
        # a caller-staged bitmap built with a DIFFERENT n_hashes than
        # this probe silently drops genuinely-matching big rows (probe
        # seeds the build never set) — the one failure mode a bloom
        # filter must never have. The geometry isn't recoverable from
        # the packed longs, so verify behaviorally: every SMALL-side
        # key is in the set by construction, so a bounded sample that
        # fails the membership test proves a build/probe mismatch
        # (r12 review; n_bits self-heals via len(bitmap) but n_hashes
        # cannot).
        probe = small.select(F.col(small_key).alias("_bk")).filter(
            F.col("_bk").isNotNull()
        ).limit(100)
        # ONE aggregation job computes sampled and passing counts
        # together (r15, VERDICT #6 "collapse multi-action probes" —
        # the old count() + prune().count() pair paid two sequential
        # plan-build-time jobs for one bounded verification)
        row = probe.select(
            F.count(F.lit(1)).alias("_n"),
            F.sum(
                bloom_member(F.col("_bk"), bitmap, n_hashes).cast("int")
            ).alias("_p"),
        ).collect()[0]
        n_probe, n_pass = row["_n"], row["_p"] or 0
        if n_pass != n_probe:
            raise ValueError(
                f"staged bloom bitmap rejects {n_probe - n_pass} of "
                f"{n_probe} sampled small-side keys — it was built with "
                f"a different n_hashes than the probe's ({n_hashes}); "
                "pass the build-time value"
            )
    pruned = bloom_prune(big, big_key, bitmap, n_hashes)
    return pruned.join(small, pruned[big_key] == small[small_key], how)
