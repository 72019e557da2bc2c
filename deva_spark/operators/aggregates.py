"""Aggregations: group-agg, frequencies, percentiles, rollup, exact money sums.

Reference surface: ``frequencies`` (`/root/reference/deva/core/core.py:841-846`),
pipe ``aggregate``/``add``/``average``/``count`` (`pipe.py:969-1007`,
`526-592`), naja group-agg (`deva/naja/tables/ui.py:349`), percentile noise
floor (`deva/naja/market_hotspot/processing/noise_filter.py:249,354`).

Scale notes: every groupBy here is a hash aggregate with map-side partial
combine — the shuffle carries one row per (partition, group), not per input
row. Percentiles offer both exact (small-cardinality keys) and
``percentile_approx`` (sketch-mergeable, the 100 TB path).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Money columns are 2-decimal doubles. Summing 10^8-magnitude doubles across
# an arbitrary partition order drifts in the low bits, which can flip a
# 2-decimal rounding at the .005 boundary. Casting each term to DECIMAL
# first makes the sum exact and order-independent — the distributed-safe way
# to aggregate money.
MONEY = "decimal(30,6)"


def money_sum(expr: Column) -> Column:
    """Order-independent exact sum of a currency expression."""
    return F.sum(expr.cast(MONEY))


def round_money(expr: Column, scale: int = 2) -> Column:
    """Round an exact decimal aggregate and hand back a double."""
    return F.round(expr, scale).cast("double")


def group_agg(
    keys: Sequence[str], aggs: dict[str, Column]
) -> Callable[[DataFrame], DataFrame]:
    """naja group-agg analog: ``groupBy(keys).agg(...)`` with aliased outputs."""

    def _t(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])

    return _t


def frequencies(*keys: str) -> Callable[[DataFrame], DataFrame]:
    """``frequencies`` analog (`core/core.py:841-846`): count per distinct
    value. In streaming mode this is the same plan in update output mode."""

    def _t(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))

    return _t


def rollup_count(*keys: str) -> Callable[[DataFrame], DataFrame]:
    """Grouping-sets rollup (capability gap in the reference; free in Spark)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.rollup(*keys).agg(F.count(F.lit(1)).alias("c"))

    return _t


def percentile_exact(key: str, value: str, p: float) -> Callable[[DataFrame], DataFrame]:
    """Exact continuous percentile per key (noise-filter analog,
    `noise_filter.py:249`). Exact percentile buffers each group's values —
    fine for low-cardinality keys; use :func:`percentile_sketch` when group
    row counts are unbounded."""

    def _t(df: DataFrame) -> DataFrame:
        return df.groupBy(key).agg(
            F.percentile(F.col(value), F.lit(p)).alias("p")
        )

    return _t


def percentile_sketch(key: str, value: str, p: float, accuracy: int = 10000) -> Callable[[DataFrame], DataFrame]:
    """Approximate percentile via the mergeable KLL-style sketch — constant
    memory per group regardless of group size; the 100 TB path."""

    def _t(df: DataFrame) -> DataFrame:
        return df.groupBy(key).agg(
            F.percentile_approx(F.col(value), F.lit(p), F.lit(accuracy)).alias("p")
        )

    return _t


def histogram_fixed_width(
    value: str, n_buckets: int = 10
) -> Callable[[DataFrame], DataFrame]:
    """Equal-width histogram over the column's global [min, max]: bucket
    index + count. The bounds ride the plan as a broadcast 1-row aggregate
    (no driver action); the top bucket is closed (max lands in bucket
    n-1 via least()). The bucket formula is written identically in the SQL
    oracle so IEEE double evaluation orders agree exactly."""

    def _t(df: DataFrame) -> DataFrame:
        v = F.col(value).cast("double")
        # NULL and NaN both corrupt the binning silently: least() skips
        # NULL operands (a NULL lands in the top bucket as if it were
        # the global max), and Spark's max() orders NaN above every
        # double, so ONE NaN row makes _hi=NaN and collapses every
        # bucket expression to floor(NaN) -> bucket 0 (r11 review).
        # +/-Infinity corrupts the same way through the BOUNDS (r12
        # review: _hi=inf makes every finite row (v-lo)/inf*n -> bucket
        # 0 — the whole histogram silently collapses). Histograms are
        # over present FINITE values; bounds come from the same cleaned
        # frame.
        clean = df.filter(
            v.isNotNull()
            & ~F.isnan(v)
            & (v > F.lit(float("-inf")))
            & (v < F.lit(float("inf")))
        )
        bounds = clean.agg(
            F.min(v).alias("_lo"), F.max(v).alias("_hi")
        )
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((v - F.col("_lo")) / (F.col("_hi") - F.col("_lo")) * n_buckets),
        )
        return (
            clean.join(F.broadcast(bounds))
            .withColumn("bucket", F.when(F.col("_lo") == F.col("_hi"), F.lit(0)).otherwise(bucket))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return _t


def pivot_counts(
    group_expr: Column, group_alias: str, pivot_col: str, values: Sequence[str]
) -> Callable[[DataFrame], DataFrame]:
    """Wide counts: one row per group, one column per pivot value (the
    values are DECLARED, not discovered — at scale an unlisted-values
    pivot needs a distinct pass first and can explode the schema).
    Missing combinations count 0, matching SQL conditional aggregation."""

    def _t(df: DataFrame) -> DataFrame:
        out = (
            df.groupBy(group_expr.alias(group_alias))
            .pivot(pivot_col, list(values))
            .agg(F.count(F.lit(1)))
        )
        return out.select(
            group_alias,
            *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(v) for v in values],
        )

    return _t


def md5_le64(col: Column) -> Column:
    """First 8 md5 bytes as an unsigned little-endian 64-bit number in
    DECIMAL(38,0) — the engine-portable uniform hash (DuckDB's
    ``md5_number_upper`` computes the identical value, so sketches built
    on it are hash-checkable cross-engine; see functions.minhash for the
    same recovery trick)."""
    hexcol = F.md5(col.cast("string"))
    rev = F.concat(*[F.substring(hexcol, 1 + 2 * k, 2) for k in range(7, -1, -1)])
    return F.conv(rev, 16, 10).cast("decimal(38,0)")


_TWO64 = 18446744073709551616  # 2^64


def _kmv_est_expr(n_col: str, hk_col: str, k: int) -> Column:
    """The KMV estimator as a column over ``(size, k-th hash)``: exact
    count below k, else ``(k-1) * 2^64 div h_k`` in DECIMAL — ONE copy
    of the arithmetic shared by kmv_distinct / kmv_merge_partials /
    kmv_overlap (r11 review: it was triplicated and could drift)."""
    return F.when(F.col(n_col) < k, F.col(n_col).cast("bigint")).otherwise(
        F.expr(
            f"cast(cast({k - 1} as decimal(38,0))"
            f" * cast({_TWO64} as decimal(38,0)) div {hk_col} as bigint)"
        )
    )


def kmv_distinct(
    value_col: str,
    keys: Sequence[str] = (),
    k: int = 64,
) -> Callable[[DataFrame], DataFrame]:
    """K-minimum-values distinct-count sketch, optionally per group key.

    The classic KMV estimator: hash every value uniformly into [0, 2^64),
    keep the k smallest DISTINCT hashes; if the k-th smallest is h_k, the
    estimate is (k-1) * 2^64 / h_k (exact count when fewer than k distinct
    values exist). All arithmetic is integer (DECIMAL div), so the result
    is bit-identical across engines and partitionings — unlike HLL-based
    ``approx_count_distinct``, whose register layout is engine-private.

    Scale shape: the distinct pass shuffles (keys, 8-byte hash) once with
    map-side combine; the k-smallest selection is a two-phase partial
    merge — each physical partition reduces to its own k smallest via a
    window over ``(keys, partition_id)`` (fully parallel, never a
    single-reducer global window even with ``keys=()``), and the merge
    sorts a bounded array of at most ``partitions x k`` hashes per key.
    The global k smallest of distinct hashes is partition-invariant, so
    the estimate keeps the bit-identical determinism contract. Sketch
    merges are trivial (union then re-take k smallest), which is what
    makes KMV the mergeable-sketch choice for hierarchical rollups at
    100 TB.
    """
    def _t(df: DataFrame) -> DataFrame:
        # one-shot sketch == this batch's synopsis + the estimator tail
        # (r11 review: the synopsis body was a verbatim copy of
        # kmv_partials and the tail a copy of kmv_merge_partials's)
        key_cols = list(keys)
        merged = kmv_partials(value_col, keys, k)(df)
        agg = merged.select(
            *key_cols,
            F.size("_hs").alias("_n"),
            # try_: fewer than k distinct hashes leaves _hk NULL (unused
            # in that branch) instead of an ANSI out-of-bounds error
            F.try_element_at("_hs", F.lit(k)).alias("_hk"),
        )
        return agg.select(
            *key_cols, _kmv_est_expr("_n", "_hk", k).alias("est_distinct")
        )

    return _t


def stats_partials(
    value_col: str, keys: Sequence[str] = ()
) -> Callable[[DataFrame], DataFrame]:
    """Per-batch ALGEBRAIC statistics partial: one row per group with
    ``(cnt, s, s2, mn, mx)`` — count, sum, sum of squares (DECIMAL(38,0),
    exact at any corpus size), min, max over an integer measure.

    This is the stats/monitoring tier of the incremental-corpus ring
    (the band_keys / chunk_keys / digests contract, applied to
    aggregates instead of indexes): a batch's partial row is a pure
    aggregate of the batch, so it APPENDS to a staged partials table and
    :func:`merge_stat_partials` folds any set of batches into exact
    full-corpus statistics — count/sum/min/max/mean/variance — without
    ever rescanning old batches. All partial fields are integers
    (classic algebraic decomposition: sums add, extrema max), so the
    merge is bit-identical regardless of batch split or partitioning —
    unlike Welford/Chan double-precision M2 merging, whose low bits
    depend on merge order. At 100 TB the partials table is one row per
    (batch, group): metadata-sized forever.
    """

    def _t(df: DataFrame) -> DataFrame:
        v = F.col(value_col).cast("long")
        # widen BEFORE multiplying/summing: v*v in bigint overflows at
        # |v| > ~3.04e9 (ANSI: job-killing ARITHMETIC_OVERFLOW; legacy:
        # silent wrap) despite the exactness contract (r11 review). A
        # long fits decimal(19,0); (19,0)x(19,0) -> (38,0) holds any
        # long squared (max ~8.5e37 < 1e38).
        vd = v.cast("decimal(19,0)")
        return df.groupBy(*keys).agg(
            F.count(v).alias("cnt"),
            F.sum(vd).cast("decimal(38,0)").alias("s"),
            F.sum((vd * vd).cast("decimal(38,0)")).alias("s2"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
        )

    return _t


def merge_stat_partials(
    keys: Sequence[str] = (),
) -> Callable[[DataFrame], DataFrame]:
    """Fold a :func:`stats_partials` table (any number of batch rows per
    group) into finalized full-corpus statistics: ``cnt, s, mn, mx,
    mean, var`` (sample variance).

    The numerator ``cnt*s2 - s^2`` is computed in DECIMAL — exact
    integer algebra — and only the final division runs in double, so
    the result is deterministic across engines and batch splits (one
    IEEE division of exactly-known integers, then HALF_UP 4dp). Groups
    with ``cnt <= 1`` get NULL variance rather than a division error.

    Exactness envelope (r11 review): DECIMAL caps at 38 digits, so the
    numerator products need ``cnt * s2 < 10^38`` and ``s^2 < 10^38`` —
    i.e. ``|s| < 10^19`` per group (e.g. 10^10 rows of 10^9-magnitude
    values). Beyond that the product overflows LOUDLY under ANSI mode
    (the session default here) rather than returning a drifted double;
    re-scale the measure (cents → dollars) if a group can exceed it.
    """

    def _t(partials: DataFrame) -> DataFrame:
        g = partials.groupBy(*keys).agg(
            F.sum("cnt").alias("cnt"),
            F.sum("s").cast("decimal(38,0)").alias("s"),
            F.sum("s2").cast("decimal(38,0)").alias("s2"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            # any negative-count partial marks a retraction
            # (retract_stat_partials): extrema are NOT invertible, so the
            # merged mn/mx of a retraction-touched group are conservatively
            # NULLed below — they may still reflect a retracted row. The
            # linear moments stay exact.
            F.max((F.col("cnt") < 0).cast("int")).alias("_retr"),
        )
        num = (
            F.col("cnt").cast("decimal(38,0)") * F.col("s2")
            - F.col("s") * F.col("s")
        )
        den = F.col("cnt").cast("double") * (F.col("cnt") - 1).cast("double")
        return (
            # a fully-retracted group (cnt folds to 0) leaves the corpus
            g.filter(F.col("cnt") > 0)
            .select(
                *keys,
                "cnt",
                F.col("s").cast("bigint").alias("s"),
                F.when(F.col("_retr") == 0, F.col("mn")).alias("mn"),
                F.when(F.col("_retr") == 0, F.col("mx")).alias("mx"),
                F.round(F.col("s").cast("double") / F.col("cnt"), 4).alias("mean"),
                F.when(
                    F.col("cnt") > 1, F.round(num.cast("double") / den, 4)
                ).alias("var"),
            )
        )

    return _t


def retract_stat_partials(
    value_col: str, keys: Sequence[str] = ()
) -> Callable[[DataFrame], DataFrame]:
    """NEGATIVE :func:`stats_partials` over the rows being forgotten —
    the deletion side of the stats/monitoring tier (the
    `dedup.retract_rows` contract applied to aggregates): because the
    linear moments are exact integer algebra, appending one negated
    partial row per group makes :func:`merge_stat_partials` yield
    bit-identical count/sum/mean/variance to a full recompute over the
    surviving corpus — no batch ever rescans (parity-tested).

    Honesty about extrema: min/max are NOT invertible aggregates — a
    retracted row may have BEEN the extremum and no synopsis can recover
    the runner-up. Retraction partials therefore carry NULL ``mn``/``mx``
    and the merge conservatively NULLs the extrema of every
    retraction-touched group (recompute them with a one-off scan of the
    affected groups if needed). Same honesty boundary as the KMV tier,
    which is documented as append-only: a k-smallest-hash synopsis
    cannot forget a member either.
    """
    base = stats_partials(value_col, keys)

    def _t(df: DataFrame) -> DataFrame:
        p = base(df)
        return p.select(
            *keys,
            (-F.col("cnt")).alias("cnt"),
            (-F.col("s")).cast("decimal(38,0)").alias("s"),
            (-F.col("s2")).cast("decimal(38,0)").alias("s2"),
            F.lit(None).cast("long").alias("mn"),
            F.lit(None).cast("long").alias("mx"),
        )

    return _t


def kmv_partials(
    value_col: str,
    keys: Sequence[str] = (),
    k: int = 64,
) -> Callable[[DataFrame], DataFrame]:
    """Per-batch KMV SYNOPSIS: one row per group carrying the batch's k
    smallest distinct md5-LE64 hashes as a sorted array — the mergeable
    form of :func:`kmv_distinct` and the distinct-count tier of the
    incremental-corpus ring. Every one of the corpus-wide k smallest
    hashes is necessarily within its own batch's k smallest, so a union
    of batch synopses loses nothing: :func:`kmv_merge_partials` re-takes
    the k smallest over the union and lands on the IDENTICAL estimate
    the one-shot sketch computes over the whole corpus (bit-identical —
    integer arithmetic end to end). Batch rows append; ~k * 16 bytes per
    (batch, group) of state at any corpus size.
    """
    from pyspark.sql import Window

    def _t(df: DataFrame) -> DataFrame:
        key_cols = list(keys)
        # NULL-skipping, same as kmv_distinct (COUNT DISTINCT semantics).
        # Filter on the RAW column, not the hash: md5_le64(v) is NULL iff
        # v is NULL, but `isnotnull(md5_le64(v))` re-evaluates the whole
        # 8-substring md5/conv tree inside the Filter operator (a second
        # full hash pass per row) and can never reach the parquet scan —
        # `v IS NOT NULL` is equivalent, costs nothing, and lands in
        # PushedFilters (guide §6).
        d = (
            df.filter(F.col(value_col).isNotNull())
            .select(*key_cols, md5_le64(F.col(value_col)).alias("_h"))
            .distinct()
        )
        pw = Window.partitionBy(*key_cols, "_p").orderBy("_h")
        part = (
            d.withColumn("_p", F.spark_partition_id())
            .withColumn("_rn", F.row_number().over(pw))
            .filter(F.col("_rn") <= k)
        )
        return part.groupBy(*key_cols).agg(
            F.slice(F.sort_array(F.collect_list("_h")), 1, k).alias("_hs")
        )

    return _t


def _kmv_union_synopsis(
    partials: DataFrame, key_cols: Sequence[str], k: int
) -> DataFrame:
    """Union-merge of :func:`kmv_partials` rows: explode the batch
    synopses, distinct, and re-take the k smallest per group — THE
    merge body, shared by :func:`kmv_merge_partials` and
    :func:`kmv_overlap` (r12 review: the copy in kmv_overlap could
    drift from a fix applied here, the same triplication hazard the r11
    ``_kmv_est_expr`` dedup closed for the estimator tail)."""
    return (
        partials.select(*key_cols, F.explode("_hs").alias("_h"))
        .distinct()
        .groupBy(*key_cols)
        .agg(F.slice(F.sort_array(F.collect_list("_h")), 1, k).alias("_hs"))
    )


def kmv_merge_partials(
    keys: Sequence[str] = (),
    k: int = 64,
) -> Callable[[DataFrame], DataFrame]:
    """Merge a :func:`kmv_partials` synopsis table into per-group
    distinct-count estimates — the same estimator tail as
    :func:`kmv_distinct` (exact below k; ``(k-1) * 2^64 div h_k``
    above), over the union of the batch synopses. The flatten/distinct/
    re-take-k runs per group on bounded arrays (<= batches * k hashes),
    so the merge is a metadata-sized aggregate however large the corpus
    that produced the synopses was.
    """
    def _t(partials: DataFrame) -> DataFrame:
        key_cols = list(keys)
        merged = _kmv_union_synopsis(partials, key_cols, k)
        agg_df = merged.select(
            *key_cols,
            F.size("_hs").alias("_n"),
            F.try_element_at("_hs", F.lit(k)).alias("_hk"),
        )
        return agg_df.select(
            *key_cols, _kmv_est_expr("_n", "_hk", k).alias("est_distinct")
        )

    return _t


def batch_drift(
    hist_partials: DataFrame,
    batch_partials: DataFrame,
    keys: Sequence[str] = (),
    z_threshold: float = 3.0,
) -> DataFrame:
    """Arrival-batch QUALITY GATE over the stats tier — the operational
    consumer of :func:`stats_partials`: before a batch's partial row is
    appended to the staged table, score its per-group mean against the
    merged HISTORY (all prior batch partials) with a z-statistic
    ``z = (batch_mean - hist_mean) / sqrt(hist_var / batch_cnt)`` and
    flag groups that drifted (|z| >= z_threshold) or appeared from
    nowhere (no history). A shifted scraper, a broken decoder, or a
    language-mix inversion shows up here BEFORE the batch pollutes the
    corpus — the batch-granular complement of the row-granular
    streaming ADWIN detector.

    Both inputs are partials tables (any number of rows per group on
    either side — the merge is fold-order-free), so the gate costs two
    metadata-sized aggregates however large the corpus the history
    summarizes. Deterministic: means/variances come from the exact
    integer algebra of :func:`merge_stat_partials` (4dp), and the final
    score is one IEEE divide + sqrt, rounded to 4dp.

    Output: ``keys, hist_cnt, hist_mean, batch_cnt, batch_mean, z,
    drifted`` — one row per group present in the batch.
    """
    key_cols = list(keys)
    h = merge_stat_partials(keys)(hist_partials).select(
        *key_cols,
        F.col("cnt").alias("hist_cnt"),
        F.col("mean").alias("hist_mean"),
        F.col("var").alias("hist_var"),
    )
    b = merge_stat_partials(keys)(batch_partials).select(
        *key_cols,
        F.col("cnt").alias("batch_cnt"),
        F.col("mean").alias("batch_mean"),
    )
    z = F.round(
        (F.col("batch_mean") - F.col("hist_mean"))
        / F.sqrt(F.col("hist_var") / F.col("batch_cnt")),
        4,
    )
    # an empty key list means one global group: PySpark's list-form join
    # rejects [] (r11 review), and a crossJoin would LOSE the batch row
    # when no history exists — a literal-true left join keeps it.
    # NULL-SAFE key equality (r12 review): a group whose key is NULL is
    # real on both sides, but plain equality never matches it — the
    # group would read "appeared from nowhere" and alarm on every batch
    # forever despite abundant history.
    if key_cols:
        h2 = h.select(
            *[F.col(k).alias(f"_h_{k}") for k in key_cols],
            "hist_cnt", "hist_mean", "hist_var",
        )
        cond = F.lit(True)
        for k in key_cols:
            cond = cond & F.col(k).eqNullSafe(F.col(f"_h_{k}"))
        joined = b.join(h2, cond, "left").drop(
            *[f"_h_{k}" for k in key_cols]
        )
    else:
        joined = b.join(h, F.lit(True), "left")
    return joined.select(
        *key_cols,
        "hist_cnt",
        "hist_mean",
        "batch_cnt",
        "batch_mean",
        F.when(F.col("hist_var") > 0, z).alias("z"),
        # three regimes (ADVICE r8 #5): no history at all -> drifted
        # (appeared from nowhere); positive history variance -> the z
        # gate; zero/undefined history variance (hist_cnt==1 or a
        # constant-valued metric) -> drifted only when the batch mean
        # actually MOVED — a constant group matching its constant must
        # not alarm on every batch forever
        F.when(F.col("hist_cnt").isNull(), F.lit(True))
        .when(F.col("hist_var") > 0, F.abs(z) >= F.lit(z_threshold))
        .otherwise(F.col("batch_mean") != F.col("hist_mean"))
        .alias("drifted"),
    )

def quantile_partials(
    value_col: str, keys: Sequence[str] = (), width: float = 25.0
) -> Callable[[DataFrame], DataFrame]:
    """Per-batch binned quantile SYNOPSIS: one row per (group, bin) with
    ``bin = floor(value / width)`` and a count — the quantile tier of the
    incremental-corpus ring (the ``stats_partials`` / ``kmv_partials``
    contract applied to order statistics).

    A batch's bin counts are a pure aggregate of the batch, so rows
    APPEND to a staged partials table and :func:`merge_quantile_partials`
    folds any set of batches into corpus-wide quantile estimates with
    bounded error (the true percentile lies inside the chosen bin, so
    the lower-edge estimate is within one ``width`` of exact). Counts
    are integers and sums are fold-order-free, so the merge is
    BIT-IDENTICAL under any batch split or partitioning — the property
    double-based sketches (t-digest, GK) cannot offer, which is what
    makes this the hash-checkable mergeable-quantile choice. Counts are
    also INVERTIBLE, so the tier supports retraction exactly
    (:func:`retract_quantile_partials`) — unlike KMV, which is
    append-only. At 100 TB the partials table holds one row per
    (batch, group, occupied bin): metadata-sized forever.

    The bin formula ``floor(value / width)`` is written identically in
    SQL oracles; one IEEE divide on the raw value keeps both engines
    bit-aligned (the ``histogram_fixed_width`` precedent).
    """

    def _t(df: DataFrame) -> DataFrame:
        v = F.col(value_col).cast("double")
        # clamp the VALUE to the int-bin range before any floor (r12
        # review): a value beyond ~2^31 * width made floor()'s internal
        # double->long conversion (and the int cast) raise under ANSI —
        # a job kill. Clamped, extreme values land in the edge bins (a
        # bounded-error saturation the percentile resolution tolerates,
        # and such values are data-quality escapes anyway); +/-inf is
        # filtered with NULL/NaN — not a real measurement.
        imax, imin = (1 << 31) - 1, -(1 << 31)
        vc = F.least(
            F.lit(float(imax) * float(width)),
            F.greatest(F.lit(float(imin) * float(width)), v),
        )
        b = F.least(
            F.lit(imax).cast("bigint"),
            F.greatest(
                F.lit(imin).cast("bigint"),
                F.floor(vc / F.lit(float(width))),
            ),
        )
        # NULL values would bin to a NULL partial row that inflates n
        # and NULLs any percentile resolving into it, and floor(NaN)
        # casts to a NULL bin the same way (r11 review); order
        # statistics are over present finite values, like F.count(col)
        return (
            df.filter(
                v.isNotNull()
                & ~F.isnan(v)
                & (v > F.lit(float("-inf")))
                & (v < F.lit(float("inf")))
            )
            .groupBy(*keys, b.cast("int").alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return _t


def retract_quantile_partials(
    value_col: str, keys: Sequence[str] = (), width: float = 25.0
) -> Callable[[DataFrame], DataFrame]:
    """NEGATIVE :func:`quantile_partials` over rows being forgotten — the
    governance-ring side of the quantile tier (the
    ``retract_stat_partials`` contract): bin counts are plain integers,
    so appending one negated row per (group, bin) makes
    :func:`merge_quantile_partials` yield estimates bit-identical to a
    full recompute over the surviving corpus. No honesty caveat needed
    here — unlike extrema, EVERY order statistic of the survivors is
    recoverable from the surviving bin counts (parity-tested)."""
    base = quantile_partials(value_col, keys, width)

    def _t(df: DataFrame) -> DataFrame:
        return base(df).select(*keys, "bin", (-F.col("cnt")).alias("cnt"))

    return _t


def merge_quantile_partials(
    keys: Sequence[str] = (),
    width: float = 25.0,
    pcts: Sequence[int] = (50, 90, 99),
) -> Callable[[DataFrame], DataFrame]:
    """Fold a :func:`quantile_partials` table into per-group quantile
    estimates: ``keys, n, p<pct>...`` where ``p<pct>`` is the LOWER EDGE
    (``bin * width``) of the first bin whose running count reaches the
    rank ``ceil(pct * n / 100)`` — the deterministic integer form of the
    classic lower-boundary binned percentile (``cum >= ceil(p*n/100)``
    iff ``100*cum >= p*n`` for integer cum, so no division ever runs).

    Plan shape: one hash-aggregate folds batch rows per (group, bin),
    then per group the bounded bin array (<= value_range / width
    entries — synopsis-sized by construction, independent of corpus
    size) sorts in-array and a single ``F.aggregate`` scan reads off
    every requested percentile. No window function, no second shuffle
    beyond the group fold, nothing driver-side."""
    pct_list = [int(p) for p in pcts]

    def _t(partials: DataFrame) -> DataFrame:
        key_cols = list(keys)
        g = (
            partials.groupBy(*key_cols, "bin")
            .agg(F.sum("cnt").alias("cnt"))
            # a fully-retracted bin vanishes, matching a direct recompute
            .filter(F.col("cnt") > 0)
        )
        arr = g.groupBy(*key_cols).agg(
            F.sort_array(F.collect_list(F.struct("bin", "cnt"))).alias("_bins")
        )
        n = F.aggregate(
            "_bins", F.lit(0).cast("bigint"), lambda a, x: a + x["cnt"]
        )
        out = arr.withColumn("n", n)
        def _step(p):
            def merge(acc, x):
                return F.struct(
                    (acc["cum"] + x["cnt"]).alias("cum"),
                    F.coalesce(
                        acc["b"],
                        F.when(
                            (acc["cum"] + x["cnt"]) * 100
                            >= F.lit(p) * F.col("n"),
                            x["bin"],
                        ),
                    ).alias("b"),
                )

            return merge

        est_cols = []
        for p in pct_list:
            acc0 = F.struct(
                F.lit(0).cast("bigint").alias("cum"),
                F.lit(None).cast("int").alias("b"),
            )
            found = F.aggregate("_bins", acc0, _step(p))["b"]
            est_cols.append(
                (found.cast("double") * F.lit(float(width))).alias(f"p{p}")
            )
        return out.filter(F.col("n") > 0).select(*key_cols, "n", *est_cols)

    return _t

def cms_partials(
    key_col: str,
    depth: int = 4,
    width: int = 512,
    keys: Sequence[str] = (),
) -> Callable[[DataFrame], DataFrame]:
    """Per-batch COUNT-MIN SKETCH partial (Cormode & Muthukrishnan 2005):
    every row hashes its key through ``depth`` independent md5-LE64
    hash rows into ``width`` buckets each, and the batch reduces to one
    count per occupied (row, bucket) cell — at most ``depth * width``
    rows per batch, however large the batch. The frequency tier of the
    incremental-corpus ring: cell counts are plain integers, so batch
    partials APPEND to a staged table, :func:`cms_merge_partials` folds
    cells by addition (bit-identical under any split), and retraction is
    exact via negated partials (:func:`cms_retract_partials`).

    The hash family is the engine-portable md5-LE64 (DuckDB's
    ``md5_number_upper`` computes the identical value) with the row
    index salted into the input, so sketch CELLS — not just estimates —
    hash-check cross-engine. Point estimates come from
    :func:`cms_point_estimates`: ``min`` over the key's ``depth`` cells,
    an overestimate bounded by ``eps * N`` with
    ``eps = e / width`` at confidence ``1 - e^-depth``.

    ``keys`` names grouping columns carried through the partial (a batch
    or day id): the output holds one independent sketch per key group —
    the per-day sketch table is one pass over the corpus instead of one
    pass per day, and :func:`cms_merge_partials` collapses the key
    column by construction (it groups on the cells alone)."""

    def _t(df: DataFrame) -> DataFrame:
        key_cols = list(keys)
        k = F.col(key_col).cast("string")
        # hash in a PROJECT first, explode cheap ints after: inside a
        # Generate(explode(array(...))) Catalyst does no subexpression
        # elimination, so inlining md5_le64 there evaluated md5() 8x per
        # substring x depth rows = 32 digests per input row (measured
        # ~5.5 s over sf0.1 orders); projected columns CSE to one md5
        # per depth row
        def _bucket(i: int) -> Column:
            if width & (width - 1) == 0 and width <= (1 << 31):
                # power-of-two width: le64 % 2^w depends only on the LOW
                # 32 bits, which in the little-endian recovery are the
                # FIRST four md5 bytes — one 8-hex-char conv to BIGINT
                # instead of the 16-char conv + DECIMAL(38,0) modulo
                # (measured 1.6x cheaper; bit-identical buckets, and the
                # oracle's HUGEINT % width agrees because 2^32 % width
                # == 0)
                hexcol = F.md5(F.concat(k, F.lit(f"#cms{i}")).cast("string"))
                lo32 = F.conv(
                    F.concat(
                        *[
                            F.substring(hexcol, 1 + 2 * b, 2)
                            for b in range(3, -1, -1)
                        ]
                    ),
                    16,
                    10,
                ).cast("bigint")
                return (lo32 % width).cast("int")
            return (md5_le64(F.concat(k, F.lit(f"#cms{i}"))) % width).cast(
                "int"
            )

        hashed = df.select(
            *key_cols, *[_bucket(i).alias(f"_b{i}") for i in range(depth)]
        )
        cells = F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"), F.col(f"_b{i}").alias("bucket")
                )
                for i in range(depth)
            ]
        )
        return (
            hashed.select(*key_cols, F.explode(cells).alias("e"))
            .groupBy(
                *key_cols,
                F.col("e.i").alias("i"),
                F.col("e.bucket").alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return _t


def cms_retract_partials(
    key_col: str,
    depth: int = 4,
    width: int = 512,
    keys: Sequence[str] = (),
) -> Callable[[DataFrame], DataFrame]:
    """NEGATIVE :func:`cms_partials` over rows being forgotten — cell
    counts are invertible integers, so one negated partial makes the
    merged sketch bit-identical to one built over the survivors.
    ``keys`` mirrors :func:`cms_partials`: negated rows carry the same
    group columns, so a keyed partials table (the staged
    ``cms_day_cells``) retracts per group by plain append."""
    base = cms_partials(key_col, depth, width, keys)

    def _t(df: DataFrame) -> DataFrame:
        return base(df).select(
            *keys, "i", "bucket", (-F.col("cnt")).alias("cnt")
        )

    return _t


def cms_merge_partials() -> Callable[[DataFrame], DataFrame]:
    """Fold any set of :func:`cms_partials` batch rows into one merged
    sketch: element-wise integer addition per (row, bucket) cell — the
    linearity that makes CMS the mergeable/retractable frequency
    synopsis. Bounded output (<= depth * width cells)."""

    def _t(partials: DataFrame) -> DataFrame:
        return (
            partials.groupBy("i", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") != 0)
        )

    return _t


def cms_point_estimates(
    counters: DataFrame,
    query_keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-frequency estimates from a merged CMS: for each key in
    ``query_keys`` (one row per key — a bounded dimension, broadcast),
    read the key's ``depth`` cells and take the min:
    ``est >= true count`` always, with the eps*N overestimate bound.

    Plan shape: the query side explodes to ``|keys| * depth`` cell
    probes, broadcast-joins the (<= depth * width)-row counter table,
    and one bounded aggregate takes the min — no shuffle of anything
    data-proportional; the corpus was already reduced to cells."""
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (md5_le64(F.concat(k, F.lit(f"#cms{i}"))) % width)
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probes = query_keys.select(
        key_col, F.explode(cells).alias("e")
    ).select(key_col, F.col("e.i").alias("i"), F.col("e.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(counters), ["i", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )

def kmv_overlap(key: str, k: int = 64) -> Callable[[DataFrame], DataFrame]:
    """Pairwise distinct-set OVERLAP estimates from KMV synopses — set
    ALGEBRA on the distinct-count tier (the theta-sketch intersection
    rule, Dasgupta et al. 2016, re-expressed on KMV): for groups A and B,
    take the union synopsis U = k smallest of A ∪ B (θ = its k-th
    smallest hash) and count c = |{h ∈ U : h ∈ A's synopsis AND h ∈ B's
    synopsis}|. Soundness: A ⊆ A∪B means θ_A >= θ_U, so every
    union-synopsis hash that belongs to A is necessarily within A's own
    k smallest — membership tests against the synopses are exact.
    Estimates: ``est_union`` by the usual KMV estimator and
    ``est_inter = c * est_union div k`` (both EXACT when |A∪B| < k,
    because then all three synopses are complete). Integer arithmetic
    end to end except the final 4dp Jaccard division, so results are
    bit-identical across engines and batch splits.

    Input: a :func:`kmv_partials` table keyed by ``key`` (any number of
    batch rows per group — synopses merge losslessly first). Output one
    row per unordered group pair: ``<key>_a, <key>_b, est_union,
    est_inter, jaccard``. The pair join carries only k-hash arrays per
    group — synopsis-sized, never data-sized — which is the point:
    cross-source overlap over a 100 TB corpus from metadata-sized
    sketches, no re-scan."""

    def _t(partials: DataFrame) -> DataFrame:
        merged = _kmv_union_synopsis(partials, [key], k)
        a = merged.select(
            F.col(key).alias(f"{key}_a"), F.col("_hs").alias("_ha")
        )
        b = merged.select(
            F.col(key).alias(f"{key}_b"), F.col("_hs").alias("_hb")
        )
        pairs = a.join(
            F.broadcast(b), F.col(f"{key}_a") < F.col(f"{key}_b"), "inner"
        )
        u = pairs.withColumn(
            "_u",
            F.slice(F.sort_array(F.array_union("_ha", "_hb")), 1, k),
        )
        m = u.select(
            f"{key}_a",
            f"{key}_b",
            F.size("_u").alias("_nu"),
            F.try_element_at("_u", F.lit(k)).alias("_hk"),
            F.size(
                F.array_intersect(F.array_intersect("_u", "_ha"), "_hb")
            ).alias("_c"),
        )
        e = m.withColumn(
            "est_union",
            _kmv_est_expr("_nu", "_hk", k),
        )
        est_i = F.when(F.col("_nu") < k, F.col("_c").cast("bigint")).otherwise(
            F.expr(
                "cast(cast(_c as decimal(38,0))"
                f" * cast(est_union as decimal(38,0)) div {k} as bigint)"
            )
        )
        return e.withColumn("est_inter", est_i).select(
            f"{key}_a",
            f"{key}_b",
            "est_union",
            "est_inter",
            F.round(
                F.col("est_inter").cast("double")
                / F.col("est_union").cast("double"),
                4,
            ).alias("jaccard"),
        )

    return _t


def histogram_partials(
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
    keys: Sequence[str] = (),
) -> Callable[[DataFrame], DataFrame]:
    """Per-batch fixed-GRID histogram partial — the distribution-shape
    member of the mergeable-synopsis family (x84 moments, x85 distinct,
    x93 quantiles, x94 frequencies): each arrival batch reduces to
    ``<= n_buckets`` integer bucket-count rows per group, mergeable by
    addition and exactly retractable by negation. Unlike
    :func:`histogram_fixed_width` (one-shot, data-derived bounds), the
    grid here is EXPLICIT ``[lo, hi]`` so every batch buckets against
    the same edges whatever it contains (the z-order bounds-reuse
    contract); out-of-range values clip to the edge buckets. Bucket
    arithmetic is integer-exact given the fixed grid, so merged
    histograms are bit-identical under any batch split."""
    if not (hi > lo and n_buckets >= 1):
        raise ValueError("require hi > lo and n_buckets >= 1")
    width = (float(hi) - float(lo)) / n_buckets

    def _t(df: DataFrame) -> DataFrame:
        key_cols = list(keys)
        v = F.col(value_col).cast("double")
        # clamp the VALUE into [lo, hi] before any floor (r12 review):
        # a huge outlier (or +/-inf) made floor()'s internal
        # double->long conversion raise ARITHMETIC_OVERFLOW under ANSI
        # (non-ANSI wrapped negative and filed the HIGH outlier in
        # bucket 0). Clamped, the grid arithmetic is bounded by
        # construction and out-of-range values land on their edge
        # buckets — the docstring's declared clip semantics.
        vc = F.least(
            F.lit(float(hi)), F.greatest(F.lit(float(lo)), v)
        )
        bucket = F.least(
            F.lit(n_buckets - 1).cast("bigint"),
            F.floor((vc - F.lit(float(lo))) / F.lit(width)),
        ).cast("int")
        return (
            # greatest() SKIPS null operands — a NULL value would count
            # as bucket 0, faking mass at the low edge and corrupting
            # psi_drift; NaN likewise falls through the clip arithmetic
            # (r11 review)
            df.filter(v.isNotNull() & ~F.isnan(v))
            .select(*key_cols, bucket.alias("bucket"))
            .groupBy(*key_cols, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return _t


def merge_histogram_partials(
    keys: Sequence[str] = (),
) -> Callable[[DataFrame], DataFrame]:
    """Fold histogram partial rows by integer addition per (group,
    bucket) — bounded output, bit-identical under any split."""

    def _t(partials: DataFrame) -> DataFrame:
        return (
            partials.groupBy(*keys, "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") != 0)
        )

    return _t


def psi_drift(
    batch_hist: DataFrame,
    history_hist: DataFrame,
    keys: Sequence[str] = (),
    n_buckets: int = 20,
) -> DataFrame:
    """Population Stability Index between an arrival batch's histogram
    and the merged history's, per group — the DISTRIBUTION-shape drift
    gate complementing x87's mean-shift z (a variance-preserving shape
    change moves PSI but not the mean). Standard add-half smoothing
    (``p = (cnt + 0.5) / (tot + n_buckets/2)``) keeps empty buckets
    finite; buckets absent from BOTH sides contribute exactly 0, so the
    sparse bucket-row representation is lossless. Everything here is
    synopsis-sized: two bounded aggregates and one bucket-row join.
    Output: ``keys..., psi`` (4dp), with the conventional reading
    psi < 0.1 stable / 0.1-0.25 moderate / > 0.25 drifted."""
    key_cols = list(keys)

    def _tot(df: DataFrame, name: str) -> DataFrame:
        if key_cols:
            return df.groupBy(*key_cols).agg(F.sum("cnt").alias(name))
        return df.agg(F.sum("cnt").alias(name))

    # NULL-SAFE key alignment end to end (r12 review): plain equality
    # never matches a NULL group key, so the full_outer left the NULL
    # group's batch and history rows UNALIGNED (each seeing the other
    # side as 0) and the totals joins missed — a garbage-large PSI and
    # a permanent false drift alarm for that group.
    b = batch_hist.select(*key_cols, "bucket", F.col("cnt").alias("_cb"))
    h = history_hist.select(
        *[F.col(k).alias(f"_hk_{k}") for k in key_cols],
        F.col("bucket").alias("_hb"),
        F.col("cnt").alias("_ch"),
    )
    cond = F.col("bucket").eqNullSafe(F.col("_hb"))
    for k in key_cols:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_hk_{k}"))
    joined = b.join(h, cond, "full_outer").select(
        *[
            F.coalesce(F.col(k), F.col(f"_hk_{k}")).alias(k)
            for k in key_cols
        ],
        F.coalesce("bucket", "_hb").alias("bucket"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
        F.coalesce("_ch", F.lit(0)).alias("_ch"),
    )
    tb = _tot(batch_hist.select(*key_cols, "cnt"), "_tb")
    th = _tot(history_hist.select(*key_cols, "cnt"), "_th")
    if key_cols:
        tb2 = tb.select(
            *[F.col(k).alias(f"_tbk_{k}") for k in key_cols], "_tb"
        )
        th2 = th.select(
            *[F.col(k).alias(f"_thk_{k}") for k in key_cols], "_th"
        )
        cb = F.lit(True)
        ch = F.lit(True)
        for k in key_cols:
            cb = cb & F.col(k).eqNullSafe(F.col(f"_tbk_{k}"))
            ch = ch & F.col(k).eqNullSafe(F.col(f"_thk_{k}"))
        joined = (
            joined.join(F.broadcast(tb2), cb, "left")
            .join(F.broadcast(th2), ch, "left")
            .drop(
                *[f"_tbk_{k}" for k in key_cols],
                *[f"_thk_{k}" for k in key_cols],
            )
        )
    else:
        joined = joined.crossJoin(F.broadcast(tb)).crossJoin(F.broadcast(th))
    half = n_buckets / 2.0
    p = (F.col("_cb") + 0.5) / (F.coalesce(F.col("_tb"), F.lit(0)) + half)
    q = (F.col("_ch") + 0.5) / (F.coalesce(F.col("_th"), F.lit(0)) + half)
    term = (p - q) * F.log(p / q)
    agg_cols = [F.round(F.sum(term), 4).alias("psi")]
    if key_cols:
        return joined.groupBy(*key_cols).agg(*agg_cols)
    return joined.agg(*agg_cols)


def _day_banded(
    partials: DataFrame, day_col: str, window_days: int
) -> DataFrame:
    """Range-band a daily synopsis table against its own distinct days:
    each output row pairs a partial with every ``_day_out`` whose
    trailing ``[day - window_days + 1, day]`` window contains it — THE
    shared construction of the three sliding rollups (r12 review: three
    inline copies meant a window-boundary fix could reach two and
    silently leave the third disagreeing on membership)."""
    days = partials.select(F.col(day_col).alias("_day_out")).distinct()
    return partials.join(
        F.broadcast(days),
        (F.col(day_col) <= F.col("_day_out"))
        & (F.col(day_col) > F.date_sub(F.col("_day_out"), window_days)),
        "inner",
    )


def kmv_sliding_distinct(
    day_col: str,
    window_days: int,
    keys: Sequence[str] = (),
    k: int = 64,
) -> Callable[[DataFrame], DataFrame]:
    """TRAILING-window distinct counts from a daily :func:`kmv_partials`
    synopsis table — the rollup nobody can afford to recompute raw at
    100 TB (distinct users over the trailing 7 days, every day): for
    each day present, merge the synopses of ``[day - window_days + 1,
    day]`` and estimate. Union-merge is KMV's native operation, so the
    trailing estimate is BIT-IDENTICAL to a one-shot sketch over the
    window's raw rows (the x85 argument per window position).

    Shape: one range-band self-join of the SYNOPSIS table against its
    own distinct days (days x window_days x k hash rows — synopsis-
    sized), then the standard merge tail. Output: ``keys..., <day_col>,
    est_distinct`` with one row per (group, day-in-table)."""

    def _t(partials: DataFrame) -> DataFrame:
        key_cols = list(keys)
        banded = _day_banded(partials, day_col, window_days)
        merged = kmv_merge_partials(keys=key_cols + ["_day_out"], k=k)(
            banded
        )
        return merged.withColumnRenamed("_day_out", day_col)

    return _t


def cms_sliding_merge(
    day_col: str,
    window_days: int,
) -> Callable[[DataFrame], DataFrame]:
    """TRAILING-window sketch per day from a daily :func:`cms_partials`
    table — the frequency twin of :func:`kmv_sliding_distinct` (trailing
    7-day heavy hitters, every day, without re-scanning a single raw
    row): for each day present, sum the cell rows of ``[day -
    window_days + 1, day]``. Cell addition is CMS's native merge, so
    each window's sketch is bit-identical to one built over the window's
    raw rows. One range-band self-join of cell rows against the distinct
    days (days x window x depth x width rows — synopsis-sized). Output:
    ``<day_col>, i, bucket, cnt`` — feed a day's slice to
    :func:`cms_point_estimates` (or join days to probe all at once)."""

    def _t(partials: DataFrame) -> DataFrame:
        banded = _day_banded(partials, day_col, window_days)
        return (
            banded.groupBy(F.col("_day_out").alias(day_col), "i", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") != 0)
        )

    return _t


def quantile_sliding_merge(
    day_col: str,
    window_days: int,
    keys: Sequence[str] = (),
    width: float = 25.0,
    pcts: Sequence[int] = (50, 90, 99),
) -> Callable[[DataFrame], DataFrame]:
    """TRAILING-window quantiles per day from a daily
    :func:`quantile_partials` table — the third member of the sliding
    rollup family (:func:`kmv_sliding_distinct`,
    :func:`cms_sliding_merge`): latency p99 over the trailing N days,
    every day, from synopsis rows alone. Same range-band self-join
    against the distinct days, then the standard bin merge per
    (keys, day). Output: ``keys..., <day_col>, n, p<pct>...``."""

    def _t(partials: DataFrame) -> DataFrame:
        key_cols = list(keys)
        banded = _day_banded(partials, day_col, window_days)
        merged = merge_quantile_partials(
            keys=key_cols + ["_day_out"], width=width, pcts=pcts
        )(banded)
        return merged.withColumnRenamed("_day_out", day_col)

    return _t


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 4
) -> DataFrame:
    """JOIN-CARDINALITY estimate from two Count-Min sketches (the
    inner-product estimator, Cormode & Muthukrishnan 2005 §4.2:
    ``|A ⋈_k B| = Σ_k fA(k)·fB(k)``, estimated as ``min_i Σ_b
    cntA[i,b]·cntB[i,b]`` — an OVERESTIMATE within ``eps·|A|·|B|``):
    what a planner wants before committing to a shuffle join — will
    this equi-join explode? — answered from two synopsis tables the
    arrival pipeline already maintains, never by scanning either input.
    One bounded cell join (<= depth*width rows per side) and a
    ``depth``-row aggregate; output a single ``est_join_rows``."""
    a = sketch_a.select("i", "bucket", F.col("cnt").alias("_ca"))
    b = sketch_b.select("i", "bucket", F.col("cnt").alias("_cb"))
    spark = sketch_a.sparkSession
    # left-join the full depth index: a depth row with ZERO overlapping
    # occupied buckets has true dot product 0 — the tightest estimator
    # row — and must not vanish from the min() (ADVICE r8 #3); with an
    # empty sketch the estimate is exactly 0, not NULL
    rows = spark.range(depth).select(F.col("id").cast("int").alias("i"))
    # both sketches are bounded by geometry (<= depth*width cells), so
    # the cell join broadcasts — no shuffle anywhere past the two
    # partial aggregations
    dots = (
        a.join(F.broadcast(b), ["i", "bucket"])
        .groupBy("i")
        # DECIMAL widening before the product (r12 review, the
        # stats_partials discipline): hot cells over multi-billion-row
        # inputs carry counts whose bigint product exceeds 2^63 — an
        # ANSI job kill at exactly the scale this estimator exists for.
        # DECIMAL(38,0) holds (2^63)^2 comfortably and sums exactly.
        .agg(
            F.sum(
                F.col("_ca").cast("decimal(19,0)")
                * F.col("_cb").cast("decimal(19,0)")
            ).alias("_dot")
        )
    )
    per_row = rows.join(F.broadcast(dots), "i", "left").select(
        F.coalesce(F.col("_dot"), F.lit(0).cast("decimal(38,0)")).alias(
            "_dot"
        )
    )
    # saturate at Long.Max for the bigint output column: an estimate
    # past 9.2e18 rows is "do not run this join" either way, and an
    # ANSI overflow here would kill the very planning query that was
    # supposed to prevent the blowup
    long_max = (1 << 63) - 1
    return per_row.agg(
        F.least(
            F.min("_dot"), F.lit(long_max).cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias("est_join_rows")
    )
