"""Sampling and limits: head/tail/skip/sample.

Reference surface: pipe ``head``/``tail``/``skip``/``sample``
(`/root/reference/deva/pipe.py:276-333`, `1380-1425`).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deva_spark.operators.windows import global_positions


def head(n: int) -> Callable[[DataFrame], DataFrame]:
    def _t(df: DataFrame) -> DataFrame:
        return df.limit(n)

    return _t


def tail_by(n: int, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """tail = top-n of the reversed order (TakeOrderedAndProject — no full
    sort)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.orderBy(*[F.col(c).desc() for c in order]).limit(n)

    return _t


def skip(k: int, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """``skip(k)``: drop the first k rows of the total order (two-phase
    global numbering — no single-reducer window)."""

    def _t(df: DataFrame) -> DataFrame:
        return (
            global_positions(df, order, out="_rn")
            .filter(F.col("_rn") > k)
            .drop("_rn")
        )

    return _t


def take_while(cond, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """pipe ``take_while`` analog (`pipe.py:984-989`): keep rows until the
    first one (in the total order) whose predicate is not TRUE.

    Scalable formulation: two-phase global numbering, then a parallel MIN
    over the failing rows finds the cut position, broadcast back as a
    1-row join. A NULL predicate counts as a failure (reference truthiness:
    any non-true value ends the prefix).
    """

    def _t(df: DataFrame) -> DataFrame:
        # staged: the numbering feeds TWO consumers (the cut-position
        # aggregate and the join branch) — without the lazy checkpoint
        # the whole two-phase numbering plan evaluates twice (r11
        # review; the retention_cohorts dual-consumer convention)
        d = global_positions(df, order, out="_rn").localCheckpoint(
            eager=False
        )
        fail = ~F.coalesce(cond, F.lit(False))
        stop = d.filter(fail).agg(F.min("_rn").alias("_stop"))
        return (
            d.join(F.broadcast(stop))
            .filter(F.col("_stop").isNull() | (F.col("_rn") < F.col("_stop")))
            .drop("_rn", "_stop")
        )

    return _t


def skip_while(cond, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """pipe ``skip_while`` analog (`pipe.py:992-997`): drop the leading run
    of rows whose predicate is TRUE, keep everything from the first
    non-true row on (NULL counts as non-true, same truthiness as
    :func:`take_while`)."""

    def _t(df: DataFrame) -> DataFrame:
        # staged for the same dual-consumer reason as take_while
        d = global_positions(df, order, out="_rn").localCheckpoint(
            eager=False
        )
        fail = ~F.coalesce(cond, F.lit(False))
        start = d.filter(fail).agg(F.min("_rn").alias("_start"))
        return (
            d.join(F.broadcast(start))
            .filter(F.col("_start").isNotNull() & (F.col("_rn") >= F.col("_start")))
            .drop("_rn", "_start")
        )

    return _t


def bernoulli_sample(fraction: float, seed: int = 42) -> Callable[[DataFrame], DataFrame]:
    """``sample`` analog: per-row Bernoulli sample — fully distributed (the
    reference's reservoir sampling is single-process; at scale a fraction
    sample + exact limit is the idiom)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.sample(fraction=fraction, seed=seed)

    return _t


def hash_bucket(col, buckets: int = 100):
    """Deterministic content hash bucket in [0, buckets): fold of the md5
    head — reproducible across engines AND runs (unlike seeded Bernoulli,
    whose draw depends on partition layout). The curation idiom: sampling
    and splits must be stable under re-partitioning, re-runs, and engine
    swaps, or every pipeline rerun trains on a different subset."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
    return h % buckets


def stratified_sample(
    rates: dict[str, int],
    strata_col: str,
    id_col: str,
    default_rate: int = 0,
) -> Callable[[DataFrame], DataFrame]:
    """Per-stratum deterministic sampling (training-data curation op):
    keep a row when its :func:`hash_bucket` falls under its stratum's
    percentage. A pure map — no shuffle, no state; scales to any corpus
    and pushes the surviving-fraction filter straight into the scan."""

    def _t(df: DataFrame) -> DataFrame:
        rate = F.lit(default_rate)
        for value, pct in rates.items():
            rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
        return df.filter(hash_bucket(F.col(id_col)) < rate)

    return _t


def dataset_split(
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    out: str = "split",
) -> Callable[[DataFrame], DataFrame]:
    """Deterministic train/val/test assignment by content hash: the same
    row lands in the same split on every engine, run, and partitioning —
    a join-free, shuffle-free label column."""

    def _t(df: DataFrame) -> DataFrame:
        b = hash_bucket(F.col(id_col))
        return df.withColumn(
            out,
            F.when(b < train_pct, F.lit("train"))
            .when(b < train_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("test")),
        )

    return _t


def mixture_rebalance(
    group_col: str,
    id_col: str,
) -> Callable[[DataFrame], DataFrame]:
    """Temperature-style mixture rebalancing (the pretraining "don't let
    the biggest domain drown the rest" resample, alpha = 0.5): per-group
    keep-rate ``floor(100 * sqrt(min_count / count))`` percent — the
    smallest group keeps 100%, larger groups are deterministically
    downsampled toward (not all the way to) parity. Keeps a row when its
    :func:`hash_bucket` falls under the group's rate, so the sample is
    reproducible across runs, partitionings, and engines.

    Scale shape: one partial-aggregated count per group (the only
    shuffle, and it carries one row per group), a 1-row global MIN, and a
    broadcast join of the tiny rate table back onto the corpus — the
    corpus side never shuffles. sqrt is IEEE-correctly-rounded in both
    Spark and DuckDB, so the integer rate is engine-stable (pow is not —
    that is why the temperature is fixed at 0.5 here).
    """

    def _t(df: DataFrame) -> DataFrame:
        counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
        min_cnt = counts.agg(F.min("_cnt").alias("_min"))
        rates = counts.crossJoin(F.broadcast(min_cnt)).select(
            group_col,
            F.floor(
                F.lit(100.0) * F.sqrt(F.col("_min") / F.col("_cnt"))
            ).cast("int").alias("_rate"),
        )
        # null-SAFE key equality (r12 review): a plain equi-join is
        # null-rejecting, so every row whose group is NULL — a real
        # group that the counts above include and that can even set
        # min_cnt — silently vanished instead of sampling at its rate
        rr = rates.select(
            F.col(group_col).alias("_rb_key"), "_rate"
        )
        return (
            df.join(
                F.broadcast(rr),
                F.col(group_col).eqNullSafe(F.col("_rb_key")),
            )
            .filter(hash_bucket(F.col(id_col)) < F.col("_rate"))
            .drop("_rb_key", "_rate")
        )

    return _t


def top_p_by_group(
    keys: Sequence[str],
    weight_col: str,
    p_pct: int = 80,
    order_tiebreak: str = "",
) -> Callable[[DataFrame], DataFrame]:
    """Nucleus (top-p) trim per group: keep the heaviest rows until the
    kept weight reaches ``p_pct`` percent of the group total — the data-
    mixing cut loaders use to cap long-tail noise per source/domain.

    A row is kept iff the cumulative weight BEFORE it is still under the
    cap, so exactly one row straddles the boundary and the kept mass is
    always >= p_pct of the total. The boundary test is integer
    cross-multiplied (``cum_before * 100 < tot * p_pct``) — no float
    p*total to drift across engines. Deterministic under the
    (weight DESC, tiebreak ASC) total order — ``order_tiebreak`` is
    REQUIRED (a unique-per-row column): without it the running sum's
    order on weight ties depends on partition layout, and the kept set
    silently changes between runs (the repo determinism contract).

    Scale shape (r11): the running sum rides
    :func:`~deva_spark.operators.windows.global_running_sum` with
    ``group_cols=keys`` — a plain per-key cumulative window would pull
    each group's full slice through one reducer (per-key volume scaling
    with the corpus while the group count stays a handful); the group
    total rides a groupBy + broadcast join instead of a whole-partition
    window for the same reason. DESC order via a negated numeric image
    of the weight (the x59 pattern).
    """
    if not order_tiebreak:
        raise ValueError(
            "top_p_by_group requires order_tiebreak: a unique tiebreak "
            "column makes the (weight DESC, tiebreak ASC) order total; "
            "without one the kept set is partition-order-dependent"
        )

    def _t(df: DataFrame) -> DataFrame:
        from deva_spark.operators.joins import broadcast_join_null_safe
        from deva_spark.operators.windows import global_running_sum

        d = df.withColumn("_negw", -F.col(weight_col))
        r = global_running_sum(
            d,
            weight_col,
            order=["_negw", order_tiebreak],
            out="_cum",
            group_cols=list(keys),
        ).drop("_negw")
        tot = df.groupBy(*keys).agg(F.sum(weight_col).alias("_tot"))
        # null-safe: a NULL group key is a real group (the window-based
        # semantics this two-phase shape replaced kept it; r11 review)
        r = broadcast_join_null_safe(r, tot, list(keys))
        return r.filter(
            (F.col("_cum") - F.col(weight_col)) * 100
            < F.col("_tot") * F.lit(int(p_pct))
        ).drop("_cum", "_tot")

    return _t


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_cols: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement per group —
    the Efraimidis–Spirakis A-ES scheme on a portable hash: each row
    draws ``u`` from the engine-portable md5-LE64 of its id (uniform in
    (0,1), identical in Spark and the SQL oracle), and the k rows with
    the largest ``ln(u)/w`` are the sample. Heavier rows win more often
    in exact E-S proportion, yet the kept set is a pure function of the
    ids — reproducible across engines, partitionings and reruns (the
    data-mixing counterpart of the md5-bucket Bernoulli sampler above:
    that one is unweighted by rate; this one is weighted by size).

    The sort key is rounded to 10dp before ranking (ties break by id):
    ``ln`` may differ across libm implementations by ~1 ulp, invisible
    at 10dp except a measure-zero boundary (DEVIATIONS #13 reasoning).
    Rows with non-positive weight are excluded (E-S requires w > 0).

    ``group_cols`` must be non-empty: the rank window partitions by it,
    so the work shards per group. For a GLOBAL weighted sample use
    :func:`weighted_sample_global` (salted two-phase partial top-k +
    bounded merge) — an empty partition list here would be a
    single-reducer window, which this module's scale contract forbids.

    The ranking itself is TWO-PHASE (the x08 pattern, r11): a handful of
    groups (5 sources) would otherwise each pull their full corpus slice
    through one reducer — per-key volume scaling with the corpus while
    key count stays constant. Phase 1 ranks within
    ``(group_cols…, _salt)`` where ``_salt = pmod(xxhash64(id), 32)``
    and keeps k per bucket; phase 2 ranks the surviving ``32 × k`` rows
    per group. Exact: the per-group top-k is contained in the union of
    per-bucket top-k, and ``(skey DESC, id)`` is a total order. Same
    adaptive cutover as ``windows.global_positions``: at or below the
    small-input threshold the extra phase costs more than it buys and a
    plain per-group window runs instead (the plan audit zeroes the
    threshold to check the scale shape).

    Output: the input columns + ``skey`` (the rounded key) + ``rnk``.
    """
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty (a global window would be a "
            "single-reducer; bucket the input upstream instead)"
        )
    from pyspark.sql import Window

    from deva_spark.operators.aggregates import md5_le64
    from deva_spark.operators.windows import small_input

    keyed = df.filter(F.col(weight_col) > 0).withColumn(
        "skey", es_sort_key(weight_col, id_col)
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("skey").desc(), F.col(id_col)
    )
    if small_input(df):
        return keyed.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= k
        )
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(
        F.col("skey").desc(), F.col(id_col)
    )
    local = (
        keyed.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(32))
        )
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    return local.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def weighted_sample_global(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-GLOBAL Efraimidis–Spirakis weighted sample without
    replacement — the variant :func:`weighted_sample_topk` refuses
    (an empty ``group_cols`` would be a single-reducer window).

    Two-phase, the same shape as the KMV k-smallest merge
    (``aggregates.kmv_distinct``): each physical partition reduces to
    its own top-k by ``(skey DESC, id)`` via a window over
    ``spark_partition_id()`` — fully parallel — and the merge phase
    sorts a bounded array of at most ``partitions × k`` survivors in
    one hash aggregate (map-side partial collect; never a global
    window). The global top-k under a total order is
    partition-invariant, so the result is the exact global E-S sample:
    identical rows to the windowed path run with a constant group, and
    a pure function of the ids (same ``skey`` construction — portable
    md5 uniform draw, 10dp rounding, id tie-break).

    Output: the input columns + ``skey`` + ``rnk`` (1-based global
    rank), matching :func:`weighted_sample_topk`'s surface.

    Input rows ride inside the sorted merge struct, so every column
    must be an ORDERABLE Spark type — a MapType anywhere in the schema
    fails analysis (the comparison never actually reaches the payload:
    ``(_nk, _id)`` is already total — but Spark checks the whole struct
    type). Checked up front with a pointed error (r11 review); drop or
    re-encode map columns first, or use the windowed
    :func:`weighted_sample_topk` with a constant-free grouping column.
    """
    from pyspark.sql import Window

    from deva_spark.operators.aggregates import md5_le64

    def _has_map(dt) -> bool:
        from pyspark.sql import types as sqlt

        if isinstance(dt, sqlt.MapType):
            return True
        if isinstance(dt, sqlt.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, sqlt.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    bad = [f.name for f in df.schema.fields if _has_map(f.dataType)]
    if bad:
        raise ValueError(
            f"weighted_sample_global: column(s) {bad} contain MapType, "
            "which is not orderable inside the merge struct — drop or "
            "re-encode them (e.g. to_json) before sampling"
        )

    keyed = df.filter(F.col(weight_col) > 0).withColumn(
        "skey", es_sort_key(weight_col, id_col)
    )
    pw = Window.partitionBy("_p").orderBy(F.col("skey").desc(), F.col(id_col))
    part = (
        keyed.withColumn("_p", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(pw))
        .filter(F.col("_rn") <= k)
    )
    row_cols = [c for c in keyed.columns]
    packed = part.select(
        F.struct(
            (-F.col("skey")).alias("_nk"),
            F.col(id_col).alias("_id"),
            F.struct(*[F.col(c) for c in row_cols]).alias("_row"),
        ).alias("_s")
    )
    merged = packed.groupBy().agg(
        F.slice(F.sort_array(F.collect_list("_s")), 1, k).alias("_top")
    )
    return merged.select(
        F.posexplode("_top").alias("_i", "_s")
    ).select("_s._row.*", (F.col("_i") + 1).cast("int").alias("rnk"))


def es_sort_key(weight_col: str, id_col: str) -> "F.Column":
    """The shared Efraimidis–Spirakis sort key: ``round(ln(u)/w, 10)``
    with ``u`` drawn from the engine-portable md5-LE64 of the id — the
    exact construction :func:`weighted_sample_topk` and the SQL oracles
    use, factored out so batch partials and one-shot samples are
    guaranteed to rank by the identical key."""
    from deva_spark.operators.aggregates import md5_le64

    u = (md5_le64(F.col(id_col)).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 64)
    )
    return F.round(F.log(u) / F.col(weight_col), 10)


def reservoir_partials(
    k: int,
    weight_col: str,
    keys: Sequence[str],
    id_col: str = "doc_id",
) -> Callable[[DataFrame], DataFrame]:
    """Per-batch WEIGHTED-RESERVOIR synopsis — the sampling tier of the
    incremental-corpus ring (the x84/x85 contract on A-ES): each arrival
    batch reduces to one row per group carrying the batch's top-``k``
    rows by the deterministic E-S key as a bounded struct array. The
    corpus-wide sample's every winner is necessarily within its own
    batch's top-k (the KMV k-smallest argument, flipped to largest), so
    batch synopses APPEND and :func:`merge_reservoir_partials` re-takes
    the top-k over the union — BIT-IDENTICAL to the one-shot
    :func:`weighted_sample_topk` over the whole corpus, because the key
    is a pure function of the id (portable md5 draw, 10dp rounding, id
    tie-break). Ids must be unique across batches (the ring's standing
    arrival contract); ~k * 24 bytes per (batch, group) of state at any
    corpus size. Partition-local row_number prune bounds the collect,
    the kmv_partials shape."""
    from pyspark.sql import Window

    def _t(df: DataFrame) -> DataFrame:
        key_cols = list(keys)
        keyed = df.filter(F.col(weight_col) > 0).select(
            *key_cols,
            F.col(id_col).alias("_id"),
            F.col(weight_col).cast("bigint").alias("_w"),
            es_sort_key(weight_col, id_col).alias("_sk"),
        )
        pw = Window.partitionBy(*key_cols, "_p").orderBy(
            F.col("_sk").desc(), "_id"
        )
        part = (
            keyed.withColumn("_p", F.spark_partition_id())
            .withColumn("_rn", F.row_number().over(pw))
            .filter(F.col("_rn") <= k)
        )
        return part.groupBy(*key_cols).agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("_sk")).alias("_nk"),
                            F.col("_id").alias("_id"),
                            F.col("_w").alias("_w"),
                        )
                    )
                ),
                1,
                k,
            ).alias("_rs")
        )

    return _t


def merge_reservoir_partials(
    k: int,
    keys: Sequence[str],
    id_col: str = "doc_id",
) -> Callable[[DataFrame], DataFrame]:
    """Fold any set of :func:`reservoir_partials` rows into the exact
    corpus-wide per-group weighted sample: explode the bounded synopsis
    arrays (batches x k rows per group — synopsis-sized, never
    corpus-sized), re-rank by the shared key, keep the top-k. Output
    ``keys..., <id_col>, w, skey, rnk`` — the :func:`weighted_sample_topk`
    surface, so oracles and consumers are interchangeable between the
    one-shot and rollup routes."""
    from pyspark.sql import Window

    def _t(partials: DataFrame) -> DataFrame:
        key_cols = list(keys)
        rows = partials.select(
            *key_cols, F.explode("_rs").alias("_s")
        ).select(
            *key_cols,
            F.col("_s._id").alias(id_col),
            F.col("_s._w").alias("w"),
            (-F.col("_s._nk")).alias("skey"),
        )
        w = Window.partitionBy(*key_cols).orderBy(
            F.col("skey").desc(), id_col
        )
        return rows.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= k
        )

    return _t
