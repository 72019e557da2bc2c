"""Windows, running folds, ordering analytics, sessionization.

Reference surface: ``sliding_window`` (`/root/reference/deva/core/compute/ops.py:924-973`),
``partition`` (`ops.py:874-922`), ``timed_window`` (`ops.py:975-1026`),
``accumulate``/``scan`` (`ops.py:738-824`), ``slice`` (`ops.py:826-872`),
``collect``-flush sessions (`ops.py:568-615`), naja Welford z-score
(`deva/naja/radar/engine.py:264-298`).

The reference's per-event arrival order does not exist in a distributed
engine, so every order-sensitive operator keys on an explicit
``(ts, event_id)`` total order (SURVEY.md §7.3). All window functions here
partition by a key (user_id, …): one shuffle on the key, then per-partition
sorted evaluation — the scalable shape. Global positional operators
(slice/partition-chunks/zip) avoid the single-reducer global window via
two-phase numbering: deterministic quantile range-bucketing on the leading
order column, partition-local ``row_number``, plus broadcast cumulative
bucket offsets (:func:`global_positions`).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

#: Deterministic event total order used across the events table.
EVENT_ORDER: tuple[str, str] = ("ts", "event_id")


def keyed_order(partition: str | None, order: Sequence[str] = EVENT_ORDER) -> WindowSpec:
    w = Window.partitionBy(partition) if partition else Window.partitionBy()
    return w.orderBy(*order)


def epoch_micros(df: DataFrame, ts_col: str) -> Column:
    """Epoch microseconds for either timestamp flavor.

    ``unix_micros`` only accepts TIMESTAMP (LTZ); parquet files whose
    timestamps carry ``isAdjustedToUTC=false`` load as TIMESTAMP_NTZ.
    For NTZ columns we use ``timestampdiff(MICROSECOND, NTZ epoch, c)``,
    which stays entirely in the NTZ domain and is therefore independent
    of ``spark.sql.session.timeZone`` (ADVICE r4: the earlier
    ``to_utc_timestamp(c,'UTC')`` form implicitly cast NTZ->LTZ through
    the SESSION timezone first, so a non-UTC session tz shifted the
    epoch). Matches DuckDB's ``epoch_us`` on naive timestamps.
    """
    col = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(col)


#: Inputs whose Catalyst size estimate is at or below this many bytes take
#: the plain single-partition global window inside :func:`global_positions`
#: — one reducer over <= 128 MiB is cheaper than the two-phase machinery
#: (bounds agg + counts self-join cost ~2 s of fixed latency at sf0.1).
#: Override per session with ``spark.deva.positional.smallInputBytes``
#: (0 disables the cutover, forcing the scale path — plan tests do this).
SMALL_INPUT_BYTES_CONF = "spark.deva.positional.smallInputBytes"
SMALL_INPUT_BYTES_DEFAULT = 128 * 1024 * 1024


def _estimated_bytes(df: DataFrame) -> int | None:
    """Catalyst's pre-execution size estimate for ``df`` (file-source scans
    report summed file sizes; no job is triggered). None when unavailable."""
    try:
        # py4j maps the scala BigInt to a Python int for normal magnitudes;
        # str() round-trip covers any JavaObject fallback
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # noqa: BLE001 — estimate is best-effort
        return None


def small_input(df: DataFrame) -> bool:
    """The shared adaptive-cutover predicate: True when Catalyst's size
    estimate for ``df`` is at or below the small-input threshold, so a
    plain window beats the two-phase machinery (one reducer over
    <= 128 MiB is cheaper than the bounds/offset stages). ``0`` in
    ``spark.deva.positional.smallInputBytes`` disables the cutover —
    plan tests do this to audit the scale path."""
    small_cap = int(
        df.sparkSession.conf.get(
            SMALL_INPUT_BYTES_CONF, str(SMALL_INPUT_BYTES_DEFAULT)
        )
    )
    if small_cap <= 0:
        return False
    est = _estimated_bytes(df)
    return est is not None and est <= small_cap


def global_positions(
    df: DataFrame,
    order: Sequence[str] = EVENT_ORDER,
    out: str = "_rn",
    buckets: int | None = None,
    bounds: str = "width",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Scale-safe global 1-based row numbering by ``order`` — the two-phase
    alternative to ``row_number().over(Window.orderBy(...))`` (which moves
    the whole input through ONE reducer).

    Adaptive cutover (AQE-style): when Catalyst's size estimate for the
    input is at or below ``spark.deva.positional.smallInputBytes``
    (default 128 MiB), a single global window IS the right plan — one
    partition comfortably holds the data and skips the two-phase fixed
    cost. Above the threshold (or when no estimate exists), the two-phase
    path runs; it is entirely lazy — ONE job, no driver actions:

      1. bucket each row by a range over the leading order column —
         assignment is a pure deterministic function of the value, so
         every plan branch agrees and rows with equal leading values
         always share a bucket;
      2. partition-local ``row_number`` per bucket (parallel window);
      3. cumulative bucket offsets from a metadata-sized counts self-join
         (B rows × B rows, broadcast), added back per bucket.

    ``bounds`` picks the bucketing scheme:

    * ``"width"`` (default): equal-width over the broadcast global
      min/max — zero extra jobs, but can skew under pathological value
      distributions (correctness unaffected — only balance);
    * ``"sampled"``: boundaries from a seeded deterministic sample's
      quantiles, collected once on the driver (metadata-sized: B-1
      doubles) and embedded as literals — balanced buckets even under
      power-law distributions, at the cost of one small sampling job.

    A constant leading column degrades to one bucket, the inherently
    sequential case; same fallback when the leading column has no
    numeric image.

    ``group_cols`` (r11) numbers rows WITHIN each group instead of
    globally — the scale-safe replacement for
    ``row_number().over(Window.partitionBy(group).orderBy(...))`` when
    the group count is a handful unrelated to the configured parallelism
    (per-source percentiles: 5 sources would mean 5 corpus-sized
    reducers). Buckets shard each group's numbering the same way; counts
    and offsets are computed per (group, bucket); the offset join stays
    metadata-sized (groups × buckets rows, broadcast).
    """
    spark = df.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    gcols = list(group_cols)
    if small_input(df):
        w = Window.partitionBy(*gcols).orderBy(*order)
        return df.withColumn(out, F.row_number().over(w).cast("bigint"))
    d = _range_bucketed(df, order, buckets, bounds)
    counts = d.groupBy(*gcols, "_gb").agg(F.count(F.lit(1)).alias("_c"))
    same_group = [
        F.col(f"_cb.{g}").eqNullSafe(F.col(f"_ca.{g}")) for g in gcols
    ]
    offs = (
        counts.alias("_ca")
        .join(
            counts.alias("_cb"),
            _and_all(same_group + [F.col("_cb._gb") < F.col("_ca._gb")]),
            "left",
        )
        .groupBy(
            *[F.col(f"_ca.{g}").alias(g) for g in gcols],
            F.col("_ca._gb").alias("_gb"),
        )
        .agg(F.coalesce(F.sum(F.col("_cb._c")), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy(*gcols, "_gb").orderBy(*order)
    return (
        _join_offsets(d, offs, gcols)
        .withColumn(out, (F.row_number().over(w) + F.col("_off")).cast("bigint"))
        .drop("_gb", "_off")
    )


def _and_all(conds: Sequence[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _join_offsets(d: DataFrame, offs: DataFrame, gcols: list[str]) -> DataFrame:
    """Attach the broadcast ``_off`` column per (group, bucket). The
    group-key equality is NULL-SAFE (``<=>``): a name-based equi-join
    would silently DROP every row whose group value is NULL — they have
    a legitimate offset row of their own (groupBy keeps the null
    group)."""
    if not gcols:
        return d.join(F.broadcast(offs), ["_gb"])
    from deva_spark.operators.joins import broadcast_join_null_safe

    return broadcast_join_null_safe(d, offs, gcols + ["_gb"])


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order: Sequence[str],
    out: str = "_cum",
    buckets: int | None = None,
    bounds: str = "width",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Scale-safe INCLUSIVE running sum of ``value_col`` by ``order``
    (optionally within ``group_cols``) — the prefix-sum sibling of
    :func:`global_positions`, replacing
    ``sum(v).over(Window.partitionBy(g).orderBy(...).rowsBetween(
    unboundedPreceding, currentRow))`` whose per-key volume scales with
    the data when the group count is a handful (r11, the x62 shape).

    Same adaptive cutover and same two-phase plan: range-bucket on the
    leading order column (rows with equal leading values always share a
    bucket, so cross-bucket offsets respect the total order), per-bucket
    local running sum (parallel window), plus broadcast per-(group,
    bucket) SUM offsets from a metadata-sized self-join. DESCending
    running sums: pass a negated numeric image as the leading order
    column (the x59 pattern) — ``order`` entries are ascending here.
    """
    spark = df.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    gcols = list(group_cols)
    if small_input(df):
        w = (
            Window.partitionBy(*gcols)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out, F.sum(value_col).over(w))
    d = _range_bucketed(df, order, buckets, bounds)
    sums = d.groupBy(*gcols, "_gb").agg(F.sum(value_col).alias("_s"))
    same_group = [
        F.col(f"_cb.{g}").eqNullSafe(F.col(f"_ca.{g}")) for g in gcols
    ]
    offs = (
        sums.alias("_ca")
        .join(
            sums.alias("_cb"),
            _and_all(same_group + [F.col("_cb._gb") < F.col("_ca._gb")]),
            "left",
        )
        .groupBy(
            *[F.col(f"_ca.{g}").alias(g) for g in gcols],
            F.col("_ca._gb").alias("_gb"),
        )
        .agg(F.coalesce(F.sum(F.col("_cb._s")), F.lit(0)).alias("_off"))
    )
    w = (
        Window.partitionBy(*gcols, "_gb")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _join_offsets(d, offs, gcols)
        .withColumn(out, F.sum(value_col).over(w) + F.col("_off"))
        .drop("_gb", "_off")
    )


def _range_bucketed(
    df: DataFrame, order: Sequence[str], buckets: int, bounds: str
) -> DataFrame:
    """Assign each row a deterministic range bucket ``_gb`` over the leading
    order column (phase 1 of :func:`global_positions`)."""
    lead = order[0]
    dtype = dict(df.dtypes)[lead]
    col = F.col(lead)
    if dtype.startswith("timestamp"):
        num = epoch_micros(df, lead).cast("double")
    elif dtype == "date":
        num = F.datediff(col, F.lit("1970-01-01")).cast("double")
    elif dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or dtype.startswith(
        "decimal"
    ):
        num = col.cast("double")
    else:
        num = None
    if num is not None and buckets > 1 and bounds == "sampled":
        d0 = df.withColumn("_gb_v", num)
        # Seeded sample -> quantile boundaries, collected ONCE and embedded
        # as literals: deterministic by construction (two plan branches
        # can't re-sample into disagreement, unlike repartitionByRange).
        fractions = [i / buckets for i in range(1, buckets)]
        qrow = (
            d0.sample(fraction=0.1, seed=42)
            .agg(F.percentile_approx("_gb_v", fractions, 10_000).alias("_qs"))
            .first()
        )
        qs = [float(q) for q in (qrow["_qs"] or []) if q is not None]
        if qs:
            lits = F.array(*[F.lit(q) for q in qs])
            bucket = F.lit(1) + F.aggregate(
                lits,
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col("_gb_v") > b, F.lit(1)).otherwise(F.lit(0)),
            )
            # NULL leading values -> bucket 0, matching the width path
            # (they sort ASC NULLS FIRST, below every boundary)
            d = d0.withColumn(
                "_gb",
                F.when(F.col("_gb_v").isNull(), F.lit(0)).otherwise(bucket).cast("int"),
            ).drop("_gb_v")
        else:
            d = d0.drop("_gb_v").withColumn("_gb", F.lit(0))
    elif num is not None and buckets > 1:
        d0 = df.withColumn("_gb_v", num)
        # bounds over FINITE values only (r12 review): one NaN row made
        # _hi = NaN (Spark's max orders NaN above every double), so
        # width_bucket returned NULL for every row and the whole input
        # silently coalesced into bucket 0 — the single-reducer shape
        # this two-phase path exists to avoid. NaN rows themselves go
        # to the TOP bucket (they sort above everything), matching the
        # sampled path, which places them past every boundary.
        finite = F.when(~F.isnan("_gb_v"), F.col("_gb_v"))
        bounds_df = d0.agg(
            F.min(finite).alias("_lo"), F.max(finite).alias("_hi")
        )
        # NULL values -> bucket 0 (sorts with ASC NULLS FIRST); equal
        # min/max (constant column) -> single bucket
        # NaN joins the TOP bucket: width_bucket returns n+1 for
        # v == _hi (exclusive upper bound), so the top finite values
        # live in bucket n+1 and NaN must share it — within the bucket
        # the local sort puts NaN after every finite value, preserving
        # the global order
        bucket = F.when(F.isnan("_gb_v"), F.lit(buckets + 1)).otherwise(
            F.when(F.col("_lo") == F.col("_hi"), F.lit(1)).otherwise(
                F.width_bucket(
                    F.col("_gb_v"), F.col("_lo"), F.col("_hi"), F.lit(buckets)
                )
            )
        )
        d = (
            d0.join(F.broadcast(bounds_df))
            .withColumn("_gb", F.coalesce(bucket, F.lit(0)))
            .drop("_lo", "_hi", "_gb_v")
        )
    else:
        d = df.withColumn("_gb", F.lit(0))
    return d


def running_fold(
    expr: Column, out: str, partition: str | None, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``accumulate``/``scan`` analog (`ops.py:738-824`): running aggregate
    over all preceding rows in event order."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn(out, expr.over(w))

    return _t


def sliding_count_window(
    expr: Column, out: str, n: int, partition: str | None, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``sliding_window(n)`` analog (`ops.py:924-973`): aggregate over the
    last-n rows (current included), emitted per row. ``return_partial=True``
    semantics: partial windows during warmup are included."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order).rowsBetween(-(n - 1), Window.currentRow)
        return df.withColumn(out, expr.over(w))

    return _t


def chunk(
    n: int, order: Sequence[str] = EVENT_ORDER, drop_tail: bool = True
) -> Callable[[DataFrame], DataFrame]:
    """``partition(n)`` analog (`ops.py:874-922`): non-overlapping n-row
    chunks in global order, tail dropped to match the reference.

    Numbering via :func:`global_positions` — parallel two-phase global
    ordering, no single-reducer window.
    """

    def _t(df: DataFrame) -> DataFrame:
        out = global_positions(df, order, out="_rn").withColumn(
            "g", F.floor((F.col("_rn") - F.lit(1)) / F.lit(n)).cast("bigint")
        ).drop("_rn")
        if drop_tail:
            # staged: the numbered frame feeds both the per-chunk count
            # and the join branch — checkpoint so the two-phase
            # numbering evaluates once (r11 review)
            out = out.localCheckpoint(eager=False)
            counts = out.groupBy("g").agg(F.count(F.lit(1)).alias("_cnt"))
            out = (
                out.join(F.broadcast(counts.filter(F.col("_cnt") == n)), "g")
                .drop("_cnt")
            )
        return out

    return _t


def positional_slice(
    start: int, end: int, step: int, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``slice(start, end, step)`` analog (`ops.py:826-872`): positional
    selection over the event sequence (1-based position, [start, end));
    two-phase global numbering via :func:`global_positions`."""

    def _t(df: DataFrame) -> DataFrame:
        out = global_positions(df, order, out="_rn").filter(
            (F.col("_rn") >= start)
            & (F.col("_rn") < end)
            & (((F.col("_rn") - start) % step) == 0)
        )
        return out.drop("_rn")

    return _t


def rank_top_per_key(
    k: int, partition: str, order: Sequence[Column]
) -> Callable[[DataFrame], DataFrame]:
    """Ranking window: top-k rows per key (RANK, ties kept)."""

    def _t(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(partition).orderBy(*order)
        return df.withColumn("_r", F.rank().over(w)).filter(F.col("_r") <= k).drop("_r")

    return _t


def lag_diff(
    value: str, out: str, partition: str, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """Lag/lead analytic (``uniq``-adjacent): difference vs previous row."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order)
        return df.withColumn(out, F.col(value) - F.lag(value).over(w))

    return _t


def tumbling_time_window(
    ts_col: str, duration: str, keys: Sequence[str], aggs: dict[str, Column]
) -> Callable[[DataFrame], DataFrame]:
    """``timed_window(interval)`` analog (`ops.py:975-1026`) upgraded from
    processing time to event time: groupBy(window(ts, w)). In streaming mode
    the identical expression runs with a watermark (streaming/twin.py)."""

    def _t(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
            .agg(*[c.alias(n) for n, c in aggs.items()])
            .withColumn("w", F.col("w.start"))
        )

    return _t


def rolling_time_agg(
    expr: Column,
    out: str,
    seconds: int,
    partition: str,
    ts_col: str = "ts",
) -> Callable[[DataFrame], DataFrame]:
    """Time-range rolling window: aggregate over the trailing ``seconds``
    of event time per key (`[t - s, t]`, inclusive both ends — SQL RANGE
    frame semantics).

    The frame orders by epoch MICROSECONDS as a bigint — an exact integer
    frame both engines implement identically (ordering by raw timestamps
    would hit each engine's own interval frame arithmetic). One shuffle on
    the partition key. No tiebreak parameter on purpose: a RANGE frame
    puts equal-``ts`` rows in the same frame, so a secondary order column
    cannot change any aggregate (a former ``tiebreak`` arg was accepted
    but ignored — misleading API surface, r11 review).
    """

    def _t(df: DataFrame) -> DataFrame:
        d2 = df.withColumn("_us", epoch_micros(df, ts_col))
        w = (
            Window.partitionBy(partition)
            .orderBy("_us")
            .rangeBetween(-seconds * 1_000_000, 0)
        )
        return d2.withColumn(out, expr.over(w)).drop("_us")

    return _t


def sessionize(
    gap_minutes: int, partition: str = "user_id", order: Sequence[str] = EVENT_ORDER, ts_col: str = "ts"
) -> Callable[[DataFrame], DataFrame]:
    """Session windows with an inactivity gap (the reference's closest analog
    is signal-driven ``collect``+flush, `ops.py:568-615`).

    Batch formulation: mark rows whose gap from the previous event exceeds
    the threshold, then a running sum assigns session ids — two window
    passes over one shuffle of the partition key. (Streaming twin uses
    ``session_window``.)
    """

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order)
        # Exact integer gap test (epoch microseconds) — double-epoch seconds
        # carry ~0.4 µs rounding at 1e9 magnitude, enough to flip a row that
        # lands exactly on the gap boundary vs the oracle's INTERVAL compare.
        us = epoch_micros(df, ts_col)
        prev_us = F.lag(us).over(w)
        new_s = F.when(
            prev_us.isNull() | (us - prev_us > gap_minutes * 60 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0))
        df2 = df.withColumn("_new_s", new_s)
        w2 = keyed_order(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df2.withColumn("sess", F.sum("_new_s").over(w2)).drop("_new_s")

    return _t


def consecutive_change_filter(
    value: str, partition: str, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``uniq`` analog (`pipe.py:377-423`): keep rows where the value differs
    from the previous row's value (collapse consecutive duplicates)."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order)
        prev = F.lag(value).over(w)
        return df.withColumn("_p", prev).filter(
            F.col("_p").isNull() | (F.col("_p") != F.col(value))
        ).drop("_p")

    return _t


def merge_intervals(
    start_col: str = "start",
    end_col: str = "end",
    partition: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Merge overlapping/touching [start, end] intervals per key — the
    gaps-and-islands primitive over EXPLICIT spans (media segments,
    speech regions, downtime windows), complementing :func:`sessionize`
    (which derives spans from point-event gaps). Intervals overlap when
    ``next.start <= running max(end)`` (touching endpoints merge).

    Output: one row per merged island ``(partition?, start, end,
    n_merged)``.

    Scale shape: one shuffle on the partition key, two window passes
    (running max of end to spot island breaks, running sum to number
    islands) and a hash aggregate — the :func:`sessionize` anatomy
    applied to spans. With ``partition=None`` the window is global:
    only for per-key-pre-grouped or small frames (the plan-audit
    single-reducer contract); keyed use is the scale path.
    """

    def _t(df: DataFrame) -> DataFrame:
        keys = [partition] if partition else []
        w = Window.partitionBy(*keys).orderBy(start_col, end_col)
        prev_max_end = F.max(end_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        brk = F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end),
            F.lit(1),
        ).otherwise(F.lit(0))
        w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        islands = df.withColumn("_brk", brk).withColumn(
            "_island", F.sum("_brk").over(w2)
        )
        return (
            islands.groupBy(*keys, "_island")
            .agg(
                F.min(start_col).alias(start_col),
                F.max(end_col).alias(end_col),
                F.count(F.lit(1)).alias("n_merged"),
            )
            .drop("_island")
        )

    return _t
