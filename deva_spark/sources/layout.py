"""Multi-dimensional data layout: z-order (Morton) clustering for scans
that filter on more than one column.

A sorted table prunes parquet row groups on ONE leading column; a query
boxing two dimensions (quantity band x price band, lat x lon, time x
tenant) still scans every row group of the surviving leading-column
stripe because the second column's min/max spans the whole domain inside
each stripe. Interleaving the bits of both columns (the Morton / Z curve
— Morton 1966, the layout behind Delta Lake / Iceberg OPTIMIZE ZORDER)
makes row-group min/max tight in EVERY indexed dimension at once, so the
engine's ordinary stats-based row-group skipping (Spark parquet filter
pushdown — no new reader code) prunes multiplicatively instead of along
one axis.

Everything here is expression-level (whole-stage codegen, no UDF): the
z-code is a sum of shift/mask terms over range-normalized columns; the
write is repartitionByRange + sortWithinPartitions on that code, i.e.
one shuffle at layout time, zero cost at query time. The min/max
normalization bounds collected at write time are 2 scalars per column —
bounded metadata, never data-sized.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_code(
    cols: Sequence[str],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 12,
) -> Column:
    """Morton code over ``cols``: each column range-normalizes to a
    ``bits``-bit integer grid cell via its ``[min, max]`` bounds (clipped,
    so out-of-bounds appended data still lands on the curve's edge rather
    than erroring), then the per-column bits interleave — bit ``i`` of
    column ``c`` lands at position ``i * n_cols + c``. Pure column
    algebra: ``bits * n_cols`` shift/mask/add terms, all codegen."""
    n = len(cols)
    if not (1 <= n <= 4):
        raise ValueError("zorder_code supports 1-4 columns")
    if not (1 <= bits * n <= 62):
        raise ValueError("bits * n_cols must fit a signed 64-bit code")
    cells = []
    top = (1 << bits) - 1
    for c, mn, mx in zip(cols, mins, maxs):
        span = float(mx) - float(mn)
        scaled = (
            (F.col(c).cast("double") - F.lit(float(mn)))
            * F.lit(top / span if span > 0 else 0.0)
        ).cast("bigint")
        cells.append(F.least(F.lit(top), F.greatest(F.lit(0), scaled)))
    code = F.lit(0)
    for i in range(bits):
        for c, cell in enumerate(cells):
            code = code + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * n + c
            )
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    n_files: int = 16,
    row_group_bytes: int | None = None,
) -> dict[str, tuple[float, float]]:
    """Relayout ``df`` along the z-curve of ``cols`` and write parquet:
    range-partition by z-code into ``n_files`` files, sort within each,
    drop the code. Row-set identical to the input — this is a LAYOUT
    operation, not a transform (the x98 oracle contract). Returns the
    per-column bounds used, so an appender can reuse the same grid
    (appended batches z-order against the ORIGINAL bounds; the clip in
    :func:`zorder_code` keeps drifted values legal).

    ``row_group_bytes`` maps to ``parquet.block.size`` — at cluster
    scale the default 128 MB row group is right; tests shrink it to get
    enough row groups for pruning evidence at local data sizes."""
    bounds_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    mins = [bounds_row[f"_mn_{i}"] for i in range(len(cols))]
    maxs = [bounds_row[f"_mx_{i}"] for i in range(len(cols))]
    if any(m is None for m in mins + maxs):
        # empty input or an all-NULL z-order column — fail with the
        # actual cause instead of float(None) deep in column algebra
        # (r11 review; a scheduled relayout on an empty day hit this)
        bad = [c for i, c in enumerate(cols) if mins[i] is None]
        raise ValueError(
            f"write_zordered: no non-NULL values for z-order column(s) "
            f"{bad} (empty input?) — nothing to lay out"
        )
    laid_out = (
        df.withColumn("_z", zorder_code(cols, mins, maxs, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    writer = laid_out.write.mode("overwrite")
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)
    return {c: (mins[i], maxs[i]) for i, c in enumerate(cols)}


def rowgroup_prune_stats(
    path: str, box: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """Pruning evidence from parquet footers alone: ``(surviving,
    total)`` row groups whose column-chunk min/max statistics intersect
    EVERY ``col: (lo, hi)`` band in ``box`` — exactly the test Spark's
    (and DuckDB's, and Iceberg's) stats-based row-group skipping
    applies, computed engine-independently with pyarrow so layout
    quality is assertable without scraping executor metrics."""
    import pyarrow.parquet as pq

    total = surviving = 0
    files = (
        [path]
        if os.path.isfile(path)
        else [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
    )
    for f in files:
        meta = pq.ParquetFile(f).metadata
        name_to_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            total += 1
            rg = meta.row_group(g)
            hit = True
            for col, (lo, hi) in box.items():
                st = rg.column(name_to_idx[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> not prunable, counts as hit
                if float(st.max) < lo or float(st.min) > hi:
                    hit = False
                    break
            surviving += hit
    return surviving, total


def append_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 12,
    n_files: int = 4,
    row_group_bytes: int | None = None,
) -> None:
    """Append a batch to an existing z-ordered table ON THE ORIGINAL
    GRID: the batch z-orders against the bounds :func:`write_zordered`
    returned (values outside them clip to the curve's edge — legal, just
    a fat edge cell), so new files have tight per-row-group min/max in
    the same dimensions and scans keep pruning across old + new files
    alike. Periodic restage (`write_zordered` over the whole table)
    re-tightens a drifted grid — the same compaction story as IVF cell
    appends and `compact_table`."""
    mins = [bounds[c][0] for c in cols]
    maxs = [bounds[c][1] for c in cols]
    laid_out = (
        df.withColumn("_z", zorder_code(cols, mins, maxs, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    writer = laid_out.write.mode("append")
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)
