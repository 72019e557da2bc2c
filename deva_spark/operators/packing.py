"""Sequence packing: greedy fill of training-context windows.

The pretraining data-loader step after curation: concatenate documents
into fixed-capacity token windows ("packs") so short docs don't waste
context length. True global greedy packing is a sequential recurrence —
inherently unparallelizable — so the distributed design packs *within a
shard* (source, date, or any natural partition): shards pack in parallel,
each shard's fill order is deterministic (sorted by the order column),
and cross-shard mixing is the trainer's job anyway. This is the standard
production layout: one packer per input shard, no cross-shard shuffle of
document text beyond the groupBy that co-locates a shard.

Scale shape: one shuffle (groupBy shard key) whose payload is the doc
rows themselves — unavoidable, since packing is a per-shard sequential
scan — then a linear pandas pass per shard. Shards are bounded (a crawl
shard is ~GBs), so per-group state fits executor memory; skewed shards
split naturally by salting the shard key upstream if needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_pack(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    size_col: str,
    capacity: int,
    out: str = "pack_id",
) -> DataFrame:
    """Assign each row a 0-based ``pack_id`` within its shard: walk rows
    in ``order_col`` order, accumulate ``size_col``, and start a new pack
    when adding the row would exceed ``capacity`` (a row larger than
    ``capacity`` gets a pack of its own). Deterministic given the order
    column; output schema is the input plus the ``out`` column.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    # copy — StructType.add mutates in place, and df.schema is the
    # DataFrame's own cached object (mutating it corrupts df.columns)
    schema = StructType(list(df.schema.fields) + [StructField(out, LongType())])
    size_f, order_f = size_col, order_col

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_f, kind="mergesort").reset_index(drop=True)
        packs, pack, cum = [], 0, 0
        for s in pdf[size_f]:
            s = int(s)
            if cum > 0 and cum + s > capacity:
                pack, cum = pack + 1, 0
            packs.append(pack)
            cum += s
        pdf[out] = pd.Series(packs, dtype="int64")
        return pdf

    return df.groupBy(shard_col).applyInPandas(_pack, schema)
