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


def chunk_documents(
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "callable":
    """Sliding-window document CHUNKING — the complement of
    :func:`greedy_pack` on the long side: packing concatenates short
    docs up to the context length; chunking splits docs LONGER than it
    into ``max_tokens``-token windows that step by ``max_tokens -
    overlap`` (the standard pretraining / RAG splitter; ``overlap``
    tokens repeat across adjacent chunks so no span straddles a boundary
    unseen). Pure column algebra — tokenize, a ``sequence`` of chunk
    starts, one ``posexplode``, a ``slice`` per chunk — whole-stage
    codegen, no UDF, no shuffle at all (chunking is row-local; at 100 TB
    it pipelines inside the scan stage).

    A doc of ``n <= max_tokens`` tokens yields exactly one chunk
    (itself). Otherwise ``1 + ceil((n - max_tokens) / stride)`` chunks:
    the last window is the first one whose end reaches ``n``, possibly
    shorter than ``max_tokens`` but always longer than ``overlap`` —
    every token appears in >= 1 chunk, and token positions
    ``[i*stride, i*stride + max_tokens)`` reconstruct the doc exactly
    (tested). Output: ``<id_col>, chunk_id, n_tokens, chunk_text`` plus
    any extra grouping columns via a prior select.
    """
    if not (0 <= overlap < max_tokens):
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def _t(df: DataFrame) -> DataFrame:
        from deva_spark.functions.text import words

        ws = df.select(
            *[c for c in df.columns if c != text_col],
            words(F.col(text_col)).alias("_ws"),
        ).withColumn("_n", F.size("_ws"))
        n_chunks = F.when(F.col("_n") <= max_tokens, F.lit(1)).otherwise(
            (
                F.lit(1)
                + F.ceil(
                    (F.col("_n") - F.lit(max_tokens))
                    / F.lit(float(stride))
                )
            ).cast("int")
        )
        return (
            ws.withColumn("_nc", n_chunks)
            .select(
                *[c for c in ws.columns if c not in ("_ws", "_n", "_nc")],
                "_ws",
                "_n",
                F.posexplode(
                    F.sequence(F.lit(0), F.col("_nc") - 1)
                ).alias("chunk_id", "_i"),
            )
            .withColumn(
                "_chunk",
                F.slice(
                    "_ws",
                    F.col("_i") * stride + 1,
                    F.least(
                        F.lit(max_tokens),
                        F.col("_n") - F.col("_i") * F.lit(stride),
                    ),
                ),
            )
            .select(
                *[
                    c
                    for c in ws.columns
                    if c not in ("_ws", "_n", "_nc")
                ],
                F.col("chunk_id").cast("int").alias("chunk_id"),
                F.size("_chunk").alias("n_tokens"),
                F.array_join("_chunk", " ").alias("chunk_text"),
            )
        )

    return _t
