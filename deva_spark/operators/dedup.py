"""Deduplication: exact, first-seen, consecutive, near-duplicate.

Reference surface: ``unique`` (`/root/reference/deva/core/compute/ops.py:402-486`),
pipe ``dedup`` (`pipe.py:336-375`), ``uniq`` (`pipe.py:377-423`),
``deduplicate_webpages`` exact+simhash tiers (`deva/utils/simhash.py:342-375`).

Scale notes: first-seen dedup is a window `row_number()=1` — one shuffle on
the dedup key; the streaming twin is ``dropDuplicatesWithinWatermark``
(RocksDB state store), see streaming/stateful.py. Exact text dedup hashes
the normalized text first so the shuffle carries a 16-byte digest per row,
not the document body. Near-dup (MinHash/SimHash) lives in
functions/minhash.py and functions/simhash.py.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_seen(
    keys: Sequence[str], order: Sequence[str]
) -> Callable[[DataFrame], DataFrame]:
    """``unique(key=...)`` / pipe ``dedup`` analog: first occurrence wins,
    in the explicit ``order`` total order."""

    def _t(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(*order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    return _t


def drop_exact_duplicates(keys: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """Non-deterministic-which-row variant: Spark's native ``dropDuplicates``
    (hash-agg, cheaper than the window when any representative row will do)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.dropDuplicates(list(keys))

    return _t


def exact_text_groups(
    text_col: str = "text", id_col: str = "doc_id"
) -> Callable[[DataFrame], DataFrame]:
    """Exact-duplicate groups over a document corpus
    (``deduplicate_webpages`` exact tier, `utils/simhash.py:342-358`).

    Groups by MD5 of the trimmed text: the shuffle key is the digest, so
    100 TB of documents shuffles only ids+digests. Returns one row per
    duplicate group: the kept (minimum) id and the group size.
    """

    def _t(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), F.md5(F.trim(F.col(text_col))).alias("_h"))
            .groupBy("_h")
            .agg(F.min(id_col).alias("keep"), F.count(F.lit(1)).alias("dups"))
            .filter(F.col("dups") > 1)
            .drop("_h")
        )

    return _t


def digests(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, _h)`` digest table — the exact tier's stageable/
    appendable index (the band_keys / chunk_keys / window-index
    contract): a pure per-doc function of the text, so a new batch's
    rows append to the staged table without any rebuild."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.trim(F.col(text_col))).alias("_h"),
    )


def incremental_exact_dups(
    new_docs: DataFrame,
    old_digests: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup — the x77/x80/x81 contract on the exact
    tier: the NEW batch's digests join the staged digest table on the
    16-byte hash; only old rows whose digest the batch actually carries
    ever ship (semi-join shape), so per-batch cost scales with the
    batch plus matched fan-out, never the corpus. Output: ``(doc_id,
    dup_of)`` — every new doc whose normalized text already exists,
    with the surviving (global minimum) id; equals the union corpus's
    :func:`exact_text_groups` membership restricted to new docs
    (parity-tested). Doc ids must be disjoint from the old corpus."""
    nd = digests(new_docs, text_col, id_col)
    matched_old = old_digests.select("doc_id", "_h").join(
        nd.select("_h").distinct(), "_h"
    )
    keep = (
        nd.unionByName(matched_old)
        .groupBy("_h")
        .agg(F.min("doc_id").alias("dup_of"))
    )
    return (
        nd.join(keep, "_h")
        .filter(F.col("doc_id") != F.col("dup_of"))
        .select("doc_id", "dup_of")
    )
