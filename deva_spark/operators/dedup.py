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
    return incremental_exact_dups_from_digests(
        digests(new_docs, text_col, id_col), old_digests
    )


def incremental_exact_dups_from_digests(
    new_digests: DataFrame, old_digests: DataFrame
) -> DataFrame:
    """:func:`incremental_exact_dups` when the batch's digests are
    ALREADY staged rows — the operational fast path: a corpus that
    maintains its digest table (the appendable per-doc index) never
    re-hashes text at dedup time; both sides are slices of the staged
    table. dup_of is the GLOBAL minimum id over the digest group
    (batch ∪ matched old), so interleaved batch/old ids resolve
    consistently."""
    nd = new_digests.select("doc_id", "_h")
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


# ---------------------------------------------------------------------------
# Retraction: the deletion-side maintenance of the staged index tiers
# (opt-out / takedown handling). The reference's dedup index only ever
# grows (`/root/reference/deva/utils/simhash.py:247-341` has no delete);
# an operational corpus needs the inverse of the append contract: remove
# a bounded forget-list from every staged projection without rebuilding
# it. Every per-doc index (digests, band_keys, chunk_keys, window
# hashes, positioned windows, doc_stats, signatures, embeddings) is a
# pure function of its own doc, so retraction is EXACTLY an anti-join —
# retract(index(corpus), forget) == index(corpus minus forget), row for
# row (parity-tested per artifact). Grouped (key -> member-array)
# projections rewrite their arrays in place. Cluster assignments are the
# one index where deletion has non-local effects (a forgotten doc can
# bridge a cluster) — see graphs.retract_assignments.
# ---------------------------------------------------------------------------


def retract_rows(
    index: DataFrame, forget: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Remove a forget-list from a FLAT per-doc staged index.

    ``forget`` holds the ids to remove (single column, any name; a
    bounded request batch by contract — orders of magnitude smaller
    than the index, hence the broadcast). One scan of the index, no
    shuffle: on a cluster the output overwrites (or compacts into) the
    staged parquet, exactly like the append path but subtractive.
    """
    fg = forget.select(F.col(forget.columns[0]).alias(id_col)).distinct()
    return index.join(F.broadcast(fg), id_col, "left_anti")


def retract_grouped(
    index: DataFrame,
    forget_ids: Sequence,
    arr_col: str,
    member: str | None = None,
    min_size: int = 2,
) -> DataFrame:
    """Remove a forget-list from a GROUPED ``(key -> member array)``
    staged index (subwin8g / subpos8g / shingle5_src shapes): rewrite
    each array in place, then drop groups that fall below ``min_size``
    (pair-ready projections keep only >=2-occurrence groups, so a group
    reduced to one member can never contribute a candidate again).

    ``forget_ids`` is a driver-side list (the forget-list is a bounded
    request batch by contract, so shipping it as a literal into the
    filter expression keeps the rewrite a zero-shuffle single scan —
    element order and duplicates inside the arrays are preserved, which
    ``array_except`` would not guarantee). ``member`` names the struct
    field holding the doc id for struct-element arrays (e.g. ``doc`` in
    subpos8g's ``(doc, pos)`` structs); ``None`` means the elements ARE
    the ids.
    """
    ids = list(forget_ids)
    col = F.col(arr_col)
    if member is None:
        new = F.filter(col, lambda x: ~x.isin(ids))
    else:
        new = F.filter(col, lambda x: ~x.getField(member).isin(ids))
    return index.withColumn(arr_col, new).filter(F.size(F.col(arr_col)) >= min_size)


def cluster_representatives(
    assign: DataFrame,
    features: DataFrame,
    order: Sequence,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Pick ONE representative per duplicate cluster by an explicit
    quality ordering — the keep-BEST survivor policy (the min-id
    convention baked into `canonical_assignments` is the deterministic
    default; real curation keeps the highest-quality copy of a
    duplicated page, not the numerically smallest id).

    ``assign``: ``(doc_id, cluster_id, ...)`` from the resolution step;
    ``features``: per-doc feature table carrying the ordering columns
    (the staged doc_stats artifact in the registry); ``order``: explicit
    ordering expressions, best first — the caller MUST make the order
    total (tie-break on the id column) for a deterministic pick.
    Output: ``(cluster_id, keep_id, n_members)``.

    Both the rank window and the aggregate partition on ``cluster_col``,
    so the second shuffle reuses the first exchange (AQE); the features
    join ships only the ordering columns.
    """
    j = assign.select(F.col(id_col), F.col(cluster_col)).join(
        features, id_col
    )
    w = Window.partitionBy(cluster_col).orderBy(*order)
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .groupBy(cluster_col)
        .agg(
            F.min(F.when(F.col("_rn") == 1, F.col(id_col))).alias("keep_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def drop_non_representatives(
    docs: DataFrame,
    assign: DataFrame,
    features: DataFrame,
    order: Sequence,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Rewrite the corpus keeping only each cluster's representative
    (plus every unclustered doc): the ACTION step for
    :func:`cluster_representatives`, mirroring remove_duplicate_runs'
    detect-then-rewrite split. The loser set is bounded by the clustered
    minority, so the final anti-join broadcasts it against the corpus
    scan."""
    reps = cluster_representatives(
        assign, features, order, id_col=id_col, cluster_col=cluster_col
    )
    losers = (
        assign.select(F.col(id_col), F.col(cluster_col))
        .join(reps.select(cluster_col, "keep_id"), cluster_col)
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
