"""Full-text index + search (IndexStream analog).

Reference surface: `/root/reference/deva/search.py:18-256` — a Whoosh
index stream with a jieba Chinese analyzer, fixed schema (content TEXT,
id ID unique), and TF-IDF keyword extraction (`search.py:179-207`).

Spark mapping: the index IS a DataFrame — an inverted posting table
(term, doc_id, tf) plus a doc-frequency table. Search = a semi-join of
query terms against postings with TF-IDF scoring; AND semantics require
matching every query term. At scale the posting table is written
bucketed by term so term lookups avoid a shuffle.

Tokenization is whitespace-based here; a CJK analyzer (jieba) would slot
in as a pandas-UDF tokenizer with a per-worker lazily-initialized model
(SURVEY.md §7.3) — not bundled in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", cjk: bool = False
) -> DataFrame:
    """Inverted index: one row per (term, doc_id) with term frequency.

    ``cjk=True`` switches to the CJK-aware tokenizer (jieba when present,
    char bigrams otherwise — functions/cjk.py); default is the whitespace
    analyzer whose behavior the SQL oracle mirrors exactly.
    """
    if cjk:
        from deva_spark.functions.cjk import tokenize_cjk

        terms = F.explode(tokenize_cjk(F.lower(F.col(text_col))))
    else:
        terms = F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), terms.alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_freq(index: DataFrame) -> DataFrame:
    return index.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def search(
    index: DataFrame,
    n_docs: int | DataFrame,
    query: str,
    top_k: int = 10,
    require_all: bool = True,
) -> DataFrame:
    """TF-IDF ranked search. ``require_all=True`` = AND semantics (the
    Whoosh default the reference uses); False = OR.

    ``n_docs`` may be the corpus DataFrame: its count then stays inside the
    plan (broadcast scalar) instead of a driver ``.count()`` round-trip —
    one job instead of two.

    Returns (doc_id, score) ordered by score desc, doc_id — deterministic
    tie-break, rounded score.
    """
    terms = [t for t in query.lower().split() if t]
    if not terms:
        raise ValueError("empty query")
    q = index.sparkSession.createDataFrame([(t,) for t in set(terms)], "term string")
    # Postings restricted to the query terms FIRST: per-term document
    # frequency only needs that term's rows, so df comes from the
    # filtered slice instead of aggregating the whole posting table
    # (identical values — df(term) is a property of the term's postings).
    # At 100 TB with the posting table bucketed by term this is a
    # bucket-pruned lookup, not a corpus scan.
    matched = index.join(F.broadcast(q), "term")
    dfreq = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if isinstance(n_docs, DataFrame):
        nd = n_docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
        base = matched.crossJoin(F.broadcast(nd))
        n_expr = F.col("_n") + F.lit(1.0)
    else:
        base = matched
        n_expr = F.lit(float(n_docs + 1))
    scored = (
        base.join(F.broadcast(dfreq), "term")
        .withColumn(
            "w",
            (F.lit(1.0) + F.log(F.col("tf")))
            * F.log(n_expr / (F.col("df") + F.lit(1.0))),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("w"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    if require_all:
        scored = scored.filter(F.col("n_matched") == len(set(terms)))
    return (
        scored.select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(top_k)
    )


def keywords_tfidf(
    docs: DataFrame,
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """``extract('tags')`` / jieba-TFIDF analog (`search.py:179-207`):
    top-n TF-IDF terms per document. One index pass + a rank window.

    Pass a prebuilt (persisted) ``index`` to share one materialized
    posting table across keyword extraction and search — the IndexStream
    pattern: build once, query many."""
    from pyspark.sql import Window

    if index is None:
        index = build_index(docs, id_col, text_col)
    nd = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    dfreq = doc_freq(index)
    w = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("term"))
    return (
        index.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "w",
            (F.lit(1.0) + F.log(F.col("tf")))
            * F.log((F.col("_n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("doc_id", "term", F.round("w", 6).alias("w"), "rnk")
    )


def index_commit(
    docs_batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    cjk: bool = False,
    note: str = "",
) -> int:
    """INCREMENTAL index maintenance — the reference IndexStream indexes
    per arriving event (`/root/reference/deva/search.py:121-161`, Whoosh
    `update_document` inside the stream callback); re-expressed Spark-
    first, the standing index is a SNAPSHOT LINEAGE of posting batches:
    each arrival batch's postings (a pure per-doc function — exactly
    :func:`build_index` rows) append as one immutable snapshot version,
    so the index grows per batch with NO rebuild, concurrent readers
    keep their version, and a bad batch rolls back non-destructively
    (`sources.snapshots`). Returns the committed version.

    Doc ids must be new to the index (the append contract shared by
    every staged per-doc tier); re-crawled docs retract first
    (:func:`index_retract`), then re-commit — Whoosh's update_document
    = delete + add, same two steps.

    Scale shape: one batch-sized tokenize+groupBy per commit; search and
    doc-frequency read the merged lineage, whose per-term slices a
    bucketed layout would prune (the build_index docstring's contract).
    """
    from deva_spark.sources.snapshots import commit_snapshot

    postings = build_index(docs_batch, id_col, text_col, cjk=cjk)
    # mode="append" on an empty lineage already yields a first version
    # seeing exactly this directory, so no first-commit special case
    return commit_snapshot(
        postings, path, mode="append", note=note or "index batch append"
    )


def index_retract(
    spark, path: str, forget: DataFrame, note: str = ""
) -> int:
    """Remove a forget-list's docs from the standing index: postings are
    per-doc pure, so retraction is EXACTLY the anti-join contract
    (`operators.dedup.retract_rows`) committed as an overwrite version —
    readers at older versions still see the pre-retraction index, and
    `expire_snapshots` reclaims it on the governance schedule. Bounded
    forget batch by contract (broadcast anti-join, one index scan).

    Retraction is a read-modify-REWRITE, so the commit is conditional on
    the version it read (``require_parent`` — ADVICE r10): a concurrent
    ``index_commit`` append landing between the read and the manifest
    claim raises a conflict instead of vanishing from the new latest,
    and the loop recomputes the anti-join against the racer's version."""
    from deva_spark.operators.dedup import retract_rows
    from deva_spark.sources.snapshots import (
        SnapshotConflictError,
        commit_snapshot,
        read_snapshot,
        snapshot_versions,
    )

    for _attempt in range(20):
        versions = snapshot_versions(path)
        seen = versions[-1] if versions else None
        current = read_snapshot(spark, path, seen)
        kept = retract_rows(current, forget, id_col="doc_id")
        try:
            return commit_snapshot(
                kept,
                path,
                mode="overwrite",
                note=note or "index retraction",
                require_parent=seen,
            )
        except SnapshotConflictError:
            continue
    raise RuntimeError(
        f"index_retract lost 20 consecutive commit races under {path}"
    )


def read_index(spark, path: str, version: int | None = None) -> DataFrame:
    """The standing posting table at ``version`` (default latest) — feed
    it to :func:`search` / :func:`keywords_tfidf` / :func:`doc_freq`."""
    from deva_spark.sources.snapshots import read_snapshot

    return read_snapshot(spark, path, version)
