"""Corpus-trained byte-pair-encoding (BPE) subword vocabulary.

The public algorithm is Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016): start from a
character segmentation of the corpus's words (with an end-of-word
marker), then repeatedly merge the most frequent adjacent symbol pair.
The reference prices text in whitespace/jieba tokens (its analyzer
surface, /root/reference/deva/search.py:13-15); a real loader pipeline
budgets per-source tokens (x54) and packs sequences (x46) in TRAINED
subword tokens — this module closes that gap (VERDICT r13 "next" #4).

Spark shape — the corpus-scale insight is that BPE training never
touches the corpus after ONE aggregation:
  * ``word_counts`` is the only corpus-wide job: lowercase, split,
    explode, groupBy word — a standard shuffle keyed on the word, with
    map-side partial aggregation. Its output (the distinct-word
    frequency table) is the synopsis every later step runs on; at
    100 TB the corpus is petabytes but the vocabulary is millions of
    rows.
  * each merge round is one aggregation OVER THE SYNOPSIS: explode
    adjacent symbol pairs (weighted by word freq), sum, take the
    argmax — a 1-row driver collect per round, bounded by contract.
  * applying a merge is pure JVM string algebra (``F.replace`` on the
    space-joined segmentation via a double-space encoding that makes
    non-overlapping left-to-right replacement equal BPE's greedy scan
    — see ``_apply_merge``), no UDF anywhere.
  * segmenting DOCUMENTS with the trained vocab is a broadcast-size
    join (word -> final segmentation) — no per-token work at all.

Determinism contract: the argmax tie-breaks on (freq DESC, lhs ASC,
rhs ASC) in binary string order — identical in Spark and DuckDB for
the ASCII symbol space — so the merge table is a pure function of the
corpus and the DuckDB oracle can replay the identical loop unrolled
(queries x120/x121).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

#: end-of-word marker symbol (Sennrich 2016); '<' sorts before 'a'-'z'
#: identically in Spark and DuckDB binary string order
EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", word_pattern: str = "[^a-z]+"
) -> DataFrame:
    """The one corpus-scale job: ``(word, freq, seg)`` for every
    distinct lowercased word, ``seg`` the initial character
    segmentation + end-of-word marker. Everything downstream runs on
    this synopsis."""
    w = (
        docs.select(
            F.explode(
                F.split(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    word_pattern,
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return w.withColumn(
        "seg",
        F.concat(F.concat_ws(" ", F.split(F.col("word"), "")), F.lit(" " + EOW)),
    )


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(lhs, rhs, freq) summed over every adjacent symbol pair of every
    word's current segmentation, weighted by word frequency. Words
    reduced to a single symbol carry no pairs (and the size >= 2 guard
    keeps ``sequence`` ascending — Spark's sequence(0, -1) counts
    DOWN)."""
    syms = words.select(
        "freq", F.split(F.col("seg"), " ").alias("_syms")
    ).filter(F.size("_syms") >= 2)
    pairs = syms.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(0, size(_syms) - 2),"
                " i -> struct(_syms[i] AS lhs, _syms[i + 1] AS rhs))"
            )
        ).alias("_p"),
    )
    return pairs.groupBy(
        F.col("_p.lhs").alias("lhs"), F.col("_p.rhs").alias("rhs")
    ).agg(F.sum("freq").alias("freq"))


def _apply_merge(seg: Column, lhs: str, rhs: str) -> Column:
    """Merge every occurrence of the adjacent pair (lhs, rhs) in a
    space-joined segmentation — the double-space encoding gives every
    symbol its own delimiter on both sides, so plain non-overlapping
    left-to-right ``replace`` implements exactly BPE's greedy scan
    ('a a a' + (a,a) -> 'aa a'), with semantics identical in Spark and
    DuckDB (parity pinned in tests and by the x120 oracle)."""
    padded = F.concat(
        F.lit(" "), F.replace(seg, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    merged = F.replace(
        padded,
        F.lit(f" {lhs}  {rhs} "),
        F.lit(f" {lhs}{rhs} "),
    )
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


#: Vocabulary-size cutover for the driver training path in
#: :func:`train_bpe` — the graphs.DRIVER_MAX_EDGES pattern: below this
#: many distinct words the synopsis is collected and the merge loop
#: runs in plain Python (one job total instead of one aggregation +
#: 1-row collect PER ROUND), above it the distributed loop runs. A
#: (word, freq, seg) row is ~100 B of Python objects, so the default
#: bounds the collect at ~40 MB of driver heap.
DRIVER_MAX_WORDS_CONF = "spark.deva.bpe.driverMaxWords"
DRIVER_MAX_WORDS_DEFAULT = 400_000


def _driver_train(
    rows, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], list[tuple[str, int, str]]]:
    """Small-vocabulary path: the identical Sennrich merge loop over the
    collected synopsis. Same argmax tie-break as the distributed loop —
    (freq DESC, lhs ASC, rhs ASC); ``word_counts`` emits pure
    ``[a-z]``+EOW symbols, so Python's code-point string order equals
    Spark/DuckDB binary UTF8 order. Greedy left-to-right
    non-overlapping merge application — exactly what the double-space
    ``replace`` encoding implements distributed (parity pinned in
    tests). Returns (merge table, final (word, freq, seg) rows)."""
    segs: dict[str, list[str]] = {}
    freqs: dict[str, int] = {}
    for r in rows:
        segs[r["word"]] = r["seg"].split(" ")
        freqs[r["word"]] = int(r["freq"])
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break  # degenerate corpus: nothing left to merge
        (lhs, rhs), f = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, int(f)))
        fused = lhs + rhs
        for w, syms in segs.items():
            if lhs not in syms:
                continue
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    final = [(w, freqs[w], " ".join(syms)) for w, syms in segs.items()]
    return merges, final


def train_bpe(
    words: DataFrame,
    n_merges: int,
    keep_cached: bool = False,
    driver_threshold: int | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE merge rounds over a ``word_counts`` table.
    Returns ``(merge_table, final_words)``: the learned merges as
    ``(step, lhs, rhs, freq)`` rows and the words DataFrame with its
    final segmentation.

    Each round collects exactly ONE row (the argmax pair — bounded by
    contract); the synopsis itself is never driver-side. ``words`` is
    persisted for the duration (it is re-scanned once per round) and
    unpersisted before returning — UNLESS ``keep_cached`` is set: the
    returned final DataFrame is built ON TOP of the cached synopsis, so
    a caller that materializes it afterwards (the ``bpe_seg`` artifact
    write) would otherwise re-run the corpus-scale word-count
    aggregation a second time (review r14); with ``keep_cached`` the
    caller owns the lifecycle (``final.sparkSession.catalog
    .clearCache()`` or unpersisting via the input handle). Training
    stops early only if no pair remains (every word fused to a single
    symbol)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if driver_threshold is None:
        driver_threshold = int(
            words.sparkSession.conf.get(
                DRIVER_MAX_WORDS_CONF, str(DRIVER_MAX_WORDS_DEFAULT)
            )
        )
    words = words.persist()
    n_words = words.count()  # materialize once; adaptive-path probe
    if n_words <= driver_threshold:
        # Adaptive small-vocabulary cutover (r14 optimization pass):
        # each distributed round is a full aggregation job + 1-row
        # collect over a synopsis that FITS ON THE DRIVER — at test
        # scale 12 rounds paid ~35 s of per-round job latency for
        # milliseconds of work. Collect the synopsis once (bounded by
        # driver_threshold rows of (word, freq, seg) — driver-side by
        # design, the graphs.DRIVER_MAX_EDGES contract), run the
        # identical loop in Python, and hand back a driver-built final
        # table. Result is a pure function of the corpus, identical
        # across paths (parity-tested).
        try:
            rows = words.select("word", "freq", "seg").collect()
        finally:
            # unconditional on this path (ADVICE r14): the returned
            # final DataFrame is DRIVER-BUILT, so keep_cached's
            # rationale (final is built on the cached synopsis) only
            # holds for the distributed loop below — leaving the
            # synopsis persisted here would linger with no consumer
            words.unpersist()
        merges, final_rows = _driver_train(rows, n_merges)
        final = words.sparkSession.createDataFrame(
            final_rows, "word string, freq long, seg string"
        )
        return merges, final
    try:
        merges = []
        cur = words
        for step in range(n_merges):
            best = (
                _adjacent_pairs(cur)
                .orderBy(F.desc("freq"), "lhs", "rhs")
                .limit(1)
                .collect()  # 1 row: the argmax pair, bounded by contract
            )
            if not best:
                break  # degenerate corpus: nothing left to merge
            lhs, rhs, freq = best[0].lhs, best[0].rhs, int(best[0].freq)
            merges.append((step, lhs, rhs, freq))
            cur = cur.withColumn("seg", _apply_merge(F.col("seg"), lhs, rhs))
        return merges, cur
    finally:
        if not keep_cached:
            words.unpersist()


def merges_df(spark: SparkSession, merges: list) -> DataFrame:
    """Merge table as a DataFrame — ``(step, lhs, rhs, freq)``."""
    return spark.createDataFrame(
        [(int(s), l, r, int(f)) for s, l, r, f in merges],
        "step int, lhs string, rhs string, freq long",
    )


def apply_merges(
    words: DataFrame, merges: list, word_col: str = "word"
) -> DataFrame:
    """Segment (possibly UNSEEN) words with an already-trained merge
    table — the deployment half of the tokenizer: tomorrow's crawl is
    tokenized with today's vocabulary, never retrained per batch. The
    merges apply in training order as chained JVM ``replace`` algebra
    on the character segmentation (the same double-space encoding as
    training, so application == what training WOULD have produced for
    words it saw). ``merges`` rows are ``(step, lhs, rhs, freq)``
    tuples or Rows; 10-100 merges compose into one codegen projection.
    Adds a ``seg`` column."""
    seg: Column = F.concat(
        F.concat_ws(" ", F.split(F.col(word_col), "")), F.lit(" " + EOW)
    )
    for m in sorted(merges, key=lambda m: int(m[0])):
        seg = _apply_merge(seg, str(m[1]), str(m[2]))
    return words.withColumn("seg", seg)


def batch_token_counts(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_pattern: str = "[^a-z]+",
) -> DataFrame:
    """Per-document token counts for a FRESH batch under a trained
    merge table — ``(id, n_tokens)``. The batch's DISTINCT words
    segment once via :func:`apply_merges` (the per-batch vocabulary is
    the synopsis), then broadcast-join back to the per-doc word list:
    the incremental-pricing shape (staged merges + batch-sized work),
    no corpus access at all."""
    doc_words = docs.select(
        id_col,
        F.explode(
            F.split(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))), word_pattern
            )
        ).alias("word"),
    ).filter(F.col("word") != "")
    vocab = F.broadcast(
        apply_merges(doc_words.select("word").distinct(), merges).select(
            "word", F.size(F.split("seg", " ")).alias("_n_sub")
        )
    )
    return (
        doc_words.join(vocab, "word")
        .groupBy(id_col)
        .agg(F.sum("_n_sub").alias("n_tokens"))
    )


def token_counts(
    docs: DataFrame,
    final_words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_pattern: str = "[^a-z]+",
) -> DataFrame:
    """Per-document subword token counts under the trained vocabulary —
    ``(id, n_tokens)``. A broadcast-size join of each document's words
    against the final ``word -> segmentation`` table (the vocabulary is
    the synopsis; no per-token work): the surface a loader pipeline's
    token budgeting (x54) and packing (x46) actually price."""
    doc_words = docs.select(
        id_col,
        F.explode(
            F.split(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))), word_pattern
            )
        ).alias("word"),
    ).filter(F.col("word") != "")
    vocab = F.broadcast(
        final_words.select(
            "word", F.size(F.split("seg", " ")).alias("_n_sub")
        )
    )
    return (
        doc_words.join(vocab, "word")
        .groupBy(id_col)
        .agg(F.sum("_n_sub").alias("n_tokens"))
    )
