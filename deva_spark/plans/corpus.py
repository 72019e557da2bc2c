"""End-to-end training-corpus curation pipeline.

The north-star composition (BASELINE.json): everything a pretraining data
pipeline runs between "raw documents" and "training-ready corpus",
expressed as one lazy DataFrame flow plus one LSH pass:

    quality/language gate → exact dedup → near-dup removal (MinHash LSH)
    → token accounting → (optional) LLM annotation

Each stage is the operator already tested in isolation; this module wires
them with the keep/drop bookkeeping a real pipeline needs (what was
dropped, why, and how many tokens survive).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deva_spark.functions import minhash as mh
from deva_spark.functions import text as T


@dataclass
class CurationReport:
    input_docs: int
    after_quality: int
    after_exact_dedup: int
    after_near_dedup: int
    surviving_tokens: int


def curate(
    docs: DataFrame,
    min_quality: float = 40.0,
    lang: str | None = "en",
    near_dup_min_matches: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_report: bool = True,
    sigs: DataFrame | None = None,
) -> tuple[DataFrame, CurationReport | None]:
    """Return (curated corpus, stage-by-stage report).

    Keep-policy: lowest doc_id survives within any duplicate group (exact
    or near) — deterministic regardless of partitioning.

    ``with_report=False`` skips the per-stage counts — a pipeline that
    only needs the curated output stays ONE lazy plan. ``with_report=True``
    persists the gate output once and derives every stage count from a
    single aggregate over it (plus one count upstream of the gate), so the
    quality/fingerprint expressions and the LSH pass never re-run per
    counter.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        T.quality_score(F.col(text_col)).alias("q"),
        T.lang_id(F.col(text_col)).alias("lang_pred"),
        T.token_count(F.col(text_col)).alias("n_tokens"),
        T.fingerprint(F.col(text_col)).alias("fp"),
    )

    gated = base.filter(F.col("q") >= min_quality)
    if lang is not None:
        gated = gated.filter(F.col("lang_pred") == lang)

    # exact dedup: first (lowest id) per content fingerprint — the shuffle
    # key is the 16-byte digest, never the text
    w = Window.partitionBy("fp").orderBy("doc_id")
    exact = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if with_report:
        # one materialization feeds the LSH pass AND the stage counters
        exact = exact.persist()
        n_exact = exact.count()  # eager: exact is multi-referenced below
    # (with_report=False keeps ONE fully-lazy plan. exact is referenced
    # twice — the signature semi-join and the anti-join's left side — but
    # measured at sf0.1/sf0.01 both barrier options lose: a persist or
    # localCheckpoint here hides size estimates from AQE, the semi-join
    # drops its broadcast, and the whole funnel regresses 1.5-4x. The
    # double evaluation is of the gated scan only; the signature pass —
    # the expensive half — is staged/shared via `sigs`.)

    # near-dup: LSH pairs → drop the higher id of each pair (greedy,
    # deterministic; pairs are already id_a < id_b). When the caller holds
    # a corpus-wide signature table (signatures depend only on the text),
    # the gated subset's signatures are a semi-join against it — no second
    # signature pass.
    sub_sigs = (
        sigs.join(exact.select("doc_id"), "doc_id") if sigs is not None else None
    )
    pairs = mh.near_duplicates(
        exact, min_matches=near_dup_min_matches, sigs=sub_sigs
    )
    drop_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    curated = exact.join(drop_ids, "doc_id", "left_anti")
    out = curated.select("doc_id", "text", "q", "lang_pred", "n_tokens")
    if not with_report:
        return out, None
    n_input = base.count()  # pre-gate count: the only upstream re-scan
    n_quality = gated.count()
    agg = curated.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok")
    ).collect()[0]
    report = CurationReport(
        int(n_input), int(n_quality), int(n_exact), int(agg["n"]), int(agg["tok"] or 0)
    )
    exact.unpersist()
    return out, report


def curate_from_stats(
    stats: DataFrame,
    sigs: DataFrame | None = None,
    min_quality: float = 40.0,
    lang: str | None = "en",
    near_dup_min_matches: int = 6,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The :func:`curate` funnel over a PRE-STAGED per-doc stats table
    ``(doc_id, q, lang_pred, n_tokens, fp)`` plus shared similarity
    artifacts — the 100 TB shape where per-doc text statistics and the
    corpus-wide near-dup pair set are computed once by upstream jobs
    and every curation run is pure relational work over staged tables
    (no text expression, no re-scan of the raw corpus). Same
    keep-policy, identical rows to :func:`curate` with
    ``with_report=False`` (stats are exact per-doc functions of the
    text; a doc's MinHash signature is independent of the rest of the
    corpus, so full-corpus pairs restricted to both-endpoints-surviving
    equal pairs computed within the survivors). Output: curated
    ``(doc_id, q, lang_pred, n_tokens)``.

    ``pairs``: staged corpus-wide near-dup pair table
    ``(id_a, id_b, ...)`` at the same ``min_matches`` bar; when absent,
    the LSH pass runs here against ``sigs`` (required in that case).
    """
    from deva_spark.functions import minhash as _mh

    gated = stats.filter(F.col("q") >= min_quality)
    if lang is not None:
        gated = gated.filter(F.col("lang_pred") == lang)
    w = Window.partitionBy("fp").orderBy("doc_id")
    exact = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        # referenced by both pair-endpoint checks and the anti-join left
        # side: stage once (repo staging convention)
        .localCheckpoint(eager=False)
    )
    if pairs is not None:
        p = (
            pairs.select("id_a", "id_b")
            .join(exact.select(F.col("doc_id").alias("id_a")), "id_a")
            .join(exact.select(F.col("doc_id").alias("id_b")), "id_b")
        )
    else:
        if sigs is None:
            raise ValueError("curate_from_stats needs sigs or pairs")
        sub_sigs = sigs.join(exact.select("doc_id"), "doc_id")
        p = _mh.near_duplicates(
            exact, min_matches=near_dup_min_matches, sigs=sub_sigs
        )
    drop_ids = p.select(F.col("id_b").alias("doc_id")).distinct()
    return exact.join(drop_ids, "doc_id", "left_anti").select(
        "doc_id", "q", "lang_pred", "n_tokens"
    )


def curation_audit(
    stats: DataFrame,
    sigs: DataFrame | None = None,
    pairs: DataFrame | None = None,
    min_quality: float = 40.0,
    lang: str | None = "en",
    near_dup_min_matches: int = 6,
) -> DataFrame:
    """Per-doc provenance for the :func:`curate` funnel: WHY was each
    document kept or dropped, and to which surviving duplicate does a
    dropped one defer — the audit table a governed 100 TB pipeline must
    be able to produce for any document (data lineage / takedown
    response), not just the aggregate stage counts the report gives.

    Input is the staged per-doc stats table ``(doc_id, q, lang_pred,
    n_tokens, fp)`` (plus ``pairs`` or ``sigs`` exactly as
    :func:`curate_from_stats`). Output: ``(doc_id, verdict, dup_of)``
    for EVERY input doc, with the FIRST rejecting stage in funnel order:

    - ``quality``: ``q < min_quality`` (checked first, matching the
      gate order in :func:`curate` — a doc failing both gates reads
      ``quality``);
    - ``language``: wrong ``lang_pred``;
    - ``exact_dup``: an earlier (lower-id) gated doc has the same
      fingerprint — ``dup_of`` is that keeper;
    - ``near_dup``: dropped by the LSH pass — ``dup_of`` is the
      smallest lower-id partner it was paired with (the pair that
      dropped it; in a duplicate CHAIN that partner may itself read
      ``near_dup``, so follow ``dup_of`` transitively for the ultimate
      survivor — the greedy drop-every-``id_b`` policy is pairwise, not
      clustered);
    - ``kept``: in the curated output.

    The exact-keeper is a conditional window min (min gated doc_id per
    fingerprint, computed in the same pass as the gate flags — no
    self-join), and the verdicts for the whole corpus assemble from two
    broadcast-sized left joins; row count always equals the input.
    kept-rows == :func:`curate_from_stats` output (parity-tested).
    """
    from deva_spark.functions import minhash as _mh

    gate_q = F.col("q") >= min_quality
    gate_l = F.lit(True) if lang is None else F.col("lang_pred") == lang
    flagged = stats.withColumn(
        "_keep_fp",
        F.min(F.when(gate_q & gate_l, F.col("doc_id"))).over(
            Window.partitionBy("fp")
        ),
    )
    surv = flagged.filter(F.col("doc_id") == F.col("_keep_fp")).select("doc_id")
    if pairs is not None:
        p = (
            pairs.select("id_a", "id_b")
            .join(surv.select(F.col("doc_id").alias("id_a")), "id_a")
            .join(surv.select(F.col("doc_id").alias("id_b")), "id_b")
        )
    else:
        if sigs is None:
            raise ValueError("curation_audit needs sigs or pairs")
        p = _mh.near_duplicates(
            surv, min_matches=near_dup_min_matches,
            sigs=sigs.join(surv, "doc_id"),
        )
    near = p.groupBy(F.col("id_b").alias("doc_id")).agg(
        F.min("id_a").alias("_near_of")
    )
    return (
        flagged.join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(~gate_q, F.lit("quality"))
            .when(~gate_l, F.lit("language"))
            .when(F.col("_keep_fp") != F.col("doc_id"), F.lit("exact_dup"))
            .when(F.col("_near_of").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
            F.when(
                gate_q & gate_l & (F.col("_keep_fp") != F.col("doc_id")),
                F.col("_keep_fp"),
            )
            .otherwise(F.col("_near_of"))
            .alias("dup_of"),
        )
    )


def contamination_counts(
    docs: DataFrame,
    bench_docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination check: for every corpus doc, count the
    distinct word ``n``-grams it shares with the benchmark set
    (the pre-training hygiene step: docs overlapping an eval set leak
    test answers into training). Returns ``(doc_id, n_shared)`` for docs
    with at least one shared n-gram.

    Scale shape: both sides explode to (id, xxhash64(shingle)) — the join
    key is an 8-byte hash, never the n-gram text — and the benchmark side
    is distinct-projected to one row per shingle. Benchmark sets are
    tiny relative to the corpus (MBs vs TBs), so AQE broadcasts the
    benchmark shingle set and the corpus side never shuffles; the count
    aggregates map-side per doc id. Long n-grams (n=5 default, 13 in
    production) make stopword-run collisions negligible.
    """
    def shingle_hashes(df: DataFrame) -> DataFrame:
        # Project the split words FIRST — inlining words(text) into the
        # shingle lambda repeats the regexp split n+2 times in generated
        # code (13s -> 1.4s on x45-shaped plans at sf0.1).
        return (
            df.select(F.col(id_col).alias("_id"), T.words(F.col(text_col)).alias("_ws"))
            .select(
                "_id",
                F.explode(
                    F.array_distinct(T.shingles_from_words(F.col("_ws"), n=n))
                ).alias("_s"),
            )
            .select("_id", F.xxhash64("_s").alias("_sh"))
        )

    bench_sh = shingle_hashes(bench_docs).select("_sh").distinct()
    return (
        shingle_hashes(docs)
        .join(bench_sh, "_sh")
        .groupBy(F.col("_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def contamination_counts_prehashed(
    corpus_sh: DataFrame, bench_sh: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """`contamination_counts` over an existing ``(_id, _sh)`` shingle-hash
    index (the share-one-explode path: one materialized index serves
    every hygiene job). ``bench_sh`` needs only ``_sh``."""
    return (
        corpus_sh.join(bench_sh.select("_sh").distinct(), "_sh")
        .groupBy(F.col("_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def _common_shingles(exploded: DataFrame, min_docs: int) -> DataFrame:
    """Shingle hashes occurring in >= ``min_docs`` rows, counted with the
    salted two-phase aggregation: shingle frequency is power-law (a
    stopword run can appear in nearly every document), and while hash-agg
    partial aggregation usually absorbs hot keys map-side, it degrades to
    pass-through when the map-side table spills at 100 TB shingle
    cardinality — the salt bounds any single reducer's share of a hot key
    by 1/n_salts regardless. Returns ``(_sh, _hit=1)``."""
    from deva_spark.operators.skew import salted_group_agg

    counts = exploded.transform(
        salted_group_agg(["_sh"], {"_docs": (F.count(F.lit(1)), F.sum)})
    )
    return counts.filter(F.col("_docs") >= min_docs).select(
        "_sh", F.lit(1).alias("_hit")
    )


def boilerplate_stats_prehashed(
    exploded: DataFrame, min_docs: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """`boilerplate_stats` over an existing ``(_id, _sh)`` index.

    Shape: salted per-shingle counts (see :func:`_common_shingles` — NOT
    a count-over-window partitioned by ``_sh``, which would concentrate a
    hot shingle's entire row set in one task with no partial
    aggregation), then a tag join back onto the index and a map-side-
    combining per-doc aggregation. The tag join is 1:0-or-1 per row (no
    fan-out) and AQE's skew-join splitting covers its shuffle."""
    common = _common_shingles(exploded, min_docs)
    return (
        exploded.join(common, "_sh", "left")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_common"),
        )
    )


def boilerplate_stats(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document boilerplate signal: of a doc's distinct word
    ``n``-grams, how many occur in at least ``min_docs`` distinct
    documents corpus-wide (headers, footers, licence blurbs, templated
    spans — the RefinedWeb-style "repeated across the crawl" filter).
    Returns ``(doc_id, n_shingles, n_common)``; callers threshold the
    ratio by integer cross-multiplication (``n_common * D > n_shingles
    * N`` for N/D), never a float divide.

    Scale shape: ONE explode of the corpus to ``(doc_id,
    xxhash64(shingle))`` — per-doc distinct, so a doc contributes each
    n-gram once per reference (production paths read a staged shingle
    index and call :func:`boilerplate_stats_prehashed`, which scans
    parquet instead of re-shingling). No step is
    proportional to pair counts (unlike near-dup joins) — linear in
    corpus token count, and the hot-shingle shuffle is salt-bounded
    (see :func:`_common_shingles`).
    """
    exploded = (
        docs.select(F.col(id_col).alias("_id"), T.words(F.col(text_col)).alias("_ws"))
        .select(
            "_id",
            F.explode(
                F.array_distinct(T.shingles_from_words(F.col("_ws"), n=n))
            ).alias("_s"),
        )
        .select("_id", F.xxhash64("_s").alias("_sh"))
    )
    return boilerplate_stats_prehashed(exploded, min_docs=min_docs, id_col=id_col)
