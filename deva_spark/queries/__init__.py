"""Declared correctness queries (SURVEY.md §2.12) + extended pipeline ops.

Each entry pairs a Spark DataFrame implementation (built from the operator
library) with an ANSI-SQL oracle string that DuckDB runs over the same
parquet views. The driver hash-compares sorted values per column name, so
every computed column is aliased identically on both sides.

Determinism contract (SURVEY.md §7.3):
  * order-sensitive ops key on the explicit (ts, event_id) total order;
  * money sums cast to DECIMAL before SUM so the result is independent of
    partition/accumulation order, then ROUND(...,2) and cast back to double
    (identical rounding semantics: both engines round half away from zero);
  * ratio thresholds use integer cross-multiplication (no float boundary);
  * similarity scores are rounded before ranking with an id tie-break.

Package layout (VERDICT r11 #7 — the registry grew ~500 lines/round as
one module; split into themed tiers, re-exported here so the driver
contract ``deva_spark.queries.SPARK_QUERIES`` / ``ORACLE_SQL`` and every
``Q.<name>`` consumers use are untouched):

  * ``_infra``       registry decorator, table loads, staged artifacts
  * ``declared``     q01-q35, the declared-query contract
  * ``similarity``   x01-x32: text metrics, near-dup, ANN, rel. extensions
  * ``curation``     x33-x59: streaming drains, curation, sampling
  * ``analytics``    x60-x72: sketches, pagerank, funnels, weighted sampling
  * ``incremental``  x73-x99: incremental tiers, retraction, skew/zorder
  * ``multimodal``   x100-x111: chunking, IVF-PQ, CJK, codecs, chain CC

Submodule import ORDER below is registration order (pre-rotation); the
driver window itself is canonicalized by ``_rotate_registry`` at the end
of this file, so the split cannot silently reorder the first 50.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from deva_spark.queries._infra import (  # noqa: F401 -- public re-exports
    ORACLE_SQL,
    SPARK_QUERIES,
    query,
    stage_artifacts,
    staged_artifact_path,
    _t,
)
from deva_spark.session import load_tables  # noqa: F401 -- Q.load_tables

# registration happens at import, in this order (q01..q35, x01..x111)
from deva_spark.queries import declared  # noqa: E402,F401
from deva_spark.queries import similarity  # noqa: E402,F401
from deva_spark.queries import curation  # noqa: E402,F401
from deva_spark.queries import analytics  # noqa: E402,F401
from deva_spark.queries import incremental  # noqa: E402,F401
from deva_spark.queries import multimodal  # noqa: E402,F401
from deva_spark.queries.multimodal import flagship  # noqa: F401


# ---------------------------------------------------------------------------
# Driver-window rotation (VERDICT r2 "Next round" #1): the driver's
# CORRECTNESS file records the FIRST 50 registered queries only, so the
# registry reorders itself each round to put the queries that most need
# a driver row first. Round-12 window (VERDICT r11 #1): (a) the six r11
# deferrals — the ONLY entries whose latest driver evidence is r8, the
# oldest in the registry — lead; (b) every entry whose latest green is
# r9 (42 of them — the full r9-stale cohort, so after this window no
# entry's latest green is older than r10); (c) this round's new
# registrations x110+ (auto-append: 48 + 2 new = exactly 50). The
# deferral backlog closes EMPTY. Local tooling
# (tools/check_correctness.py, bench.py) still runs every entry.
# ---------------------------------------------------------------------------

_DRIVER_FIRST: tuple[str, ...] = (
    # the r11 deferrals: latest driver row r8 — the registry's oldest
    # evidence, first in line as VERDICT r11 #1 requires
    "x18_lineitem_part_join",
    "x25_session_stats",
    "x26_histogram",
    "x27_pivot_counts",
    "x29_rolling_hash",
    "x53_hourly_trending",
    # the full r9-stale cohort (latest driver row r9), 42 entries —
    # after this round every registry entry's newest green is >= r10
    "q01_scan_project",
    "q02_filter",
    "q04_avg_min_max",
    "q05_distinct",
    "q07_consecutive_dedup",
    "q08_inner_join",
    "q09_left_join_coalesce",
    "q10_semi_join",
    "q11_anti_join",
    "q12_multiway_join",
    "q13_positional_zip",
    "q16_sliding_window_avg",
    "q17_partition_chunks",
    "q18_tumbling_time_window",
    "q19_rank_topk_per_key",
    "q21_topk",
    "q22_slice",
    "q23_union",
    "q24a_intersect",
    "q24b_except",
    "q25_string_fns",
    "q26_regexp_extract",
    "q27_date_trunc",
    "q28_math_fns",
    "q29_explode_words",
    "q30_frequencies",
    "q31_percentile",
    "q32_rollup",
    "q33_zscore_anomaly",
    "q34_exact_text_dedup",
    "x101_ivfpq_adc_search",
    "x102_ivfpq_rerank_search",
    "x103_ivfpq_append_search",
    "x104_cjk_bigram_token_freq",
    "x10_label_centroids",
    "x11_json_extract",
    "x12_tfidf_keywords",
    "x14_case_route",
    "x21_rolling_time_window",
    "x23_cosine_neardup",
    "x66_semdedup_prune",
    "x88_incremental_cosine_neardup",
)

#: Round-12 closes with the deferral backlog EMPTY (VERDICT r11 #1's
#: "keep _DEFERRED_TO_NEXT empty at close"): the window holds the six
#: r8-stale entries + all 42 r9-stale entries + the two new
#: registrations (x110/x111) — nothing left over. Everything outside
#: the window is r10- or r11-green, which the accounting test below
#: verifies directly against those CORRECTNESS files.
_DEFERRED_TO_NEXT: tuple[str, ...] = ()

#: Queries registered this round get their FIRST driver row ahead of the
#: long-stable tail. Numeric threshold (ADVICE r4: the old lexicographic
#: ``k >= "x50"`` silently mis-sorted a future "x100").
_NEW_MIN_ID = 110  # x110+ = new in r12



def _query_num(name: str) -> int | None:
    m = re.match(r"x(\d+)_", name)
    return int(m.group(1)) if m else None


def _new_this_round() -> tuple[str, ...]:
    return tuple(
        k
        for k in SPARK_QUERIES
        if (num := _query_num(k)) is not None
        and num >= _NEW_MIN_ID
        and k not in _DRIVER_FIRST
    )


def _rotate_registry() -> None:
    first = _DRIVER_FIRST + _new_this_round()
    # The driver records only the first 50 rows: overflowing the window
    # would silently un-verify whatever lands past it (ADVICE r4). Clip
    # rather than assert — an import-time crash would take down EVERY
    # query, which is far worse than the newest additions falling to the
    # tail until the next rotation.
    if len(first) > 50:
        import warnings

        warnings.warn(
            f"driver window overflow: {len(first)} > 50 — rotate "
            "_DRIVER_FIRST; newest additions fall past the driver window",
            stacklevel=2,
        )
        first = first[:50]
    for d in (SPARK_QUERIES, ORACLE_SQL):
        head = {k: d[k] for k in first if k in d}
        tail = {k: v for k, v in d.items() if k not in head}
        d.clear()
        d.update(head)
        d.update(tail)


_rotate_registry()
