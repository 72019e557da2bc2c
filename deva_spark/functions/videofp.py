"""Video temporal near-dup: frame-sampled perceptual hashes + aligned
banded matching.

Completes the media-dedup triad (text: simhash/minhash; image:
:mod:`deva_spark.functions.imagehash` x115; audio:
:mod:`deva_spark.functions.audiofp` x116): a crawled video corpus
carries the same CLIP re-encoded, brightness-shifted and TRIMMED many
times over — invisible to byte dedup AND to single-frame digests
(x108/x112 audit exact per-frame digests; a one-frame trim breaks every
one of them). The public shape is frame-fingerprint matching with
temporal alignment (the video analog of Wang-2003 landmark offsets, as
used by every public near-dup-video system since VisualRank/LSH video
copy detection): hash sampled frames perceptually, match frames across
videos, then require the matches to agree on ONE temporal offset —
re-encodes keep per-frame hashes within a few bits, trims shift all of
them by a constant offset, and unrelated videos can't assemble several
aligned 64-bit coincidences.

Scale shape (identical to the image tier, per frame instead of per
image): hashing is one Arrow pass (decode + dhash per sampled frame, no
shuffle); matching shuffles (band, 16-bit chunk) keys — the k+1
pigeonhole banding of :mod:`imagehash` — then two aggregations on
candidate pair keys (per-offset count, per-pair max). Nothing is
all-pairs; the incremental variant joins batch-vs-staged-corpus only.

Reference parity: the reference has no video operators at all (its
crawler just moves raw media bytes,
/root/reference/deva/core/core.py:1655); this tier is part of the
training-data extension the brief makes first-class.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from deva_spark.functions import imagehash
from deva_spark.functions.imagehash import dhash64
from deva_spark.functions.multimodal import decode_avi


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "video_id",
    content_col: str = "content",
    decoder: Callable[[bytes], np.ndarray] = decode_avi,
    sample_every: int = 1,
) -> DataFrame:
    """One Arrow pass: decode each video payload, sample every
    ``sample_every``-th frame, dhash64 each sampled frame — one row per
    sampled frame: ``(id, frame_idx, dhash)``. ``frame_idx`` counts
    SAMPLED frames (0, 1, 2, ...), so temporal offsets downstream are in
    sample units regardless of stride.

    Per-row fault isolation (the audiofp contract): an undecodable
    payload contributes ZERO rows instead of killing the Arrow stage —
    invisible to dedup, auditable by anti-joining ids against the
    source."""
    if sample_every < 1:
        raise ValueError(f"sample_every must be >= 1, got {sample_every}")
    out_schema = f"{id_col} long, frame_idx int, dhash long"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for vid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    clip = decoder(bytes(content))
                except (ValueError, NotImplementedError):
                    continue  # bad payload: zero rows, job survives
                for j, t in enumerate(
                    range(0, clip.shape[0], sample_every)
                ):
                    rows.append((int(vid), j, dhash64(clip[t])))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "dhash"]
            )

    return df.mapInPandas(run, schema=out_schema)


def _frame_banded(
    fh: DataFrame, id_col: str, frame_col: str, max_distance: int
) -> DataFrame:
    """(video, frame, hash) exploded over the k+1 disjoint 16-bit
    chunks — the pigeonhole banding of imagehash._banded, carrying the
    frame index through."""
    n_chunks = max_distance + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1 if width < 64 else -1
    h = F.col("dhash")
    chunks = F.array(
        *[
            F.shiftrightunsigned(h, i * width).bitwiseAND(F.lit(mask))
            for i in range(n_chunks)
        ]
    )
    return fh.select(
        F.col(id_col).alias("_vid"),
        F.col(frame_col).alias("_fid"),
        h.alias("_h"),
        F.posexplode(chunks).alias("_band", "_chunk"),
    )


def _validate(max_distance: int, threshold: int, threshold_name: str) -> None:
    if not 0 <= max_distance <= 3:
        raise ValueError(
            "max_distance must be 0..3 (16-bit bands stop pruning past "
            f"that), got {max_distance}"
        )
    if threshold < 1:
        raise ValueError(
            f"{threshold_name} must be >= 1, got {threshold}"
        )


def _frame_candidates(
    a: DataFrame, b: DataFrame, ordered: bool
) -> DataFrame:
    """Banded equality join of two (pre-banded) frame-hash sides ->
    candidate frame pairs ``(id_a, id_b, _fa, _fb, _ha, _hb)``.
    ``ordered`` adds ``id_a < id_b`` (the self-join form); the
    cross-table form instead EXCLUDES equal ids — a video whose frame
    hashes sit in both corpus and batch (a re-submitted batch, a
    rebuilt staged table) must not report itself as its own duplicate
    (review r14)."""
    a, b = a.alias("a"), b.alias("b")
    on = [
        F.col("a._band") == F.col("b._band"),
        F.col("a._chunk") == F.col("b._chunk"),
        F.col("a._vid") < F.col("b._vid")
        if ordered
        else F.col("a._vid") != F.col("b._vid"),
    ]
    return a.join(b, on=on).select(
        F.col("a._vid").alias("id_a"),
        F.col("b._vid").alias("id_b"),
        F.col("a._fid").alias("_fa"),
        F.col("b._fid").alias("_fb"),
        F.col("a._h").alias("_ha"),
        F.col("b._h").alias("_hb"),
    )


def _verified_matches(cand: DataFrame, max_distance: int) -> DataFrame:
    """Exact JVM-side verify, BEFORE any exchange (guide §2.3): the
    ``bit_count`` filter drops failing candidates map-side — up to k+1
    band copies per frame pair never shuffle. Band copies of a
    SURVIVING frame pair are still present (identical rows); the
    downstream aggregations dedup them with ``count_distinct`` instead
    of a separate ``dropDuplicates`` exchange that would carry the two
    8-byte hashes per row."""
    return cand.filter(
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= max_distance
    )


def _aligned_pairs(
    cand: DataFrame, max_distance: int, min_aligned: int
) -> DataFrame:
    """Candidate frame matches -> temporally aligned video pairs.

    Verify is JVM-side ``bit_count`` on the deduped candidates; then
    the TEMPORAL step: group matches by (pair, offset = frame_b -
    frame_a) and keep the pair's best-supported offset. A re-encode
    matches at offset 0, a head-trim of t frames at offset -t; unrelated
    videos would need ``min_aligned`` independent <=``max_distance``-bit
    64-bit coincidences AT THE SAME OFFSET (P ~ (2.4e-15)^min_aligned
    per offset) — the alignment is what turns frame-level noise
    tolerance into video-level selectivity."""
    matches = _verified_matches(cand, max_distance).withColumn(
        "offset", F.col("_fb") - F.col("_fa")
    )
    # count_distinct: band copies of one frame match collapse here (the
    # offset fixes _fb given _fa, so distinct _fa == distinct matches)
    per_offset = matches.groupBy("id_a", "id_b", "offset").agg(
        F.count_distinct("_fa").alias("aligned")
    )
    return (
        per_offset.groupBy("id_a", "id_b")
        .agg(
            F.max("aligned").alias("aligned"),
            # deterministic under ties: best-supported offset, smallest
            # offset wins a tie (max_by on (aligned, -offset))
            F.expr(
                "max_by(offset, struct(aligned, -offset))"
            ).alias("offset"),
        )
        .filter(F.col("aligned") >= min_aligned)
    )


def video_neardup_pairs(
    frame_hashes: DataFrame,
    id_col: str = "video_id",
    frame_col: str = "frame_idx",
    max_distance: int = 3,
    min_aligned: int = 4,
) -> DataFrame:
    """All video pairs sharing ``min_aligned`` or more frame matches at
    one temporal offset — ``(id_a, id_b, aligned, offset)`` with
    ``id_a < id_b``. Frame matches come from the k+1-chunk banded
    self-join (pigeonhole: hamming <= ``max_distance`` implies one equal
    16-bit chunk) + exact ``bit_count`` verify, exactly the image-tier
    discipline per frame; the offset vote then enforces temporal
    consistency (see :func:`_aligned_pairs`). ``max_distance`` caps at
    3 for the same honest reason as imagehash: wider radii stop pruning
    in 16-bit bands."""
    _validate(max_distance, min_aligned, "min_aligned")
    # Materialize the frame-hash synopsis BEFORE the banded self-join
    # (guide §2.4/§5): both branches hang off the same opaque Arrow
    # stage (AVI decode + per-frame dhash — for the registry tiers,
    # video SYNTHESIS too), and an unmaterialized lineage runs that
    # pass once PER BRANCH (plans/r14/x118: 4 MapInPandas + 2 scans
    # before, 2 + 1 after). (id, frame_idx, dhash) rows — tiny; the
    # eager count() guarantees both join stages read cache. Registered
    # in the shared release registry (ADVICE r14).
    frame_hashes = frame_hashes.persist()
    frame_hashes.count()
    imagehash._SYNOPSIS_CACHE.append(frame_hashes)
    sides = _frame_banded(frame_hashes, id_col, frame_col, max_distance)
    return _aligned_pairs(
        _frame_candidates(sides, sides, ordered=True),
        max_distance,
        min_aligned,
    )


def video_neardup_unordered(
    frame_hashes: DataFrame,
    id_col: str = "video_id",
    frame_col: str = "frame_idx",
    max_distance: int = 3,
    min_shared: int = 3,
) -> DataFrame:
    """Order-FREE variant of :func:`video_neardup_pairs` —
    ``(id_a, id_b, shared)`` for pairs sharing ``min_shared``+ matched
    frames regardless of temporal position. This is the tier that
    catches FRAME-RATE-RESAMPLED twins (the honest boundary of the
    offset vote: dropping every other frame maps source frame 2j to
    twin frame j, so pairwise offsets VARY and no single offset
    accumulates support — but the matched-frame COUNT is untouched).
    Selectivity trades down accordingly: an unrelated pair needs
    ``min_shared`` independent <=``max_distance``-bit coincidences in
    ANY arrangement (P ~ C(na*nb, m) * (2.4e-15)^m — still negligible
    at corpus scale for m >= 3, but the aligned vote is strictly
    stronger; prefer it when the corpus's twins are same-rate). Same
    shuffle shape: banded (band, chunk) keys, one aggregation."""
    _validate(max_distance, min_shared, "min_shared")
    # same materialize-before-self-join contract as video_neardup_pairs
    frame_hashes = frame_hashes.persist()
    frame_hashes.count()
    imagehash._SYNOPSIS_CACHE.append(frame_hashes)
    sides = _frame_banded(frame_hashes, id_col, frame_col, max_distance)
    matches = _verified_matches(
        _frame_candidates(sides, sides, ordered=True), max_distance
    )
    return (
        matches.groupBy("id_a", "id_b")
        # distinct (_fa, _fb): band copies of one frame match count once
        .agg(F.count_distinct("_fa", "_fb").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def video_neardup_join(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "video_id",
    frame_col: str = "frame_idx",
    max_distance: int = 3,
    min_aligned: int = 4,
) -> DataFrame:
    """Cross-table variant of :func:`video_neardup_pairs` — the
    INCREMENTAL dedup shape: ``corpus`` is the staged frame-hash table,
    ``batch`` is today's crawl, and the banded join probes only
    batch-vs-corpus (never corpus-vs-corpus again), so the daily cost
    scales with the batch — the same discipline as the incremental
    image/text tiers (x117, x77/x82/x88). ``id_a`` comes from
    ``corpus``, ``id_b`` from ``batch``. Equal ids never pair: a video
    present in both tables (a re-submitted batch after the staged
    corpus was rebuilt) is already-known, not its own duplicate."""
    _validate(max_distance, min_aligned, "min_aligned")
    a = _frame_banded(corpus, id_col, frame_col, max_distance)
    b = _frame_banded(batch, id_col, frame_col, max_distance)
    return _aligned_pairs(
        _frame_candidates(a, b, ordered=False), max_distance, min_aligned
    )
