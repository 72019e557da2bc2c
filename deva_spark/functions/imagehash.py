"""Perceptual image hashing + banded hamming near-dup pairs.

The image analog of the text near-dup tier (simhash/minhash): a
training-image corpus carries the SAME picture re-encoded, recompressed
and re-exposed many times over — exact byte/pixel dedup misses all of
it. Three classic 64-bit perceptual hashes (public algorithms:
aHash/dHash/pHash as popularized by the pHash project and the Python
``imagehash`` library; reimplemented here on the package's own resize
and DCT machinery):

  * ``ahash64`` — mean threshold over an 8x8 resize: crudest, fastest.
  * ``dhash64`` — horizontal gradient signs over a 9x8 resize:
    brightness/contrast-shift invariant by construction (comparisons,
    not levels), the workhorse.
  * ``phash64`` — sign-vs-median of the top-left 8x8 DCT block (DC
    dropped) of a 32x32 resize: robust to recompression blur.

Near-dup pairs use the SAME banding discipline as
:mod:`deva_spark.functions.simhash`: hamming distance <= k means at
least one of k+1 disjoint chunks is EQUAL (pigeonhole), so candidates
come from k+1 equality self-joins on 16-bit chunks (k=3 default — the
band width that actually prunes; larger radii need a different index
family, same as text simhash) and the exact ``bit_count(a XOR b)``
verify runs JVM-side on the candidates only. Everything after the
hashing UDF is column algebra — the shuffle is the banded join, keyed
on (band, chunk), exactly the text-simhash scale shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from deva_spark.functions.multimodal import decode_image, resize_image

#: persisted (id, hash) synopses created by :func:`hamming_neardup_pairs`
#: (and the videofp pair builders, which share this registry), released
#: by :func:`release_synopsis_cache` — the vectors._NEARDUP_CACHE
#: discipline (ADVICE r14: plan-builder persists with no release handle
#: accumulate cached synopses in a long-lived session until clearCache).
_SYNOPSIS_CACHE: list[DataFrame] = []


def release_synopsis_cache() -> int:
    """Unpersist every hash synopsis the pair builders cached; returns
    how many were released. Safe any time after the caller has
    materialized its result."""
    n = 0
    while _SYNOPSIS_CACHE:
        _SYNOPSIS_CACHE.pop().unpersist()
        n += 1
    return n


def _dct_basis(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    c = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
    c[0] = np.sqrt(1.0 / n)
    return c


_C32 = _dct_basis(32)


def _gray(arr: np.ndarray) -> np.ndarray:
    """float64 (H, W) luminance; accepts uint8 or float [0,1], 2-D or
    (H, W, C>=3) — alpha channels are ignored, gray+alpha keeps gray."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3 and a.shape[2] >= 3:
        a = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    elif a.ndim == 3:
        a = a[:, :, 0]
    return a


def _bits_to_u64(bits: np.ndarray) -> int:
    v = 0
    for b in bits.reshape(-1):
        v = (v << 1) | int(b)
    return v


def _as_i64(v: int) -> int:
    """Two's-complement fold into a signed 64-bit value (LongType)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def ahash64(arr: np.ndarray) -> int:
    """Average hash: 8x8 bilinear resize, bit = pixel > mean."""
    g = resize_image(_gray(arr), (8, 8))
    return _as_i64(_bits_to_u64(g > g.mean()))


def dhash64(arr: np.ndarray) -> int:
    """Difference hash: 8x9 bilinear resize, bit = right > left —
    invariant to global brightness/contrast shifts by construction."""
    g = resize_image(_gray(arr), (8, 9))
    return _as_i64(_bits_to_u64(g[:, 1:] > g[:, :-1]))


def phash64(arr: np.ndarray) -> int:
    """DCT hash: 32x32 bilinear resize, 2-D DCT-II, bit = coefficient >
    median over the top-left 8x8 block minus DC (63 bits + a 0 pad)."""
    g = resize_image(_gray(arr), (32, 32))
    d = _C32 @ g @ _C32.T
    block = d[:8, :8].reshape(-1)[1:]  # drop DC: brightness immunity
    return _as_i64(_bits_to_u64(block > np.median(block)))


_HASH_FNS: dict[str, Callable[[np.ndarray], int]] = {
    "ahash": ahash64,
    "dhash": dhash64,
    "phash": phash64,
}


def image_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    decoder: Callable[[bytes], np.ndarray] = decode_image,
    hashes: tuple[str, ...] = ("ahash", "dhash", "phash"),
) -> DataFrame:
    """One Arrow-batched pass: decode each payload, emit the requested
    64-bit hashes as LongType — ``(id, <hashes...>)``. ``hashes``
    defaults to all three; a consumer that only joins on one (every
    registry dedup tier uses dhash alone) should pass that one —
    phash's 32x32 resize + DCT is ~2/3 of the per-image hashing cost,
    and an opaque Python stage computes whatever it is told to, so
    column pruning can never remove an unused hash after the fact
    (optimization guide §4: pass only the work the function needs)."""
    unknown = [h for h in hashes if h not in _HASH_FNS]
    if unknown or not hashes:
        raise ValueError(
            f"hashes must be a non-empty subset of {sorted(_HASH_FNS)}: "
            f"{hashes!r}"
        )
    fns = [_HASH_FNS[h] for h in hashes]
    out_schema = f"{id_col} long, " + ", ".join(f"{h} long" for h in hashes)
    cols = [id_col, *hashes]

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                img = decoder(bytes(content))
                rows.append((int(mid), *[fn(img) for fn in fns]))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=out_schema)


def hamming_neardup_join(
    left: DataFrame,
    right: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "media_id",
    max_distance: int = 3,
) -> DataFrame:
    """Cross-table variant of :func:`hamming_neardup_pairs` — every
    (left id, right id) pair within ``max_distance`` bits, as
    ``(id_a, id_b, distance)`` with id_a from ``left``. The
    INCREMENTAL dedup shape: ``left`` is the staged corpus hash table,
    ``right`` is today's batch — the banded join probes only
    batch-vs-corpus (never corpus-vs-corpus again), so the daily cost
    scales with the batch, the same discipline as the incremental
    text tiers (x77/x82/x88)."""
    if not 0 <= max_distance <= 3:
        raise ValueError(
            "max_distance must be 0..3 (16-bit bands stop pruning past "
            f"that), got {max_distance}"
        )
    a = _banded(left, hash_col, id_col, max_distance).alias("a")
    b = _banded(right, hash_col, id_col, max_distance).alias("b")
    cand = a.join(
        b,
        on=[
            F.col("a._band") == F.col("b._band"),
            F.col("a._chunk") == F.col("b._chunk"),
            # equal ids never pair: an image present in BOTH tables
            # (a re-submitted batch after the staged corpus was
            # rebuilt) is already-known, not its own duplicate
            # (review r14)
            F.col("a._id") != F.col("b._id"),
        ],
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.bit_count(
            F.col("a._h").bitwiseXOR(F.col("b._h"))
        ).alias("distance"),
    )
    return _dedup_verified(cand, max_distance)


def _dedup_verified(cand: DataFrame, max_distance: int) -> DataFrame:
    """Exact verify + per-pair dedup of banded candidates, in the order
    that shuffles least (guide §2.3/§2.4): ``distance`` is computed and
    filtered BEFORE the exchange (a candidate failing the verify never
    shuffles — up to k+1 band copies per pair dropped map-side), and the
    pair dedup is a ``groupBy.agg(min)`` instead of ``dropDuplicates``
    so the one exchange carries only ``(id_a, id_b, distance)`` — never
    the two 8-byte hashes. ``min`` is exact: every band copy of a pair
    carries the identical distance."""
    return (
        cand.filter(F.col("distance") <= max_distance)
        .groupBy("id_a", "id_b")
        .agg(F.min("distance").alias("distance"))
    )


def _banded(
    hashes: DataFrame, hash_col: str, id_col: str, max_distance: int
) -> DataFrame:
    """(id, hash, band, chunk) exploded over the k+1 disjoint chunks."""
    n_chunks = max_distance + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1 if width < 64 else -1
    h = F.col(hash_col)
    chunks = F.array(
        *[
            F.shiftrightunsigned(h, i * width).bitwiseAND(F.lit(mask))
            for i in range(n_chunks)
        ]
    )
    return hashes.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.posexplode(chunks).alias("_band", "_chunk"),
    )


def hamming_neardup_pairs(
    hashes: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "media_id",
    max_distance: int = 3,
) -> DataFrame:
    """All id pairs whose 64-bit ``hash_col`` values differ by at most
    ``max_distance`` bits — ``(id_a, id_b, distance)`` with
    ``id_a < id_b``. Banded exactly like text simhash: ``k+1`` disjoint
    chunks (pigeonhole guarantees a candidate shares one), equality
    self-join per band, then the exact JVM-side ``bit_count`` verify.
    ``max_distance`` is capped at 3 (4 x 16-bit chunks): beyond that
    the chunks stop pruning and the banded join degenerates toward the
    cross product — the same honest boundary the text simhash tier
    documents."""
    if not 0 <= max_distance <= 3:
        raise ValueError(
            "max_distance must be 0..3 (16-bit bands stop pruning past "
            f"that), got {max_distance}"
        )
    # Materialize the hash synopsis BEFORE the banded self-join (guide
    # §2.4/§5): both join branches hang off the same opaque Arrow stage
    # (decode + hash — for the registry tiers, image SYNTHESIS too), and
    # Spark cannot share an unmaterialized Python stage across branches
    # (no common-subtree reuse without an identical Exchange), so an
    # unpersisted lineage runs the decode+hash pass once PER BRANCH —
    # measured 2x the whole tier at bench scale (plans/r14/x115: 4
    # MapInPandas + 2 scans -> 2 + 1). The synopsis is (id, hash) rows —
    # KBs per million images — and the eager count() is what guarantees
    # the two join stages read cache instead of racing to populate it.
    # Deliberately persisted for the result's lifetime (the simhash
    # fingerprint precedent); registered in _SYNOPSIS_CACHE so library
    # callers looping many resolutions can release_synopsis_cache()
    # instead of a blanket clearCache (ADVICE r14).
    hashes = hashes.persist()
    hashes.count()
    _SYNOPSIS_CACHE.append(hashes)
    sides = _banded(hashes, hash_col, id_col, max_distance)
    a, b = sides.alias("a"), sides.alias("b")
    cand = a.join(
        b,
        on=[
            F.col("a._band") == F.col("b._band"),
            F.col("a._chunk") == F.col("b._chunk"),
            F.col("a._id") < F.col("b._id"),
        ],
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.bit_count(
            F.col("a._h").bitwiseXOR(F.col("b._h"))
        ).alias("distance"),
    )
    return _dedup_verified(cand, max_distance)
