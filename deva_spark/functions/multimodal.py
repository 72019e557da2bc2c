"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference has no multimodal surface; this is the training-data-pipeline
extension (BASELINE.json north star). Design:

  * payloads are ``binary`` columns (never exploded into Python objects in
    the plan), metadata is a typed struct — so pruning/filtering happens on
    the cheap columns and the bytes move only when a UDF needs them;
  * every decode/transform is a ``mapInPandas`` stage over Arrow batches —
    per-partition batching, no per-row Python;
  * REAL in this container: schema, partitioning, UDF signatures, batch
    shapes, deterministic metadata extraction from headers.
    STUBBED (no image/audio libs installed): pixel/sample decoding — the
    decoder is injectable; the default raises NotImplementedError (real
    decode) or uses a clearly-marked deterministic fake (tests).
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: canonical multimodal schema: opaque payload + typed metadata
MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, mime:string>"
)


def media_table(spark, rows) -> DataFrame:
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def png_dimensions(content: bytes) -> tuple[int, int] | None:
    """REAL header parse: PNG IHDR width/height (no decoder needed)."""
    if content is None or len(content) < 24 or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h = _struct.unpack(">II", content[16:24])
    return int(w), int(h)


def extract_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Populate metadata from payload headers (PNG today; other container
    formats slot in beside it). Runs as one Arrow batch pass."""
    out_schema = df.schema

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            metas = []
            for content, meta in zip(pdf[content_col], pdf["meta"]):
                dims = png_dimensions(content)
                m = dict(meta) if meta is not None else {}
                if dims:
                    m["width"], m["height"] = dims
                    m["mime"] = "image/png"
                metas.append(m)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def fake_decode_image(content: bytes) -> np.ndarray:
    """STUB decoder — deterministic fake pixels derived from the payload
    hash (image libraries are not installed in this container). Replace
    with a real decoder via the ``decoder`` argument of decode_features."""
    h = hashlib.sha256(content or b"").digest()
    rng = np.frombuffer((h * 96)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).astype(np.float32) / 255.0


def raise_not_implemented(content: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real image decode requires pillow/opencv, not installed here; "
        "inject a decoder or use fake_decode_image for plumbing tests"
    )


def decode_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = raise_not_implemented,
    content_col: str = "content",
    out_col: str = "features",
    pool: int = 4,
) -> DataFrame:
    """Decode → downsample → flat feature vector, as one mapInPandas stage.

    The decoder is the injected slow path; everything after it (mean-pool
    to ``pool``×``pool``, channel-mean flatten) is vectorized numpy. Output
    column: array<float> of length pool*pool."""
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    # fresh StructType — .add would mutate the cached input schema
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = []
            for content in pdf[content_col]:
                img = decoder(content)  # (H, W, C) float32
                hs = img.shape[0] // pool
                ws = img.shape[1] // pool
                pooled = img[: hs * pool, : ws * pool].reshape(
                    pool, hs, pool, ws, -1
                ).mean(axis=(1, 3, 4))
                feats.append([float(x) for x in pooled.ravel()])
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    frame_col: str = "frame",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (1→N explode via mapInPandas). Frame EXTRACTION is stubbed (no
    codecs here) — emitted frames carry the frame index + a deterministic
    placeholder payload slice so downstream partitioning/batching is real."""
    out_schema = (
        "media_id long, kind string, frame_index int, frame binary"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for _, r in pdf.iterrows():
                n = int(r["meta"]["n_frames"] or 0) if r["meta"] is not None else 0
                for i in range(0, n, every_n):
                    # STUB: real codec would decode frame i; placeholder is
                    # a content-derived slice, deterministic per (id, i)
                    token = hashlib.md5(
                        (r[content_col] or b"") + str(i).encode()
                    ).digest()
                    rows.append((r["media_id"], r["kind"], i, token))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "frame_index", "frame"]
            )

    return df.mapInPandas(run, schema=out_schema)
