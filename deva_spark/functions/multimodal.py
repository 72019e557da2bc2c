"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference has no multimodal surface; this is the training-data-pipeline
extension (BASELINE.json north star). Design:

  * payloads are ``binary`` columns (never exploded into Python objects in
    the plan), metadata is a typed struct — so pruning/filtering happens on
    the cheap columns and the bytes move only when a UDF needs them;
  * every decode/transform is a ``mapInPandas`` stage over Arrow batches —
    per-partition batching, no per-row Python;
  * REAL in this container: schema, partitioning, UDF signatures, batch
    shapes, deterministic metadata extraction from headers, AND full PNG
    decode/encode — a pure-stdlib codec (zlib inflate + scanline filter
    reconstruction, 8-bit gray/gray+alpha/RGB/RGBA) so the image path runs
    on real bytes with no third-party libs. :func:`decode_image` prefers
    PIL when installed (covers JPEG etc.), falling back to the built-in
    PNG codec. ALSO REAL: WAV/PCM audio decode (stdlib ``wave``: 8/16/32-bit
    int PCM → float32 in [-1, 1]) with pooled per-segment RMS features.
    ALSO REAL (r11): video via package-own container AND entropy codecs
    — animated GIF (LZW encode/decode), AVI/RIFF with uncompressed
    BI_RGB frames (:func:`encode_avi`/:func:`decode_avi`, bit-exact
    roundtrip), and MJPEG-AVI through the pure-numpy JPEG
    encoder/decoder (`functions.jpeg`: baseline 4:4:4/4:2:2/4:2:0 and
    progressive SOF2, byte stuffing, restart handling — lossy but
    deterministic). STILL INJECTED: codecs that genuinely need external
    libraries (H.264 …, arithmetic-coded JPEG) — ffmpeg when present, else the
    deterministic :func:`fake_decode_video` keeps the Spark-side
    plumbing testable, and :func:`raise_not_implemented` remains for
    callers that must fail loudly without a real codec.
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


def jpeg_dimensions(content: bytes) -> tuple[int, int] | None:
    """REAL header parse: walk the JPEG marker stream to the first
    frame header (SOF0-SOF15, excluding DHT/DAC/RST) and read
    height/width — no decoder, bounded by the header segment sizes.
    JPEG is the dominant format of any web-scale image corpus, so the
    metadata pass must handle it without a codec dependency."""
    if content is None or len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(content)
    while i + 3 < n:
        if content[i] != 0xFF:
            return None  # marker desync — corrupt stream
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if i + 4 > n:
            return None
        seg_len = _struct.unpack(">H", content[i + 2 : i + 4])[0]
        # SOFn frame headers: C0-CF except C4 (DHT), C8 (JPG ext), CC (DAC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = _struct.unpack(">HH", content[i + 5 : i + 9])
            return int(w), int(h)
        if marker == 0xDA:  # start of scan — no frame header seen
            return None
        i += 2 + seg_len
    return None


def extract_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Populate metadata from payload headers (PNG/JPEG/WAV today; other
    container formats slot in beside them). Runs as one Arrow batch
    pass."""
    out_schema = df.schema

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            metas = []
            for content, meta in zip(pdf[content_col], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                dims = png_dimensions(content)
                jdims = jpeg_dimensions(content)
                wav = wav_info(content)
                if dims:
                    m["width"], m["height"] = dims
                    m["mime"] = "image/png"
                elif jdims:
                    m["width"], m["height"] = jdims
                    m["mime"] = "image/jpeg"
                elif wav:
                    m["sample_rate"], _nch, m["n_frames"] = wav
                    m["mime"] = "audio/wav"
                else:
                    # video containers: without this, the documented
                    # extract_meta -> frame_sample flow silently emitted
                    # ZERO frames for AVI/GIF payloads (n_frames stayed
                    # null; r11 review)
                    avi = avi_info(content) if content else None
                    if avi:
                        m["width"], m["height"], m["n_frames"] = avi
                        m["mime"] = "video/x-msvideo"
                    elif content and content[:4] == b"GIF8":
                        gdims = gif_dimensions(content)
                        if gdims:
                            m["width"], m["height"] = gdims
                        m["n_frames"] = gif_frame_count(content)
                        m["mime"] = "image/gif"
                metas.append(m)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def decode_png(content: bytes) -> np.ndarray:
    """REAL pure-stdlib PNG decode → float32 (H, W, C) in [0, 1].

    Supports 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), non-interlaced — the common training-data cases. Scanline
    filters 0-4 (None/Sub/Up/Average/Paeth) are reconstructed per the PNG
    spec; rows with filter None/Up reconstruct as vectorized numpy, the
    byte-sequential filters (Sub/Average/Paeth) fall back to a per-byte
    loop only on rows that use them."""
    if content is None or content[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, hdr = len(_PNG_SIG), [], None
    while pos + 8 <= len(content):
        ln = int.from_bytes(content[pos : pos + 4], "big")
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            hdr = _struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"png depth={depth} ctype={ctype} interlace={interlace} unsupported"
        )
    import zlib

    c = _PNG_CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256, per spec
        else:  # Sub/Average/Paeth: sequential in x
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                if ftype == 1:
                    add = a
                elif ftype == 3:
                    add = (a + b) // 2
                elif ftype == 4:
                    cc = int(prev[i - c]) if i >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    add = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                cur[i] = (int(cur[i]) + add) & 0xFF
        img[y] = cur
        prev = cur
    return (img.reshape(h, w, c).astype(np.float32)) / 255.0


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT): uint8 (H, W[, C]) →
    bytes. The write-side twin of :func:`decode_png` for generating real
    image payloads without third-party libs."""
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(content: bytes) -> np.ndarray:
    """Default REAL image decoder: PIL when installed (JPEG/PNG/WebP/...),
    otherwise the built-in pure-stdlib codecs — PNG, or baseline JPEG
    (`functions.jpeg`, r11) when the payload leads with the JPEG SOI.

    Throughput honesty: the built-in JPEG entropy decode is a Python
    bit loop — linear in scan size (~0.7 s for a 256x256 photo) but
    roughly 100x libjpeg; fine for the synthesized-media audits and
    small thumbnails, not for a web-corpus image tier. At that scale
    install PIL on the executors (this function then uses it
    automatically) or inject a decoder via the ``decoder=`` hooks."""
    if not content:
        # MEDIA_SCHEMA's content column is nullable: a null payload must
        # raise the documented ValueError, not an opaque TypeError from
        # the subscript below (r11 review; decode_png/decode_wav agree)
        raise ValueError("null/empty image payload")
    try:
        import io

        from PIL import Image  # noqa: PLC0415 — optional dependency

        return np.asarray(Image.open(io.BytesIO(content))).astype(np.float32) / 255.0
    except ImportError:
        if content[:2] == b"\xff\xd8":
            from deva_spark.functions.jpeg import decode_jpeg

            return decode_jpeg(content).astype(np.float32) / 255.0
        return decode_png(content)


def resize_image(
    arr: np.ndarray, size: tuple[int, int], method: str = "bilinear"
) -> np.ndarray:
    """Pure-numpy image resize to ``(height, width)`` — the
    normalize-resolution step every image training pipeline runs before
    feature extraction (the last of the brief's decode / feature-extract
    / resize / frame-sample quartet). ``method``: ``"bilinear"``
    (half-pixel-center sampling, edges replicated — the convention
    OpenCV/PIL default to) or ``"nearest"``. Accepts ``(H, W)`` or
    ``(H, W, C)``, float or uint8; returns the same dtype (uint8
    rounds half away from zero via ``np.rint``). Fully vectorized —
    one gather + three lerps, no Python per-pixel loop — and
    deterministic: same array, same bytes, any platform."""
    h2, w2 = int(size[0]), int(size[1])
    if h2 <= 0 or w2 <= 0:
        raise ValueError(f"target size must be positive, got {size}")
    if arr.ndim not in (2, 3):
        raise ValueError(f"expected (H, W[, C]) array, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty source image")
    if method == "nearest":
        yi = np.minimum(((np.arange(h2) + 0.5) * h / h2).astype(np.int64), h - 1)
        xi = np.minimum(((np.arange(w2) + 0.5) * w / w2).astype(np.int64), w - 1)
        return arr[yi][:, xi]
    if method != "bilinear":
        raise ValueError(f"method must be bilinear|nearest, got {method!r}")
    squeeze = arr.ndim == 2
    a = arr.astype(np.float64)
    if squeeze:
        a = a[:, :, None]
    fy = (np.arange(h2) + 0.5) * h / h2 - 0.5
    fx = (np.arange(w2) + 0.5) * w / w2 - 0.5
    y0f = np.floor(fy)
    x0f = np.floor(fx)
    ty = (fy - y0f)[:, None, None]
    tx = (fx - x0f)[None, :, None]
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, h - 1)
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, w - 1)
    top = a[y0][:, x0] * (1 - tx) + a[y0][:, x1] * tx
    bot = a[y1][:, x0] * (1 - tx) + a[y1][:, x1] * tx
    out = top * (1 - ty) + bot * ty
    if squeeze:
        out = out[:, :, 0]
    if np.issubdtype(arr.dtype, np.integer):
        return np.clip(np.rint(out), 0, 255).astype(arr.dtype)
    return out.astype(arr.dtype)


def fake_decode_image(content: bytes) -> np.ndarray:
    """STUB decoder — deterministic fake pixels derived from the payload
    hash (image libraries are not installed in this container). Replace
    with a real decoder via the ``decoder`` argument of decode_features."""
    h = hashlib.sha256(content or b"").digest()
    rng = np.frombuffer((h * 96)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).astype(np.float32) / 255.0


def raise_not_implemented(content: bytes) -> np.ndarray:
    raise NotImplementedError(
        "no codec for this media kind in this container (video needs an "
        "ffmpeg-class decoder); inject one via the decoder argument"
    )


# --------------------------------------------------------------------- audio


def _g711_table(law: str) -> np.ndarray:
    """256-entry code → int16 expansion table for ITU-T G.711 (the
    telephony companding real speech corpora carry; WAVE format tags 7
    = mu-law, 6 = A-law). Vectorized transliteration of the public
    CCITT reference expansion (Sun ulaw2linear/alaw2linear)."""
    codes = np.arange(256, dtype=np.int64)
    if law == "ulaw":
        u = ~codes & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        out = np.where(u & 0x80, 0x84 - t, t - 0x84)
    elif law == "alaw":
        a = codes ^ 0x55
        seg = (a & 0x70) >> 4
        t = (a & 0x0F) << 4
        t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
        out = np.where(a & 0x80, t, -t)
    else:
        raise ValueError(f"law must be ulaw|alaw, got {law!r}")
    return out.astype(np.int16)


_G711_TABLES = {"ulaw": _g711_table("ulaw"), "alaw": _g711_table("alaw")}

#: WAVE fmt-chunk audio format tags this module's own decoder speaks.
_WAVE_FMT_PCM, _WAVE_FMT_ALAW, _WAVE_FMT_ULAW = 0x0001, 0x0006, 0x0007
_WAVE_FMT_IMA_ADPCM = 0x0011

#: IMA/DVI ADPCM quantizer tables (public spec; same tables stdlib
#: audioop uses — the tests pin nibble-for-nibble parity against it).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64
)  # adj[nibble] = table[nibble & 7]


def _ima_adpcm_decode(data: bytes, nch: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM-in-WAV decode (format tag 0x0011) → int16
    ``(n_frames, nch)``. Block layout per the public IMA spec: each
    ``block_align``-byte block carries a 4-byte header PER CHANNEL
    (int16 predictor — which IS the first output sample — uint8 step
    index, reserved byte), then the channels' nibble data interleaved
    in 4-byte groups (8 samples per group, LOW nibble first — note
    stdlib audioop's raw stream is high-nibble-first; the tests swap
    nibbles to pin parity). The per-sample recurrence is inherently
    sequential, so the loop runs over samples-in-block while staying
    VECTORIZED across every (block, channel) pair — a long clip decodes
    in O(samples_per_block) numpy steps, not O(total_samples) Python."""
    if nch <= 0 or block_align < 4 * nch + 4:
        raise ValueError(
            f"bad IMA ADPCM geometry (channels={nch}, "
            f"block_align={block_align})"
        )
    nblocks = len(data) // block_align
    if nblocks == 0:
        return np.zeros((0, nch), dtype=np.int16)
    raw = np.frombuffer(
        data[: nblocks * block_align], dtype=np.uint8
    ).reshape(nblocks, block_align)
    # headers: channel ch at bytes [4*ch, 4*ch+4)
    hdr = raw[:, : 4 * nch].reshape(nblocks, nch, 4)
    pred = (
        hdr[:, :, 0].astype(np.int64)
        | (hdr[:, :, 1].astype(np.int64) << 8)
    )
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16
    index = np.clip(hdr[:, :, 2].astype(np.int64), 0, 88)
    # data region: 4-byte groups, group g -> channel g % nch
    body = raw[:, 4 * nch :]
    ngroups = body.shape[1] // 4
    gpc = ngroups // nch  # complete groups per channel
    if gpc == 0:
        return pred.astype(np.int16).reshape(nblocks, nch)[:, :nch]
    groups = body[:, : ngroups * 4].reshape(nblocks, ngroups, 4)
    # (nblocks, nch, gpc, 4): channel ch takes groups ch, ch+nch, ...
    per_ch = groups[:, : gpc * nch].reshape(nblocks, gpc, nch, 4)
    per_ch = per_ch.transpose(0, 2, 1, 3)
    nib = np.empty((nblocks, nch, gpc, 8), dtype=np.int64)
    nib[..., 0::2] = per_ch & 0x0F  # low nibble first (WAV layout)
    nib[..., 1::2] = per_ch >> 4
    nsamp = gpc * 8
    nib = nib.reshape(nblocks, nch, nsamp)
    out = np.empty((nblocks, nch, 1 + nsamp), dtype=np.int16)
    out[:, :, 0] = pred.astype(np.int16)
    for t in range(nsamp):
        d = nib[:, :, t]
        step = _IMA_STEPS[index]
        diff = step >> 3
        diff += np.where(d & 1, step >> 2, 0)
        diff += np.where(d & 2, step >> 1, 0)
        diff += np.where(d & 4, step, 0)
        pred = np.clip(
            np.where(d & 8, pred - diff, pred + diff), -32768, 32767
        )
        index = np.clip(index + _IMA_INDEX_ADJ[d], 0, 88)
        out[:, :, t + 1] = pred.astype(np.int16)
    # (nblocks, nch, frames_per_block) -> (total_frames, nch)
    return out.transpose(0, 2, 1).reshape(-1, nch)


def _wav_fmt_data(content: bytes):
    """(format_tag, n_channels, sample_rate, block_align, bits,
    data bytes) from a RIFF/WAVE payload via the package's own chunk
    walk — the fallback for formats stdlib ``wave`` refuses (G.711
    companded speech, IMA ADPCM)."""
    fmt = data = None
    for fcc, start, size in _riff_chunks(content, 12, len(content)):
        # a declared size past the payload's actual end is a truncated
        # crawled file: treating it as "chunk absent" keeps the error
        # the documented ValueError, not a struct.error (r13 review #2)
        if fcc == b"fmt " and size >= 16 and start + 16 <= len(content):
            tag, nch, rate, _byterate, balign, bits = _struct.unpack(
                "<HHIIHH", content[start : start + 16]
            )
            fmt = (tag, nch, rate, balign, bits)
        elif fcc == b"data":
            data = content[start : min(start + size, len(content))]
    if fmt is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    return (*fmt, data)


def _wav_fact_frames(content: bytes) -> int | None:
    """Per-channel frame count from the RIFF ``fact`` chunk, None when
    absent/short. Compressed WAVE formats (ADPCM, G.711) are REQUIRED
    by the spec to carry it, and it is the only record of the true
    length when the final ADPCM block is padded: block geometry alone
    overstates the count by up to one block's worth of frames
    (ADVICE r13)."""
    for fcc, start, size in _riff_chunks(content, 12, len(content)):
        if fcc == b"fact" and size >= 4 and start + 4 <= len(content):
            return _struct.unpack("<I", content[start : start + 4])[0]
    return None


def wav_info(content: bytes) -> tuple[int, int, int] | None:
    """REAL header parse: (sample_rate, n_channels, n_frames) from a
    RIFF/WAVE payload, None if it isn't one. G.711 companded WAVs
    (format 6/7), which stdlib ``wave`` refuses, parse through the
    package's own chunk walk."""
    if content is None or len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(content)) as w:
            return w.getframerate(), w.getnchannels(), w.getnframes()
    except (wave.Error, EOFError):
        try:
            tag, nch, rate, balign, _bits, data = _wav_fmt_data(content)
        except (ValueError, _struct.error):
            return None
        if tag in (_WAVE_FMT_ALAW, _WAVE_FMT_ULAW) and nch:
            return rate, nch, len(data) // nch  # 1 byte per sample
        if tag == _WAVE_FMT_IMA_ADPCM and nch and balign >= 4 * nch + 4:
            nblocks = len(data) // balign
            per_block = 1 + ((balign - 4 * nch) // (4 * nch)) * 8
            frames = nblocks * per_block
            # real encoders pad the last block and record the true
            # count in fact — block geometry alone overstates it
            fact = _wav_fact_frames(content)
            if fact is not None:
                frames = min(frames, fact)
            return rate, nch, frames
        return None


def decode_wav(content: bytes) -> np.ndarray:
    """REAL pure-stdlib WAV/PCM decode → float32 (n_frames, n_channels) in
    [-1, 1]. Supports 8-bit unsigned, 16-bit and 32-bit signed PCM — the
    common training-data cases — plus ITU-T G.711 mu-law/A-law companded
    streams (format tags 7/6 — what telephony speech corpora carry)
    and IMA/DVI ADPCM (format 0x0011, block-structured) — both r13,
    with bit-exact parity against stdlib ``audioop`` pinned in tests.
    24-bit PCM and the remaining compressed tags (MPEG etc.) raise,
    inject a richer decoder."""
    import io
    import wave

    if content is None or content[:4] != b"RIFF":
        raise ValueError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(content)) as w:
            width = w.getsampwidth()
            nch = w.getnchannels()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        # stdlib wave speaks PCM only: G.711 and IMA ADPCM go through
        # the package's own RIFF walk + decoders
        tag, nch, _rate, balign, _bits, data = _wav_fmt_data(content)
        if nch == 0:
            raise ValueError("WAVE fmt declares zero channels") from None
        if tag == _WAVE_FMT_IMA_ADPCM:
            pcm = _ima_adpcm_decode(data, nch, balign)
            fact = _wav_fact_frames(content)
            if fact is not None:  # drop the final block's pad frames
                pcm = pcm[:fact]
            return pcm.astype(np.float32) / 32768.0
        law = {_WAVE_FMT_ULAW: "ulaw", _WAVE_FMT_ALAW: "alaw"}.get(tag)
        if law is None:
            raise NotImplementedError(
                f"WAVE format tag 0x{tag:04x} unsupported (MPEG etc.); "
                "inject a richer decoder"
            ) from None
        x = (
            _G711_TABLES[law][np.frombuffer(data, dtype=np.uint8)]
            .astype(np.float32)
            / 32768.0
        )
        return x.reshape(-1, nch)
    if width == 1:  # unsigned 8-bit, midpoint 128
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"{width * 8}-bit PCM unsupported by stdlib path")
    return x.reshape(-1, nch)


def audio_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = decode_wav,
    content_col: str = "content",
    out_col: str = "features",
    segments: int = 8,
) -> DataFrame:
    """Decode audio → per-segment RMS energy envelope, one mapInPandas
    stage (the audio twin of :func:`decode_features`). Channels are mixed
    down; the clip is split into ``segments`` equal spans and each yields
    one RMS value — output array<float> of length ``segments``."""
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = []
            for content in pdf[content_col]:
                mono = decoder(content).mean(axis=1)
                n = len(mono) // segments
                if n == 0:
                    feats.append([0.0] * segments)
                    continue
                spans = mono[: n * segments].reshape(segments, n)
                feats.append(
                    [float(v) for v in np.sqrt((spans**2).mean(axis=1))]
                )
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def decode_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = decode_image,
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
                if img.shape[0] < pool or img.shape[1] < pool:
                    # fail loudly with the cause (the video_features
                    # ADVICE-r5 guard, r11 review): a 1x1 tracking pixel
                    # otherwise dies in an opaque numpy reshape error
                    raise ValueError(
                        f"decoded image {img.shape[0]}x{img.shape[1]} "
                        f"smaller than pool={pool}; shrink pool or "
                        "upscale in the decoder"
                    )
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


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    id_col: str = "media_id",
    content_col: str = "content",
    method: str = "bilinear",
    decoder: Callable[[bytes], np.ndarray] = decode_image,
) -> DataFrame:
    """Normalize every image payload to ``(height, width)`` — the
    fixed-resolution step an image training pipeline runs between
    decode and feature extraction. One Arrow-batched mapInPandas stage:
    decode → :func:`resize_image` (vectorized bilinear/nearest on the
    quantized uint8 pixels) → re-encode as PNG (lossless container, so
    the resized pixels cross any Arrow/shuffle boundary bit-exactly).
    Output: ``(id, content=resized PNG, src_width, src_height, width,
    height, digest)`` where ``digest`` is the md5 of the resized uint8
    pixels computed HERE on the resizing executor — a downstream decode
    proves partitioning/platform invariance against it
    (:func:`resize_roundtrip_audit`)."""
    out_schema = (
        f"{id_col} long, content binary, src_width int, src_height int, "
        "width int, height int, digest string"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                img = decoder(bytes(content))  # (H, W[, C]) float in [0,1]
                sh, sw = int(img.shape[0]), int(img.shape[1])
                u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
                res = resize_image(u8, (height, width), method=method)
                rows.append((
                    mid, encode_png(res), sw, sh, int(width), int(height),
                    hashlib.md5(res.tobytes()).hexdigest(),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "content", "src_width", "src_height",
                    "width", "height", "digest",
                ],
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_roundtrip_audit(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Second Arrow pass over :func:`resize_images` output — decodes
    each resized PNG AFTER the shuffle boundary and proves decoded
    shape == target dims AND pixel md5 == the resizing executor's
    digest (``ok``). Same audit discipline as
    :func:`codec_roundtrip_audit` / :func:`avi_roundtrip_audit`."""
    out_schema = (
        f"{id_col} long, ok boolean, src_width int, src_height int, "
        "width int, height int"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    arr = decode_png(bytes(r["content"]))
                    u8 = np.clip(np.rint(arr * 255.0), 0, 255).astype(
                        np.uint8
                    )
                    ok = (
                        u8.shape[0] == int(r["height"])
                        and u8.shape[1] == int(r["width"])
                        and hashlib.md5(u8.tobytes()).hexdigest()
                        == r["digest"]
                    )
                except (ValueError, NotImplementedError):
                    ok = False
                rows.append((
                    int(r[id_col]), bool(ok), int(r["src_width"]),
                    int(r["src_height"]), int(r["width"]), int(r["height"]),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "ok", "src_width", "src_height",
                    "width", "height",
                ],
            )

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    frame_col: str = "frame",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (1→N explode via mapInPandas). GIF and uncompressed-AVI payloads
    extract REAL frames (stdlib container decode, each sampled frame
    re-encoded as a standalone PNG — a typed image payload downstream
    image stages consume directly); other codecs fall back to a
    deterministic content-derived placeholder so the partitioning/
    batching plumbing still runs where no codec exists."""
    out_schema = (
        "media_id long, kind string, frame_index int, frame binary"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for _, r in pdf.iterrows():
                n = int(r["meta"]["n_frames"] or 0) if r["meta"] is not None else 0
                content = bytes(r[content_col] or b"")
                clip = None
                try:
                    if content[:4] == b"GIF8":
                        clip = np.rint(decode_gif(content) * 255).astype(
                            np.uint8
                        )
                    elif (
                        content[:4] == b"RIFF" and content[8:12] == b"AVI "
                    ):
                        clip = decode_avi(content)
                except (ValueError, NotImplementedError, _struct.error):
                    clip = None  # undecodable/corrupt -> placeholder path
                for i in range(0, n, every_n):
                    if clip is not None and i < clip.shape[0]:
                        payload = encode_png(clip[i])
                    else:
                        payload = hashlib.md5(
                            content + str(i).encode()
                        ).digest()
                    rows.append((r["media_id"], r["kind"], i, payload))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "frame_index", "frame"]
            )

    return df.mapInPandas(run, schema=out_schema)


def fake_decode_video(content: bytes, n_frames: int = 4) -> np.ndarray:
    """STUB video decoder — deterministic fake ``(T, 8, 8, 3)`` frames
    chained from the payload hash (no ffmpeg-class codec exists in this
    container). The frame CONTENT is fake; everything around it — batch
    shape, dtype contract (float32 in [0, 1]), per-frame axis — matches
    what a real injected decoder must produce."""
    frames = []
    h = hashlib.sha256(content or b"").digest()
    for _ in range(max(int(n_frames), 1)):
        frames.append(
            np.frombuffer((h * 6)[: 8 * 8 * 3], dtype=np.uint8)
            .reshape(8, 8, 3)
            .astype(np.float32)
            / 255.0
        )
        h = hashlib.sha256(h).digest()
    return np.stack(frames)


def ffmpeg_decode_video(
    content: bytes,
    n_frames: int = 0,
    *,
    size: int = 32,
    binary: str = "ffmpeg",
) -> np.ndarray:
    """REAL video decoder via an ``ffmpeg`` subprocess, when one is
    installed on the worker image (``deva/utils/media.py`` delegates to
    external codecs the same way). Pipes the container bytes to stdin and
    reads rawvideo rgb24 frames scaled to ``size``×``size`` from stdout —
    no temp files, so it composes with :func:`video_features` as an
    injected ``decoder``. Raises :class:`NotImplementedError` when the
    binary is absent so callers fall back to :func:`fake_decode_video`
    explicitly rather than silently.

    ``n_frames`` caps the decoded frame count when positive (``-frames:v``)
    — at 100 TB you decode the frames you need, not the whole clip.
    """
    import shutil
    import subprocess

    if shutil.which(binary) is None:
        raise NotImplementedError(
            f"{binary!r} not found on PATH — install ffmpeg on the worker "
            "image or inject another decoder (fake_decode_video is the "
            "deterministic offline fallback)"
        )
    cmd = [binary, "-v", "error", "-i", "pipe:0"]
    if n_frames and int(n_frames) > 0:
        cmd += ["-frames:v", str(int(n_frames))]
    cmd += [
        "-vf",
        f"scale={size}:{size}",
        "-f",
        "rawvideo",
        "-pix_fmt",
        "rgb24",
        "pipe:1",
    ]
    proc = subprocess.run(cmd, input=content, capture_output=True, check=False)
    frame_bytes = size * size * 3
    n = len(proc.stdout) // frame_bytes
    if n == 0:
        raise ValueError(
            "ffmpeg produced no frames: "
            + proc.stderr.decode("utf-8", "replace")[:500]
        )
    if proc.returncode != 0:
        # A mid-decode failure (corrupt tail, codec error after N frames)
        # still emits complete leading frames; silently returning them
        # would feed video_features partial content with no signal.
        raise ValueError(
            f"ffmpeg exited {proc.returncode} after {n} complete frame(s) "
            "— clip is truncated or corrupt: "
            + proc.stderr.decode("utf-8", "replace")[:500]
        )
    return (
        np.frombuffer(proc.stdout[: n * frame_bytes], dtype=np.uint8)
        .reshape(n, size, size, 3)
        .astype(np.float32)
        / 255.0
    )


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """LZW decompression for GIF image data (GIF89a spec, appendix F):
    variable-width codes packed LSB-first, dictionary reset on CLEAR."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    code_size = min_code_size + 1
    buf = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = buf & ((1 << code_size) - 1)
            buf >>= code_size
            nbits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code]:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out.extend(entry)
            if prev is not None and len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
            prev = entry
    return out


def gif_dimensions(content: bytes) -> tuple[int, int] | None:
    """(width, height) from the GIF logical screen descriptor, or None
    for a non-GIF payload — the metadata tier (header sniff only)."""
    if not content or len(content) < 10 or content[:4] != b"GIF8":
        return None
    return (
        int.from_bytes(content[6:8], "little"),
        int.from_bytes(content[8:10], "little"),
    )


def gif_frame_count(content: bytes) -> int:
    """Number of image descriptors in a GIF — the structural frame count
    (no LZW decode; the block walk skips color tables and data
    sub-blocks). 0 for a non-GIF or truncated payload — the metadata
    tier never raises."""
    if gif_dimensions(content) is None:
        return 0
    try:
        pos = 13
        if content[10] & 0x80:  # global color table
            pos += 3 * (2 << (content[10] & 0x07))
        frames = 0
        while pos < len(content):
            block = content[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while content[pos]:
                    pos += 1 + content[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                frames += 1
                packed = content[pos + 8]
                pos += 9
                if packed & 0x80:  # local color table
                    pos += 3 * (2 << (packed & 0x07))
                pos += 1  # LZW min code size
                while content[pos]:
                    pos += 1 + content[pos]
                pos += 1
            else:
                break  # unknown block: stop counting, keep what we have
        return frames
    except IndexError:
        return 0  # truncated payload: report 0, not a partial count


def decode_gif(content: bytes) -> np.ndarray:
    """REAL animated-GIF decoder, pure stdlib — the in-container
    multi-frame codec (GIF87a/89a: logical screen, global/local color
    tables, interlacing, transparency, disposal methods 1/2). Returns
    ``(T, H, W, 3)`` float32 frames in [0, 1], composed on the logical
    screen exactly as a player would. The reference delegates media
    decode to external codecs (`deva/utils/media.py`); here GIF is the
    codec that needs no external binary, so CI exercises a genuine
    multi-frame decode path (ffmpeg remains the hook for everything
    else)."""
    if len(content) < 13 or content[:4] != b"GIF8":
        raise ValueError("not a GIF payload")

    def _need(p: int, n: int) -> None:
        # every fixed-offset read goes through this so a truncated
        # payload raises the documented ValueError, not IndexError
        # (ADVICE r7)
        if p + n > len(content):
            raise ValueError("truncated GIF payload")

    w = int.from_bytes(content[6:8], "little")
    h = int.from_bytes(content[8:10], "little")
    packed = content[10]
    bg_index = content[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        _need(pos, 3 * n)
        gct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    saw_trailer = False
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            _need(pos, 1)
            label = content[pos]
            pos += 1
            subs = []
            while True:
                _need(pos, 1)
                ln = content[pos]
                if ln == 0:
                    break
                _need(pos + 1, ln)
                subs.append(content[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and subs and len(subs[0]) >= 4:  # graphic control
                gc = subs[0]
                disposal = (gc[0] >> 2) & 0x07
                transparent = gc[3] if gc[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _need(pos, 9)
        left = int.from_bytes(content[pos : pos + 2], "little")
        top = int.from_bytes(content[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(content[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(content[pos + 6 : pos + 8], "little")
        ipacked = content[pos + 8]
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            _need(pos, 3 * n)
            ct = np.frombuffer(
                content[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        _need(pos, 1)
        min_code = content[pos]
        pos += 1
        chunks = []
        while True:
            _need(pos, 1)
            ln = content[pos]
            if ln == 0:
                break
            _need(pos + 1, ln)
            chunks.append(content[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.array(
            _gif_lzw_decode(b"".join(chunks), min_code)[: fw * fh],
            dtype=np.int32,
        ).reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: rows 0::8, 4::8, 2::4, 1::2
            de = np.empty_like(idx)
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            de[order] = idx
            idx = de
        prev_region = canvas[top : top + fh, left : left + fw].copy()
        region = canvas[top : top + fh, left : left + fw]
        mask = (
            np.ones_like(idx, dtype=bool)
            if transparent is None
            else idx != transparent
        )
        region[mask] = ct[np.clip(idx, 0, len(ct) - 1)][mask]
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[top : top + fh, left : left + fw] = (
                gct[bg_index] if gct is not None and bg_index < len(gct) else 0
            )
        elif disposal == 3:  # restore to previous
            canvas[top : top + fh, left : left + fw] = prev_region
        transparent = None
        disposal = 0
    if not saw_trailer:
        # the spec's 0x3B trailer is mandatory; a stream that ends
        # between blocks is a truncated payload even if some frames
        # decoded (ADVICE r7: truncation always raises ValueError)
        raise ValueError("truncated GIF payload")
    if not frames:
        raise ValueError("GIF contained no image frames")
    return np.stack(frames).astype(np.float32) / 255.0


def _gif_lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """LZW compression for GIF image data (inverse of
    :func:`_gif_lzw_decode`): emits CLEAR, dictionary-compressed codes
    with width growth, END — LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for v in indices.ravel():
        nxt = cur + bytes([int(v)])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # canonical GIF pairing (round-trip-verified across widths 2-8
        # incl. the 4096 dictionary reset): encoder widens one code
        # AFTER the decoder's table-size trigger (next_code >
        # 2^code_size), because the decoder lags the encoder's
        # dictionary by one entry
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        cur = bytes([int(v)])
    if cur:
        emit(table[cur])
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def encode_gif(frames: "np.ndarray") -> bytes:
    """Animated-GIF encoder (uint8 ``(T, H, W, 3)`` frames, ≤256 distinct
    colors across the clip — exact palette, so decode∘encode is
    bit-exact; the write path of the GIF codec and the test fixture for
    :func:`decode_gif`)."""
    frames = np.asarray(frames, dtype=np.uint8)
    t, h, w, _ = frames.shape
    colors = np.unique(frames.reshape(-1, 3), axis=0)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    n_slots = 2
    while n_slots < max(len(colors), 2):
        n_slots *= 2
    lut = {tuple(c): i for i, c in enumerate(colors)}
    palette = np.zeros((n_slots, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    size_field = n_slots.bit_length() - 2  # 2^(field+1) == n_slots
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0]) + palette.tobytes()
    min_code = max(n_slots.bit_length() - 1, 2)
    for frame in frames:
        out += bytes([0x2C]) + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
        idx = np.array(
            [lut[tuple(px)] for px in frame.reshape(-1, 3)], dtype=np.int32
        )
        data = _gif_lzw_encode(idx, min_code)
        out += bytes([min_code])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += bytes([0x3B])
    return bytes(out)


def gif_decode_video(content: bytes, n_frames: int = 0) -> np.ndarray:
    """:func:`decode_gif` adapted to the video-decoder signature:
    ``n_frames`` caps the decoded clip when positive (decode the frames
    you need, like the ffmpeg hook's ``-frames:v``)."""
    frames = decode_gif(content)
    return frames[: int(n_frames)] if n_frames and int(n_frames) > 0 else frames


# --------------------------------------------------------------------------
# AVI container (RIFF) — pure stdlib (VERDICT r10 #6: de-stub video).
# Uncompressed 24-bit BI_RGB ('DIB ') streams encode AND decode bit-exact;
# MJPEG ('MJPG') streams parse structurally (frame blobs + per-frame dims
# via the existing JPEG header reader) with pixel decode left to an
# injected codec — baseline JPEG entropy decoding is the one genuinely
# third-party-codec-shaped piece.
# --------------------------------------------------------------------------


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF chunk
    sequence; chunks are padded to even sizes."""
    p = start
    while p + 8 <= end:
        fcc = buf[p : p + 4]
        (size,) = _struct.unpack("<I", buf[p + 4 : p + 8])
        yield fcc, p + 8, size
        p += 8 + size + (size & 1)


def encode_avi(
    frames: "np.ndarray | list[bytes]",
    fps: int = 10,
    width: int | None = None,
    height: int | None = None,
    codec: str = "dib",
    quality: int = 90,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """Encode an AVI clip. Pass a ``(T, H, W, 3)`` uint8 RGB array —
    written as an uncompressed BI_RGB ('DIB ') stream by default
    (bottom-up BGR rows padded to 4 bytes, the layout every AVI reader
    speaks) or, with ``codec="mjpg"``, as an MJPEG stream whose frames
    are baseline JPEGs from the package-own codec (`functions.jpeg`,
    r11; ``subsampling`` picks 4:4:4/4:2:2/4:2:0 per frame — r12, the
    chroma layout real camera MJPEG streams carry). A list of
    pre-encoded JPEG blobs (plus ``width``/``height``) also builds an
    MJPEG stream. Pure stdlib + numpy."""
    if isinstance(frames, np.ndarray):
        if frames.ndim != 4 or frames.shape[3] != 3:
            raise ValueError(f"expected (T, H, W, 3) uint8, got {frames.shape}")
        t, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        if codec.lower() == "mjpg":
            from deva_spark.functions.jpeg import encode_jpeg

            handler = b"MJPG"
            compression = _MJPG_FOURCC
            payloads = [
                encode_jpeg(
                    f, quality=quality, subsampling=subsampling,
                    progressive=progressive,
                )
                for f in frames.astype(np.uint8)
            ]
            chunk_id = b"00dc"
        elif codec.lower() == "dib":
            handler, compression = b"DIB ", 0
            row_pad = (-(w * 3)) % 4
            payloads = []
            for f in frames.astype(np.uint8):
                bgr = f[::-1, :, ::-1]  # bottom-up rows, BGR channel order
                if row_pad:
                    rows = b"".join(
                        r.tobytes() + b"\x00" * row_pad for r in bgr
                    )
                else:
                    rows = bgr.tobytes()
                payloads.append(rows)
            chunk_id = b"00db"
        else:
            raise ValueError(f"codec must be dib|mjpg (got {codec!r})")
    else:
        if width is None or height is None:
            raise ValueError("MJPEG encode needs explicit width/height")
        t, h, w = len(frames), int(height), int(width)
        handler = b"MJPG"
        compression = _MJPG_FOURCC
        payloads = [bytes(f) for f in frames]
        chunk_id = b"00dc"

    def chunk(fcc: bytes, data: bytes) -> bytes:
        return fcc + _struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(fcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fcc + data)

    buf_size = max(len(p) for p in payloads) if payloads else 0
    avih = _struct.pack(
        "<14I",
        1_000_000 // max(int(fps), 1),  # dwMicroSecPerFrame
        buf_size * max(int(fps), 1),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no idx1 chunk is written, so AVIF_HASINDEX (0x10)
        # must NOT be advertised — a strict reader would seek the index
        t, 0, 1, buf_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + handler
        + _struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,  # flags, priority, language, initial frames
            1, max(int(fps), 1),  # scale, rate
            0, t, buf_size, 0xFFFFFFFF, 0,  # start, length, bufsize, quality, samplesize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = _struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, len(payloads[0]) if payloads else 0,
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(chunk_id, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def _avi_parse(content: bytes) -> dict:
    """RIFF walk: returns ``{width, height, n_frames, handler, frames}``
    where ``frames`` is the list of raw stream payloads ('00db' DIB rows
    or '00dc' JPEG blobs) in file order. Raises ``ValueError`` on a
    non-AVI payload."""
    if not content or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    out = {
        "width": 0,
        "height": 0,
        "n_frames": 0,
        "handler": "",
        "compression": None,
        "frames": [],
    }
    for fcc, p, size in _riff_chunks(content, 12, len(content)):
        if fcc != b"LIST":
            continue
        kind = content[p : p + 4]
        if kind == b"hdrl":
            for f2, p2, s2 in _riff_chunks(content, p + 4, p + size):
                # length-guard every fixed-size unpack: a crawl-truncated
                # file whose chunk header DECLARES enough bytes but whose
                # buffer is cut short must raise the documented
                # ValueError, not escape as struct.error (the r13
                # _wav_fmt_data discipline, applied here after the same
                # bug class surfaced in the videofp fault-isolation
                # review — struct.error is not a ValueError)
                if f2 == b"avih" and s2 >= 40:
                    if p2 + 40 > len(content):
                        raise ValueError(
                            "truncated AVI: avih chunk declared past EOF"
                        )
                    vals = _struct.unpack("<10I", content[p2 : p2 + 40])
                    out["n_frames"] = vals[4]
                    out["width"], out["height"] = vals[8], vals[9]
                elif f2 == b"LIST" and content[p2 : p2 + 4] == b"strl":
                    in_vids = False
                    for f3, p3, s3 in _riff_chunks(
                        content, p2 + 4, p2 + s2
                    ):
                        if f3 == b"strh":
                            in_vids = content[p3 : p3 + 4] == b"vids"
                            if in_vids:
                                # fourCCs are case-insensitive in the
                                # wild ('mjpg' is common) — normalize
                                out["handler"] = (
                                    content[p3 + 4 : p3 + 8]
                                    .decode("ascii", "replace")
                                    .strip()
                                    .upper()
                                )
                        elif f3 == b"strf" and in_vids and s3 >= 20:
                            # BITMAPINFOHEADER.biCompression (offset 16)
                            # — the authoritative codec field; strh's
                            # handler is advisory and often zeroed
                            if p3 + 20 > len(content):
                                raise ValueError(
                                    "truncated AVI: strf chunk declared "
                                    "past EOF"
                                )
                            (out["compression"],) = _struct.unpack(
                                "<I", content[p3 + 16 : p3 + 20]
                            )
        elif kind == b"movi":
            for f2, p2, s2 in _riff_chunks(content, p + 4, p + size):
                if f2[2:4] in (b"db", b"dc"):
                    out["frames"].append(content[p2 : p2 + s2])
                elif f2 == b"LIST" and content[p2 : p2 + 4] == b"rec ":
                    # interleaved AVIs (VFW/DirectShow writers) group
                    # frame chunks inside 'rec ' lists — skipping them
                    # silently returned a 0-frame clip while the header
                    # promised n_frames (r11 review)
                    for f3, p3, s3 in _riff_chunks(content, p2 + 4, p2 + s2):
                        if f3[2:4] in (b"db", b"dc"):
                            out["frames"].append(content[p3 : p3 + s3])
    return out


def avi_info(content: bytes) -> tuple[int, int, int] | None:
    """``(width, height, n_frames)`` from the AVI main header, or None
    for a non-AVI payload — the metadata-extraction tier (header sniff,
    no frame decode), like :func:`png_dimensions` / :func:`wav_info`."""
    try:
        m = _avi_parse(content)
    except (ValueError, _struct.error):
        return None
    return m["width"], m["height"], m["n_frames"]


#: biCompression fourCC for MJPEG streams
_MJPG_FOURCC = _struct.unpack("<I", b"MJPG")[0]


def _avi_codec(m: dict) -> str | None:
    """Resolve a parsed AVI's video codec: ``"mjpg"`` / ``"dib"`` /
    ``None`` (unknown compression — H.264, XVID, ... — which must route
    to an external decoder, NEVER the raw-DIB reinterpretation: a
    compressed payload that happens to be >= stride*h would 'decode' to
    garbage pixels with no error, r11 review). biCompression decides
    when present (0 = BI_RGB); the strh handler fourCC breaks the tie
    for headerless streams."""
    handler = m["handler"]
    comp = m["compression"]
    if handler == "MJPG" or comp == _MJPG_FOURCC:
        return "mjpg"
    if comp == 0 or (comp is None and handler in ("", "DIB", "RGB")):
        return "dib"
    return None


def avi_frame_dims(content: bytes) -> list[tuple[int, int] | None]:
    """Per-frame dimensions of an MJPEG AVI via the JPEG header reader
    (one entry per '00dc' chunk — no pixel decode, the metadata tier);
    non-MJPEG streams return the container header dims for every frame."""
    m = _avi_parse(content)
    if _avi_codec(m) == "mjpg":
        return [jpeg_dimensions(f) for f in m["frames"]]
    return [(m["width"], m["height"])] * len(m["frames"])


def decode_avi(content: bytes, parsed: dict | None = None) -> np.ndarray:
    """Decode an AVI to ``(T, H, W, 3)`` uint8 RGB. Uncompressed BI_RGB
    streams invert :func:`encode_avi`'s DIB form bit-exactly; MJPEG
    streams decode each frame through the package-own JPEG codec
    (`functions.jpeg`, r11-r13 — lossy-but-deterministic pixels,
    baseline subsampled AND progressive; arithmetic-coded frames raise
    ``NotImplementedError`` there, the external-codec boundary)."""
    m = parsed if parsed is not None else _avi_parse(content)
    codec = _avi_codec(m)
    if codec == "mjpg":
        from deva_spark.functions.jpeg import decode_jpeg

        frames = [decode_jpeg(f) for f in m["frames"]]
        return (
            np.stack(frames)
            if frames
            else np.zeros((0, m["height"], m["width"], 3), dtype=np.uint8)
        )
    if codec is None:
        raise NotImplementedError(
            f"AVI compression {m['handler']!r}/{m['compression']!r} "
            "(H.264/XVID/...); inject an external decoder"
        )
    w, h = m["width"], m["height"]
    stride = w * 3 + ((-(w * 3)) % 4)
    frames = []
    for payload in m["frames"]:
        if len(payload) < stride * h:
            raise ValueError("truncated DIB frame")
        rows = np.frombuffer(payload[: stride * h], dtype=np.uint8).reshape(
            h, stride
        )[:, : w * 3].reshape(h, w, 3)
        frames.append(rows[::-1, :, ::-1])  # back to top-down RGB
    return (
        np.stack(frames)
        if frames
        else np.zeros((0, h, w, 3), dtype=np.uint8)
    )


def avi_decode_video(
    content: bytes, n_frames: int = 0, parsed: dict | None = None
) -> np.ndarray:
    """:func:`decode_avi` adapted to the video-decoder signature
    (float32 in [0, 1], optional frame cap). ``parsed`` reuses a
    container walk the caller already did (the dispatcher's codec
    sniff — r11 review: decode was paying two full RIFF walks per
    clip on the stated CPU hot spot)."""
    clip = decode_avi(content, parsed=parsed).astype(np.float32) / 255.0
    return clip[: int(n_frames)] if n_frames and int(n_frames) > 0 else clip


def default_video_decoder() -> Callable[[bytes, int], np.ndarray]:
    """Per-clip dispatching decoder: GIF and uncompressed AVI payloads
    decode with the REAL pure-stdlib codecs (works in any container),
    anything else uses ffmpeg when the binary exists, else the
    deterministic fake — resolve once on the driver and pass the result
    to :func:`video_features` so every executor uses the same policy."""
    import shutil

    other = ffmpeg_decode_video if shutil.which("ffmpeg") else fake_decode_video

    def dispatch(content: bytes, n_frames: int = 0) -> np.ndarray:
        if content[:4] == b"GIF8":
            return gif_decode_video(content, n_frames)
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            # only claim codecs the stdlib path really speaks; an AVI
            # carrying H.264/XVID (or an unparseable container) falls
            # through to ffmpeg/fake like any other format (r11 review —
            # previously it raised, failing the whole task)
            try:
                m = _avi_parse(content)
                if _avi_codec(m) is not None:
                    return avi_decode_video(content, n_frames, parsed=m)
            except (ValueError, _struct.error):
                pass
        return other(content, n_frames)

    return dispatch


def video_features(
    df: DataFrame,
    decoder: Callable[[bytes, int], np.ndarray] | None = None,
    content_col: str = "content",
    meta_col: str = "meta",
    out_col: str = "features",
    pool: int = 4,
    sample_every: int = 2,
) -> DataFrame:
    """Video → pooled feature vector, one ``mapInPandas`` stage: decode
    (injected; deterministic fake by default), temporal subsample every
    ``sample_every`` frames, per-frame ``pool``×``pool`` spatial mean-pool
    with channel-mean flatten, then temporal mean over the sampled frames
    — output array<float> of length ``pool*pool`` (the video twin of
    :func:`decode_features` / :func:`audio_features`).

    Scale shape: bytes stay in the Arrow batch until the decoder call; at
    100 TB the decode stage is the CPU hot spot, so partition count (not
    this operator) governs parallelism — there is no shuffle here at all.
    """
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    dec = decoder or fake_decode_video
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = []
            for content, meta in zip(pdf[content_col], pdf[meta_col]):
                n = int(meta["n_frames"] or 0) if meta is not None else 0
                clip = dec(content, n)  # (T, H, W, C) float32
                if clip.shape[0] == 0:
                    # zero-frame clip (valid container, empty movi):
                    # diagnosable error, not a numpy reshape crash (r11)
                    raise ValueError(
                        "decoded clip has zero frames; nothing to pool"
                    )
                if clip.shape[1] < pool or clip.shape[2] < pool:
                    # fail loudly: a silent mean over an empty pooled axis
                    # would emit NaN features (ADVICE r5)
                    raise ValueError(
                        f"decoded frames {clip.shape[1]}x{clip.shape[2]} "
                        f"smaller than pool={pool}; shrink pool or upscale "
                        "in the decoder"
                    )
                clip = clip[:: max(int(sample_every), 1)]
                hs = clip.shape[1] // pool
                ws = clip.shape[2] // pool
                pooled = clip[:, : hs * pool, : ws * pool].reshape(
                    clip.shape[0], pool, hs, pool, ws, -1
                ).mean(axis=(2, 4, 5))  # (T', pool, pool)
                feats.append([float(x) for x in pooled.mean(axis=0).ravel()])
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _det_bytes(seed: bytes, tag: bytes, n: int) -> bytes:
    """Deterministic byte stream: md5(seed|tag|counter) blocks — a pure
    function of (seed, tag), reproducible on any worker/retry."""
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.md5(seed + tag + str(c).encode()).digest()
        c += 1
    return bytes(out[:n])


def synthesized_dims(seed: bytes) -> dict[str, tuple[int, ...]]:
    """Per-doc media geometry derived from the first six bytes of
    ``md5(text)`` — shared by :func:`synthesize_media_from_text`
    (``vary_dims=True``) and the x107 DuckDB oracle, which recomputes the
    same arithmetic from ``md5(text)``'s hex (queries.py x107). Keeping
    the mapping in one visible place is what makes the cross-engine
    check honest: the oracle predicts what the DECODER must sniff out of
    the real PNG/WAV/GIF headers."""
    return {
        "image": (4 + seed[0] % 5, 4 + seed[1] % 5),  # (w, h) in 4..8
        "audio": (256 + (seed[2] % 8) * 32,),  # samples, multiple of 8
        "video": (4 + seed[4] % 5, 4 + seed[5] % 5, 2 + seed[3] % 3),
    }


def synthesize_doc_images(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    twins: bool = False,
    twin_every: int = 50,
    twin_shift: int = 5,
    twins_only: bool = False,
) -> DataFrame:
    """Deterministic per-document PNG fixtures for the image-dedup
    tier (x115/x117 and the ``img_dhash`` staged artifact share this
    EXACT synthesis, so the staged corpus and the inline corpus are
    bit-identical): pixels seeded by ``md5(text)`` SALTED WITH the doc
    id (duplicate texts cannot alias two docs to one image), dims
    8-15 px per side from the seed. With ``twins`` every
    ``twin_every``-th doc also emits a brightness(+``twin_shift``,
    clipped) copy — the classic re-exposure near-dup. Output ids:
    ``doc_id*10`` (base), ``doc_id*10+1`` (twin). ``twins_only`` emits
    just the twin rows (the x117 arrival-batch shape: base PIXELS are
    needed to derive the twin, the base PNG encoding is not)."""
    if twins_only and not twins:
        raise ValueError("twins_only requires twins=True")
    out_schema = "image_id long, content binary"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                seed = hashlib.md5(
                    (text or "").encode() + str(int(did)).encode()
                ).digest()
                h, w = 8 + seed[0] % 8, 8 + seed[1] % 8
                img = np.frombuffer(
                    _det_bytes(seed, b"ih", h * w * 3), dtype=np.uint8
                ).reshape(h, w, 3)
                if not twins_only:
                    rows.append((int(did) * 10, encode_png(img)))
                if twins and did % twin_every == 0:
                    twin = np.clip(
                        img.astype(np.int16) + twin_shift, 0, 255
                    ).astype(np.uint8)
                    rows.append((int(did) * 10 + 1, encode_png(twin)))
            yield pd.DataFrame(rows, columns=["image_id", "content"])

    return df.mapInPandas(run, schema=out_schema)


def _walk_grid(seed: bytes, tag: bytes, rows: int = 8, cols: int = 9) -> "np.ndarray":
    """Reflected-random-walk luminance grid for video fixtures: each row
    starts at 125 and steps exactly +/-45 per column (direction bits from
    the seed stream, REFLECTED at [10, 245] instead of clipped), so every
    horizontally adjacent pair differs by exactly 45 — dhash64's
    comparisons all carry a 45-level margin, far above JPEG-q92
    reconstruction error (~+/-10) and invariant to global brightness
    shifts (<= 10, no clipping: values stay within [35, 215]). Direction
    bits are seeded per (doc, frame), so distinct frames' dhashes are
    ~uniform 64-bit values while a re-encoded/brightness-shifted twin
    frame reproduces the grid's comparison signs exactly."""
    bits = _det_bytes(seed, tag, rows * (cols - 1))
    g = np.empty((rows, cols), dtype=np.float64)
    g[:, 0] = 125.0
    for i in range(rows):
        v = 125.0
        for j in range(cols - 1):
            step = 45.0 if bits[i * (cols - 1) + j] & 1 else -45.0
            if not 10.0 <= v + step <= 245.0:
                step = -step  # reflect, never clip (keeps |delta| = 45)
            v += step
            g[i, j + 1] = v
    return g


def synthesize_doc_videos(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    twins: bool = False,
    twin_every: int = 50,
    twin_shift: int = 6,
    twin_mode: str = "trim",
    twins_only: bool = False,
    n_frames: int = 6,
    scale: int = 4,
) -> DataFrame:
    """Deterministic per-document AVI clips for the video-dedup tier
    (x118/x119 and the ``vid_fdhash`` staged artifact share this EXACT
    synthesis): ``n_frames`` frames, each a :func:`_walk_grid` rendered
    at ``scale``x block resolution (8*scale x 9*scale gray RGB — the
    4:1 half-pixel bilinear resize inside dhash64 recovers the grid
    exactly, so base-frame dhashes are closed-form stable), seeded by
    ``md5(text)`` SALTED WITH the doc id. The base clip is lossless
    BI_RGB AVI. With ``twins`` every ``twin_every``-th doc also emits
    the classic crawl near-dup: the same clip HEAD-TRIMMED by one frame
    (``twin_mode="trim"``) or FRAME-RATE-HALVED (``twin_mode=
    "resample"`` keeps every other frame — the fps-resampled re-upload
    the offset vote cannot see, x123's planted shape), brightness-
    shifted ``+twin_shift``, and RE-ENCODED as MJPEG q92 — invisible to
    byte dedup and to every exact per-frame digest. Output ids:
    ``doc_id*10`` (base), ``doc_id*10+1`` (twin). ``twins_only`` emits
    just the twin rows — the arrival-batch synthesis (x119) needs the
    base PIXELS to derive each twin but has no use for the base clip's
    lossless encoding, which a post-hoc filter would still have paid
    for (review r14)."""
    if twin_mode not in ("trim", "resample"):
        raise ValueError(f"twin_mode must be trim|resample, got {twin_mode!r}")
    if twins_only and not twins:
        raise ValueError("twins_only requires twins=True")
    out_schema = "video_id long, content binary"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                seed = hashlib.md5(
                    (text or "").encode() + str(int(did)).encode()
                ).digest()
                frames = np.stack(
                    [
                        np.repeat(
                            np.repeat(
                                _walk_grid(seed, b"vd%d" % t), scale, axis=0
                            ),
                            scale,
                            axis=1,
                        )
                        for t in range(n_frames)
                    ]
                )
                clip = np.repeat(
                    frames.astype(np.uint8)[:, :, :, None], 3, axis=3
                )
                if not twins_only:
                    rows.append(
                        (int(did) * 10, encode_avi(clip, codec="dib"))
                    )
                if twins and did % twin_every == 0:
                    src = clip[1:] if twin_mode == "trim" else clip[::2]
                    twin = np.clip(
                        src.astype(np.int16) + twin_shift, 0, 255
                    ).astype(np.uint8)
                    rows.append(
                        (
                            int(did) * 10 + 1,
                            encode_avi(twin, codec="mjpg", quality=92),
                        )
                    )
            yield pd.DataFrame(rows, columns=["video_id", "content"])

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def synthesize_group_images(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "grp",
) -> DataFrame:
    """Cross-document image near-dups for the joint-dedup tier (x122):
    every doc in the same ``group_col`` value gets the SAME base
    picture (pixels seeded by the group id alone — re-posted images
    across unrelated documents, the multimodal crawl shape), each
    brightness-shifted by ``(doc_id % 3) * 2`` so payload bytes differ
    per doc while dhash (gradient-sign) matches within the banded
    radius. Output ids are the DOC ids — the joint resolution unions
    these edges with text-pair edges over one id space."""
    out_schema = "image_id long, content binary"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for did, grp in zip(pdf[id_col], pdf[group_col]):
                seed = hashlib.md5(str(int(grp)).encode()).digest()
                h, w = 8 + seed[0] % 8, 8 + seed[1] % 8
                img = np.frombuffer(
                    _det_bytes(seed, b"gi", h * w * 3), dtype=np.uint8
                ).reshape(h, w, 3)
                shifted = np.clip(
                    img.astype(np.int16) + (int(did) % 3) * 2, 0, 255
                ).astype(np.uint8)
                rows.append((int(did), encode_png(shifted)))
            yield pd.DataFrame(rows, columns=["image_id", "content"])

    return df.mapInPandas(run, schema=out_schema)


def synthesize_media_from_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vary_dims: bool = False,
) -> DataFrame:
    """Deterministic multimodal payloads derived from a TEXT corpus: for
    each input row, emit one REAL PNG image, one REAL 16-bit WAV clip,
    and one REAL animated GIF whose bytes are a pure function of
    ``md5(text)`` — the stand-in for crawled media when the testdata has
    none, with every byte produced by this package's own stdlib codecs
    on EXECUTORS (Arrow-batched mapInPandas, no driver loop). Each row
    carries ``src_digest``: the md5 of the canonical source array, so a
    downstream decode can prove the encode→shuffle→decode roundtrip
    bit-exactly (:func:`codec_roundtrip_audit`). With ``vary_dims`` the
    geometry itself varies per doc via :func:`synthesized_dims`, making
    the decoded header dims a NON-constant pure function of ``md5(text)``
    that an external SQL oracle can recompute (VERDICT r10 #1)."""
    import io
    import wave

    out_schema = (
        f"{id_col} long, kind string, content binary, src_digest string"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                seed = hashlib.md5((text or "").encode()).digest()
                if vary_dims:
                    geo = synthesized_dims(seed)
                    (iw, ih), (ns,), (vw, vh, vt) = (
                        geo["image"], geo["audio"], geo["video"],
                    )
                else:
                    iw = ih = vw = vh = 8
                    ns, vt = 400, 2
                img = np.frombuffer(
                    _det_bytes(seed, b"img", iw * ih * 3), dtype=np.uint8
                ).reshape(ih, iw, 3)
                rows.append(
                    (
                        int(mid),
                        "image",
                        encode_png(img),
                        hashlib.md5(img.tobytes()).hexdigest(),
                    )
                )
                pcm = np.frombuffer(
                    _det_bytes(seed, b"aud", ns * 2), dtype="<i2"
                )
                bio = io.BytesIO()
                with wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(pcm.tobytes())
                rows.append(
                    (
                        int(mid),
                        "audio",
                        bio.getvalue(),
                        hashlib.md5(pcm.tobytes()).hexdigest(),
                    )
                )
                vid = np.frombuffer(
                    _det_bytes(seed, b"vid", vt * vh * vw * 3), dtype=np.uint8
                ).reshape(vt, vh, vw, 3)
                rows.append(
                    (
                        int(mid),
                        "video",
                        encode_gif(vid),
                        hashlib.md5(vid.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "kind", "content", "src_digest"]
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def synthesize_avi_from_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    codec: str = "dib",
    quality: int = 90,
    subsampling: str = "444",
    progressive: bool = False,
) -> DataFrame:
    """One REAL AVI clip per input row, geometry and pixels pure
    functions of ``md5(text)`` (:func:`synthesized_dims`'s video entry —
    the same arithmetic the x108/x109 DuckDB oracles recompute), the AVI
    twin of :func:`synthesize_media_from_text`. ``codec="dib"`` proves
    the RIFF/BI_RGB container bit-exactly; ``codec="mjpg"`` runs the
    package-own baseline JPEG entropy codec per frame. ``src_digest`` is
    the md5 of the DECODED clip computed on the ENCODING executor — for
    DIB that equals the source digest (lossless); for MJPEG it pins the
    deterministic lossy pixels, so a downstream decode on another worker
    proves the whole entropy pipeline is platform- and
    partitioning-invariant."""
    out_schema = f"{id_col} long, content binary, src_digest string"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                seed = hashlib.md5((text or "").encode()).digest()
                vw, vh, vt = synthesized_dims(seed)["video"]
                clip = np.frombuffer(
                    _det_bytes(seed, b"avi", vt * vh * vw * 3),
                    dtype=np.uint8,
                ).reshape(vt, vh, vw, 3)
                avi = encode_avi(
                    clip, codec=codec, quality=quality,
                    subsampling=subsampling, progressive=progressive,
                )
                # DIB roundtrips bit-exactly (pinned by
                # test_avi_dib_roundtrip_bit_exact), so its digest needs
                # no re-decode; the decode-based digest is load-bearing
                # only for the lossy mjpg path
                digest = (
                    hashlib.md5(clip.tobytes()).hexdigest()
                    if codec.lower() == "dib"
                    else hashlib.md5(decode_avi(avi).tobytes()).hexdigest()
                )
                rows.append((int(mid), avi, digest))
            yield pd.DataFrame(
                rows, columns=[id_col, "content", "src_digest"]
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def avi_roundtrip_audit(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode every AVI payload with the REAL stdlib container codec and
    emit one audit row: header dims (``avi_info``), decoded clip shape,
    and ``ok`` — header agrees with the decoded array AND the decoded
    pixels' md5 equals the encoder-side digest (roundtrip bit-exact
    across the Arrow boundary)."""
    out_schema = (
        f"{id_col} long, ok boolean, width int, height int, n_frames int"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for mid, content, src in zip(
                pdf[id_col], pdf["content"], pdf["src_digest"]
            ):
                content = bytes(content)
                info = avi_info(content)
                clip = decode_avi(content)
                t, h, w = clip.shape[0], clip.shape[1], clip.shape[2]
                ok = (
                    info == (w, h, t)
                    and hashlib.md5(clip.tobytes()).hexdigest() == src
                )
                rows.append((int(mid), bool(ok), w, h, t))
            yield pd.DataFrame(
                rows, columns=[id_col, "ok", "width", "height", "n_frames"]
            )

    return media.mapInPandas(run, schema=out_schema)


def codec_roundtrip_audit(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Decode every payload with the REAL stdlib codecs and emit one
    audit row per media: sniffed header dimensions, decoded shape, the
    md5 of the canonical decoded array, and ``ok`` — whether that digest
    equals the encoder-side ``src_digest`` (the encode→decode roundtrip
    proven bit-exact ACROSS the Arrow/shuffle boundary, not inside one
    process). Golden-value shape: counts, dims, and digests are pure
    functions of the input texts, so the row set is stable across runs,
    partitionings, and task retries — the driver's rows-only check pins
    the count and any regression flips ``ok`` rows."""
    out_schema = (
        f"{id_col} long, kind string, ok boolean, width int, height int, "
        "n_frames int, digest string"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for mid, kind, content, src in zip(
                pdf[id_col], pdf["kind"], pdf["content"], pdf["src_digest"]
            ):
                content = bytes(content)
                if kind == "image":
                    dims = png_dimensions(content)
                    arr = np.rint(decode_png(content) * 255).astype(np.uint8)
                    h, w = arr.shape[0], arr.shape[1]
                    dig = hashlib.md5(arr.tobytes()).hexdigest()
                    ok = dims == (w, h) and dig == src
                    rows.append((int(mid), kind, bool(ok), w, h, 1, dig))
                elif kind == "audio":
                    info = wav_info(content)
                    x = decode_wav(content)  # float32 (frames, ch), exact /2^15
                    pcm = np.rint(x * 32768.0).astype("<i2")
                    dig = hashlib.md5(pcm.tobytes()).hexdigest()
                    ok = (
                        info is not None
                        and info[2] == x.shape[0]
                        and dig == src
                    )
                    rows.append(
                        (int(mid), kind, bool(ok), None, None, x.shape[0], dig)
                    )
                else:  # video
                    clip = np.rint(gif_decode_video(content) * 255).astype(
                        np.uint8
                    )
                    t, h, w = clip.shape[0], clip.shape[1], clip.shape[2]
                    dig = hashlib.md5(clip.tobytes()).hexdigest()
                    rows.append(
                        (int(mid), kind, bool(dig == src), w, h, t, dig)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "kind", "ok", "width", "height", "n_frames",
                    "digest",
                ],
            )

    return media.mapInPandas(run, schema=out_schema)
