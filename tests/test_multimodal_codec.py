"""Pure-stdlib PNG codec: roundtrips, filter reconstruction, Spark stage."""

import numpy as np
import pytest

from deva_spark.functions import multimodal as mm


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint16).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    img = _rand((5, 7, channels), seed=channels)
    decoded = mm.decode_png(mm.encode_png(img))
    assert decoded.shape == (5, 7, channels)
    np.testing.assert_array_equal((decoded * 255.0).round().astype(np.uint8), img)


def test_png_decode_reconstructs_all_filters():
    # forward-apply each scanline filter per the PNG spec, then decode
    import struct
    import zlib

    img = _rand((4, 6, 3), seed=99)
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y, ftype in zip(range(h), (1, 2, 3, 4)):  # Sub, Up, Average, Paeth
        line = flat[y]
        out = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            a = line[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            out[i] = (line[i] - pred) % 256
        raw.append(ftype)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ, data):
        return len(data).to_bytes(4, "big") + typ + data + zlib.crc32(typ + data).to_bytes(4, "big")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    decoded = (mm.decode_png(png) * 255.0).round().astype(np.uint8)
    np.testing.assert_array_equal(decoded.reshape(h, w, c), img)


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"JFIF not a png")
    with pytest.raises(NotImplementedError):
        # 16-bit depth unsupported
        import struct
        import zlib

        def chunk(typ, data):
            return len(data).to_bytes(4, "big") + typ + data + zlib.crc32(typ + data).to_bytes(4, "big")

        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        mm.decode_png(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


def test_decode_features_real_bytes_match_numpy(spark):
    # end-to-end on REAL image bytes: Spark's pooled features == local numpy
    img = _rand((8, 8, 3), seed=7)
    payload = mm.encode_png(img)
    rows = [(1, "image", payload, {"width": None, "height": None, "n_frames": None,
                                   "sample_rate": None, "mime": None})]
    out = mm.decode_features(mm.media_table(spark, rows), pool=4).collect()[0]
    local = (img.astype(np.float32) / 255.0).reshape(4, 2, 4, 2, 3).mean(axis=(1, 3, 4))
    np.testing.assert_allclose(np.array(out.features).reshape(4, 4), local, rtol=1e-6)


def test_extract_meta_real_png(spark):
    img = _rand((3, 4, 1), seed=1)
    rows = [(9, "image", mm.encode_png(img), {"width": None, "height": None,
                                              "n_frames": None, "sample_rate": None, "mime": None})]
    meta = mm.extract_meta(mm.media_table(spark, rows)).collect()[0].meta
    assert (meta.width, meta.height, meta.mime) == (4, 3, "image/png")
