"""Byte-parity fuzz gate for the JPEG entropy codec (jpeg.py).

Encodes a deterministic corpus spanning every encoder mode (sizes 1x1
through 33x41, gray + color, qualities, 444/422/420, baseline /
multi-scan / optimize / progressive, restart intervals) and prints one
md5 over ALL encoded bytes plus one md5 over ALL decoded pixels. Any
codec optimization must leave BOTH digests unchanged — run before and
after the change and diff the output.

Usage: python tools/fuzz_jpeg_parity.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deva_spark.functions.jpeg import decode_jpeg, encode_jpeg  # noqa: E402


def corpus():
    rng = np.random.default_rng(20260818)
    dims = [(1, 1), (3, 5), (8, 8), (7, 9), (16, 16), (17, 23), (24, 16),
            (33, 41)]
    for h, w in dims:
        for ncomp in (1, 3):
            shape = (h, w) if ncomp == 1 else (h, w, 3)
            # three pixel regimes: flat, smooth gradient, full-entropy
            flat = np.full(shape, 128, dtype=np.uint8)
            grad = (
                np.fromfunction(lambda *ix: (ix[0] * 7 + ix[1] * 13) % 256,
                                shape)
            ).astype(np.uint8)
            noise = rng.integers(0, 256, size=shape, dtype=np.uint8)
            for arr in (flat, grad, noise):
                yield arr


def main() -> None:
    enc_md5 = hashlib.md5()
    pix_md5 = hashlib.md5()
    n = 0
    for arr in corpus():
        color = arr.ndim == 3
        variants = [
            dict(quality=90),
            dict(quality=35),
            dict(quality=90, restart_interval=2),
            dict(quality=90, optimize=True),
            dict(quality=90, progressive=True),
            dict(quality=35, progressive=True, restart_interval=3),
        ]
        if color:
            variants += [
                dict(quality=90, subsampling="420"),
                dict(quality=75, subsampling="422", restart_interval=1),
                dict(quality=90, subsampling="420", progressive=True),
                dict(quality=90, multi_scan=True),
                dict(quality=50, subsampling="420", optimize=True),
            ]
        for kw in variants:
            data = encode_jpeg(arr, **kw)
            enc_md5.update(data)
            pix_md5.update(decode_jpeg(data).tobytes())
            n += 1
    print(f"n_encodes={n}")
    print(f"encoded_md5={enc_md5.hexdigest()}")
    print(f"decoded_md5={pix_md5.hexdigest()}")


if __name__ == "__main__":
    main()
