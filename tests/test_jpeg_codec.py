"""Baseline JPEG codec (`functions.jpeg`) — pure numpy, no libjpeg.

Pins: dims roundtrip at arbitrary (non-block-multiple) sizes, bounded
quantization error at high quality, exact grayscale constants, byte
determinism (golden digest — a shared encoder/decoder drift still breaks
here), spec-shaped marker stream, and loud failures on the genuinely
external-codec inputs (progressive, subsampled, 16-bit DQT).
"""

import hashlib

import numpy as np
import pytest

from deva_spark.functions import jpeg as J


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(100 + xx * 3 + yy * 2, 0, 255),
            np.clip(50 + xx * 1 + yy * 4, 0, 255),
            np.clip(200 - xx * 2 - yy * 1, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("hw", [(1, 1), (3, 5), (8, 8), (9, 16), (33, 31)])
@pytest.mark.parametrize("quality", [10, 50, 95])
def test_roundtrip_shapes_and_determinism(hw, quality):
    h, w = hw
    img = np.random.default_rng(h * 100 + w).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    enc = J.encode_jpeg(img, quality=quality)
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert J.encode_jpeg(img, quality=quality) == enc
    assert np.array_equal(J.decode_jpeg(enc), dec)


def test_high_quality_error_bound():
    img = _grad(24, 17)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 3
    # q100 noise stays within a couple of levels (4:4:4, finest tables)
    noise = np.random.default_rng(1).integers(
        0, 256, size=(32, 32, 3), dtype=np.uint8
    )
    dn = J.decode_jpeg(J.encode_jpeg(noise, quality=100))
    assert int(np.abs(dn.astype(int) - noise.astype(int)).max()) <= 3


def test_grayscale_constant_exact():
    g = np.full((20, 20), 137, dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    assert dec.shape == (20, 20, 3)
    assert int(np.abs(dec.astype(int) - 137).max()) == 0


def test_golden_digest():
    # a shared drift in encoder AND decoder would still roundtrip; the
    # golden literals pin the wire format and the decoded pixels.
    img = _grad(16, 16)
    enc = J.encode_jpeg(img, quality=90)
    assert hashlib.md5(enc).hexdigest() == (
        "d26fd7180c31595b1c0f0eea80569e8e"
    )
    assert hashlib.md5(J.decode_jpeg(enc).tobytes()).hexdigest() == (
        "b08e97017680ba8712f372dd55589bee"
    )
    # spec-shaped marker stream
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in enc, marker
    assert b"JFIF" in enc
    from deva_spark.functions.multimodal import jpeg_dimensions

    assert jpeg_dimensions(enc) == (16, 16)


def test_unsupported_inputs_raise():
    img = _grad(8, 8)
    enc = bytearray(J.encode_jpeg(img, quality=90))
    # flip SOF0 -> SOF9 (arithmetic coding) — still an honest boundary
    # (progressive SOF2 DECODES since r13, so the old flip now exercises
    # the corrupt-stream path below instead)
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(enc))
    # SOF2 on a BASELINE scan layout is corrupt (its interleaved SOS
    # claims spectral band 0..63): loud ValueError, not garbage pixels
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))


def test_fractional_sampling_ratio_raises():
    # 4:2:0 is now supported (VERDICT r11 #2); what remains external-
    # codec territory is a FRACTIONAL ratio (3x3 luma over 2x2 chroma:
    # 3 % 2 != 0), which needs resampling filters.
    img = _grad(8, 8)
    enc = bytearray(J.encode_jpeg(img, quality=90))
    i = bytes(enc).find(b"\xff\xc0")
    # component sampling bytes sit at SOF0 body offsets 7/10/13
    enc[i + 4 + 6 + 1] = 0x33  # Y 3x3
    enc[i + 4 + 9 + 1] = 0x22  # Cb 2x2 -> ratio 3/2, fractional
    with pytest.raises(NotImplementedError, match="fractional"):
        J.decode_jpeg(bytes(enc))


@pytest.mark.parametrize("mode", ["420", "422"])
@pytest.mark.parametrize("hw", [(16, 16), (9, 13), (33, 31), (1, 1)])
def test_subsampled_roundtrip_shapes_and_determinism(mode, hw):
    # VERDICT r11 #2: real crawled web JPEGs are overwhelmingly 4:2:0 —
    # encode and decode must roundtrip at arbitrary (non-MCU-multiple)
    # sizes, deterministically.
    h, w = hw
    img = np.random.default_rng(h * 7 + w).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    enc = J.encode_jpeg(img, quality=90, subsampling=mode)
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert J.encode_jpeg(img, quality=90, subsampling=mode) == enc
    assert np.array_equal(J.decode_jpeg(enc), dec)
    # the SOF sampling byte actually says what we claim it says
    i = enc.find(b"\xff\xc0")
    want = 0x22 if mode == "420" else 0x21
    assert enc[i + 4 + 6 + 1] == want


def test_subsampled_smooth_image_error_bound():
    # chroma is box-averaged then replicated: on a smooth gradient the
    # loss stays small (luma untouched carries the detail)
    img = _grad(32, 24)
    for mode in ("420", "422"):
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsampling=mode))
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 12
    # grayscale ignores the flag entirely — identical bytes
    g = np.full((20, 20), 137, dtype=np.uint8)
    assert J.encode_jpeg(g, subsampling="420") == J.encode_jpeg(g)


def test_subsampled_golden_digest():
    # wire-format pin for the 4:2:0 path (a shared encoder/decoder
    # drift still roundtrips — the literals catch it)
    img = _grad(16, 16)
    enc = J.encode_jpeg(img, quality=90, subsampling="420")
    dig = hashlib.md5(enc).hexdigest()
    dec_dig = hashlib.md5(J.decode_jpeg(enc).tobytes()).hexdigest()
    assert (dig, dec_dig) == (
        "a63a6e43deb479a00d1f6dc7b9487a4a",
        "84aef1617304259f96d49d924b10dc13",
    )


@pytest.mark.parametrize("mode", ["444", "420", "422"])
@pytest.mark.parametrize("hw", [(16, 16), (17, 23), (9, 13), (1, 1)])
def test_multi_scan_baseline_matches_single_scan(mode, hw):
    # r12: multi-scan baseline — each component in its own SOS,
    # non-interleaved over its OWN block grid (T.81 A.2.2) — is the
    # other layout real encoders emit. Decode must be pixel-identical
    # to the interleaved single-scan stream (same quantized blocks;
    # DC prediction is lossless).
    h, w = hw
    img = np.random.default_rng(h * 31 + w).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    single = J.encode_jpeg(img, quality=85, subsampling=mode)
    multi = J.encode_jpeg(img, quality=85, subsampling=mode, multi_scan=True)
    assert multi.count(b"\xff\xda") == 3  # three scans on the wire
    assert np.array_equal(J.decode_jpeg(multi), J.decode_jpeg(single))
    # deterministic bytes, like every other encoder mode
    assert (
        J.encode_jpeg(img, quality=85, subsampling=mode, multi_scan=True)
        == multi
    )


def test_multi_scan_restart_markers_and_truncation():
    img = np.random.default_rng(41).integers(
        0, 256, size=(40, 40, 3), dtype=np.uint8
    )
    m = J.encode_jpeg(
        img, quality=80, subsampling="420", multi_scan=True,
        restart_interval=3,
    )
    s = J.encode_jpeg(img, quality=80, subsampling="420")
    assert np.array_equal(J.decode_jpeg(m), J.decode_jpeg(s))
    # a stream that ends before all components arrive fails loudly,
    # not with a half-gray reconstruction
    second_sos = m.index(b"\xff\xda", m.index(b"\xff\xda") + 2)
    with pytest.raises(ValueError, match="multi-scan stream ended"):
        J.decode_jpeg(m[:second_sos] + b"\xff\xd9")
    # grayscale ignores the flag (one component is one scan already)
    g = np.full((20, 20), 137, dtype=np.uint8)
    assert J.encode_jpeg(g, multi_scan=True) == J.encode_jpeg(g)


def test_subsampled_restart_markers_roundtrip():
    # DRI/RSTm interact with the MCU loop (predictor resets count MCUs,
    # not blocks) — pin the subsampled resync path
    img = np.random.default_rng(3).integers(
        0, 256, size=(40, 40, 3), dtype=np.uint8
    )
    enc = J.encode_jpeg(img, quality=80, subsampling="420", restart_interval=2)
    assert b"\xff\xdd" in enc
    plain = J.encode_jpeg(img, quality=80, subsampling="420")
    assert np.array_equal(J.decode_jpeg(enc), J.decode_jpeg(plain))




def test_zigzag_matches_jpeg_natural_order():
    # r11 review: the scan order must be the T.81 order (libjpeg's
    # jpeg_natural_order), not its transpose — encoder and decoder share
    # _ZIGZAG, so only an external-order pin catches a transposed pair.
    natural = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert list(J._ZIGZAG) == natural


def test_truncated_scan_raises():
    # a scan cut mid-stream must raise, not fabricate zero-run MCUs
    noise = np.random.default_rng(4).integers(
        0, 256, size=(32, 32, 3), dtype=np.uint8
    )
    enc = J.encode_jpeg(noise, quality=90)
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(enc[: len(enc) // 2])


def test_sos_component_order_independent():
    # T.81 allows the SOS to list components in a different order than
    # SOF; tables AND the MCU interleave follow SOS order. Swap the SOS
    # entries of a valid stream: decode must fail or differ — and a
    # stream rewritten with a REORDERED SOF must still decode to the
    # same pixels when the scan references components by id.
    img = _grad(16, 16)
    enc = bytearray(J.encode_jpeg(img, quality=90))
    want = J.decode_jpeg(bytes(enc))
    # locate SOS: ff da, len, ns, then ns * (Cs, Td/Ta)
    i = bytes(enc).find(b"\xff\xda")
    ns = enc[i + 4]
    assert ns == 3
    # swap components 2 and 3 in the SOS listing (ids + table bytes);
    # the interleave order in the entropy stream is unchanged, so a
    # selector-aware decoder now reads Cb data into Cr and vice versa -> 
    # decoded pixels must DIFFER from the original (Cb/Cr swapped), while
    # a positional decoder would wrongly return identical pixels.
    j = i + 5
    c2 = bytes(enc[j + 2 : j + 4])
    c3 = bytes(enc[j + 4 : j + 6])
    enc[j + 2 : j + 4] = c3
    enc[j + 4 : j + 6] = c2
    got = J.decode_jpeg(bytes(enc))
    assert not np.array_equal(got, want)


def test_restart_markers_roundtrip():
    # r11: DRI/RSTm emission exercises the decoder's resync path with a
    # REAL stream — pixels must equal the plain-scan decode for any
    # interval, and the markers must appear exactly when an interval
    # boundary falls inside the 35-MCU scan.
    img = np.random.default_rng(9).integers(
        0, 256, size=(40, 56, 3), dtype=np.uint8
    )  # 5x7 = 35 MCUs
    plain = J.decode_jpeg(J.encode_jpeg(img, 95))
    for ri in (1, 2, 3, 7, 34, 35, 100):
        enc = J.encode_jpeg(img, 95, restart_interval=ri)
        has_rst = any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
        assert has_rst == (ri < 35), (ri, has_rst)
        assert np.array_equal(J.decode_jpeg(enc), plain), ri
    from deva_spark.functions.multimodal import jpeg_dimensions

    assert jpeg_dimensions(J.encode_jpeg(img, 95, restart_interval=2)) == (
        56, 40,
    )


def test_malformed_streams_raise_catchable_errors():
    # frame_sample's undecodable-payload fallback catches (ValueError,
    # NotImplementedError, struct.error): every malformed-stream failure
    # must land in that tuple — a KeyError/IndexError from a corrupt
    # table id or truncated segment would escape the fallback and kill
    # the executor task it exists to absorb.
    import struct

    catchable = (ValueError, NotImplementedError, struct.error)
    img = _grad(16, 16)
    enc = J.encode_jpeg(img, quality=90)

    def corrupt(transform):
        with pytest.raises(catchable):
            J.decode_jpeg(transform(bytearray(enc)))

    def drop_segment(b, marker):
        i = bytes(b).find(marker)
        (ln,) = struct.unpack(">H", b[i + 2 : i + 4])
        del b[i : i + 2 + ln]
        return bytes(b)

    # missing DHT / DQT: scan names a table slot that was never defined
    corrupt(lambda b: drop_segment(b, b"\xff\xc4"))
    corrupt(lambda b: drop_segment(b, b"\xff\xdb"))

    def truncate_dqt(b):
        i = bytes(b).find(b"\xff\xdb")
        # shrink the declared segment length so the 64-entry table is cut
        b[i + 2 : i + 4] = struct.pack(">H", 10)
        del b[i + 4 + 8 : i + 4 + 8 + 57]
        return bytes(b)

    corrupt(truncate_dqt)

    def sos_bad_table_ids(b):
        i = bytes(b).find(b"\xff\xda")
        b[i + 2 + 3] = 0x77  # component 1's (td, ta) -> undefined slots
        return bytes(b)

    corrupt(sos_bad_table_ids)

    def empty_sos(b):
        i = bytes(b).find(b"\xff\xda")
        b[i + 2 : i + 4] = struct.pack(">H", 2)  # zero-byte SOS body
        return bytes(b)

    corrupt(empty_sos)


# --------------------------------------------------------------------------
# Progressive (SOF2) — r13, VERDICT r12 "missing" #1
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "mode,hw",
    [
        ("444", (16, 16)),
        ("444", (17, 23)),
        ("422", (33, 31)),
        ("420", (32, 32)),
        ("420", (3, 5)),
    ],
)
def test_progressive_matches_baseline_pixels(mode, hw):
    # progressive is a lossless reordering of the same quantized blocks:
    # decoded pixels must be BIT-IDENTICAL to the baseline stream's at
    # the same quality/subsampling — the strongest cross-layout check
    h, w = hw
    img = np.random.default_rng(h * 37 + w).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    base = J.decode_jpeg(J.encode_jpeg(img, quality=85, subsampling=mode))
    enc = J.encode_jpeg(img, quality=85, subsampling=mode, progressive=True)
    assert np.array_equal(J.decode_jpeg(enc), base)
    # deterministic bytes
    assert (
        J.encode_jpeg(img, quality=85, subsampling=mode, progressive=True)
        == enc
    )


def test_progressive_grayscale_and_flat_eob_runs():
    g = _grad(40, 24)[:, :, 0]
    base = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(g, quality=90, progressive=True)), base
    )
    # a flat image makes every AC band all-zero: the whole scan is one
    # EOBn run (the symbol class Annex K tables cannot express — the
    # per-scan optimal DHT path)
    flat = np.full((64, 48, 3), 113, dtype=np.uint8)
    bflat = J.decode_jpeg(J.encode_jpeg(flat, quality=90))
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(flat, quality=90, progressive=True)),
        bflat,
    )
    assert np.array_equal(bflat, flat)  # flat survives DCT exactly


def test_progressive_restart_markers():
    img = np.random.default_rng(5).integers(
        0, 256, size=(48, 32, 3), dtype=np.uint8
    )
    base = J.decode_jpeg(J.encode_jpeg(img, quality=80, subsampling="420"))
    enc = J.encode_jpeg(
        img, quality=80, subsampling="420", progressive=True,
        restart_interval=2,
    )
    assert enc.count(b"\xff\xdd") == 1  # DRI present
    assert np.array_equal(J.decode_jpeg(enc), base)


def test_progressive_wire_format():
    img = _grad(16, 16)
    enc = J.encode_jpeg(img, quality=90, progressive=True)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    # libjpeg's default color script: 10 scans, 8 of them AC scans each
    # carrying its own optimal DHT; header carries the two DC DHTs
    assert enc.count(b"\xff\xda") == 10
    assert enc.count(b"\xff\xc4") == 2 + 8
    # golden pins: wire bytes AND decoded pixels (a shared
    # encoder/decoder drift still roundtrips — the literals catch it)
    assert hashlib.md5(enc).hexdigest() == (
        _PROGRESSIVE_GOLDEN_ENC
    ), hashlib.md5(enc).hexdigest()
    assert hashlib.md5(J.decode_jpeg(enc).tobytes()).hexdigest() == (
        _PROGRESSIVE_GOLDEN_DEC
    ), hashlib.md5(J.decode_jpeg(enc).tobytes()).hexdigest()


_PROGRESSIVE_GOLDEN_ENC = "18c700056497be88e65f03863bb7e4cc"
_PROGRESSIVE_GOLDEN_DEC = "b08e97017680ba8712f372dd55589bee"


def test_progressive_truncation_and_garbage_raise():
    img = _grad(24, 24)
    enc = J.encode_jpeg(img, quality=90, progressive=True)
    # chop mid-scan: deterministic-decode contract is pixels or a loud
    # error, never fabricated coefficients
    with pytest.raises(ValueError):
        J.decode_jpeg(enc[: len(enc) // 2])
    # progressive with multi_scan is contradictory
    with pytest.raises(ValueError):
        J.encode_jpeg(img, progressive=True, multi_scan=True)


def test_progressive_scan_order_enforced():
    img = _grad(16, 16)
    enc = J.encode_jpeg(img, quality=90, progressive=True)
    # excise the DC first scan (first SOS): AC scans must then refuse
    # to run ahead of their component's DC scan
    first_sos = enc.find(b"\xff\xda")
    second_sos = enc.find(b"\xff\xda", first_sos + 2)
    # keep everything before the first SOS (tables/SOF), then skip to
    # the DHT immediately preceding the second scan
    dht_before_second = enc.rfind(b"\xff\xc4", 0, second_sos)
    cut = enc[:first_sos] + enc[dht_before_second:]
    with pytest.raises(ValueError):
        J.decode_jpeg(cut)


def test_optimize_coding_smaller_and_pixel_identical():
    # cjpeg -optimize: two-pass optimal Huffman tables — table choice
    # never changes the symbol stream, only its codes, so pixels are
    # bit-identical and the stream is never larger
    rng = np.random.default_rng(21)
    for arr, kw in [
        (rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), {}),
        (
            rng.integers(0, 256, (33, 31, 3), dtype=np.uint8),
            {"subsampling": "420"},
        ),
        (rng.integers(0, 256, (24, 24), dtype=np.uint8), {}),  # gray
        (np.full((64, 64, 3), 128, np.uint8), {}),
        (
            rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
            {"multi_scan": True},
        ),
        (
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
            {"restart_interval": 2},
        ),
    ]:
        base = J.encode_jpeg(arr, quality=85, **kw)
        opt = J.encode_jpeg(arr, quality=85, optimize=True, **kw)
        assert len(opt) <= len(base), kw
        assert np.array_equal(J.decode_jpeg(opt), J.decode_jpeg(base)), kw
        assert J.encode_jpeg(arr, quality=85, optimize=True, **kw) == opt


def test_max_pixels_guard():
    # a corrupt SOF claiming 65535x65535 would commit ~17 GB of
    # coefficient storage per worker on a crawled corpus — the cap
    # makes it the ordinary undecodable-payload ValueError instead
    import struct as _s

    enc = bytearray(J.encode_jpeg(_grad(8, 8)))
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 5 : i + 9] = _s.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="max_pixels"):
        J.decode_jpeg(bytes(enc))
    # explicit opt-in still decodes legitimate big frames (dims only
    # fudged here, so just assert the cap itself moved past)
    enc2 = bytearray(J.encode_jpeg(_grad(8, 8)))
    i2 = bytes(enc2).find(b"\xff\xc0")
    enc2[i2 + 5 : i2 + 9] = _s.pack(">HH", 0, 8)
    with pytest.raises(ValueError, match="zero frame"):
        J.decode_jpeg(bytes(enc2))


def test_decoder_never_hangs_on_corruption():
    # crawled-corpus robustness: single-byte corruption, truncation and
    # tail garbage must either decode or raise a catchable error fast —
    # never hang, never segfault-style explode. Deterministic seeds.
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    streams = [
        J.encode_jpeg(img, quality=80),
        J.encode_jpeg(img, quality=80, progressive=True),
        J.encode_jpeg(img, quality=80, subsampling="420", multi_scan=False,
                      restart_interval=2),
    ]
    n_ok = n_err = 0
    for enc in streams:
        for trial in range(120):
            buf = bytearray(enc)
            k = int(rng.integers(2, len(buf)))
            mode = trial % 3
            if mode == 0:
                buf[k] ^= int(rng.integers(1, 256))  # bit flips
            elif mode == 1:
                buf = buf[:k]  # truncate
            else:
                buf[k : k + 1] = bytes(
                    rng.integers(0, 256, size=3, dtype=np.uint8)
                )  # splice garbage
            try:
                out = J.decode_jpeg(bytes(buf))
                assert out.dtype == np.uint8 and out.ndim == 3
                n_ok += 1
            except (ValueError, NotImplementedError):
                n_err += 1
    # both outcomes occur; nothing else escaped
    assert n_err > 0 and n_ok + n_err == 3 * 120


def test_progressive_parity_property():
    # Hypothesis: progressive == baseline pixels for arbitrary content,
    # shape, quality, subsampling — the strongest single invariant the
    # codec has
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        q=st.integers(1, 100),
        mode=st.sampled_from(["444", "422", "420"]),
        seed=st.integers(0, 2**31),
        gray=st.booleans(),
        opt=st.booleans(),
    )
    def prop(h, w, q, mode, seed, gray, opt):
        shape = (h, w) if gray else (h, w, 3)
        arr = np.random.default_rng(seed).integers(
            0, 256, shape, dtype=np.uint8
        )
        base = J.decode_jpeg(
            J.encode_jpeg(arr, quality=q, subsampling=mode, optimize=opt)
        )
        prog = J.decode_jpeg(
            J.encode_jpeg(arr, quality=q, subsampling=mode, progressive=True)
        )
        assert np.array_equal(base, prog)

    prop()


def test_optimal_table_depth_fold():
    # r13 review #1: symbol frequencies whose optimal depth exceeds 16
    # (super-increasing counts — the case the Annex K.3 fold exists
    # for) must fold into a valid <=16-bit table that still carries
    # EVERY symbol; the old huffval comprehension dropped the deep ones
    # and the table build crashed.
    freqs = {i: 2**i for i in range(25)}
    bits, vals = J._optimal_huffman_spec(freqs)
    assert sum(bits) == len(vals) == 25
    tab = J._build_huffman((bits, vals))
    assert set(tab) == set(range(25))
    assert max(ln for _, ln in tab.values()) <= 16
    # Kraft: the folded table is still prefix-decodable
    assert sum(2 ** (16 - ln) for _, ln in tab.values()) <= 2**16


def test_entropy_rewrite_byte_parity_golden():
    # r15 optimization pass: the entropy loops were rewritten with
    # local-variable bit state (sequential + progressive decode, block
    # encode, sparse K.2 table build). These digests were produced by
    # the PRE-rewrite implementation and pin wire bytes AND decoded
    # pixels across every mode the rewrite touched (baseline / 420 /
    # 422 / multi-scan / optimize / progressive / restart intervals /
    # grayscale). tools/fuzz_jpeg_parity.py is the wide version of this
    # gate (408 encodes, same digests before and after the rewrite).
    rng = np.random.default_rng(20260818)
    enc = hashlib.md5()
    pix = hashlib.md5()
    for h, w in [(7, 9), (17, 23)]:
        for ncomp in (1, 3):
            shape = (h, w) if ncomp == 1 else (h, w, 3)
            arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
            variants = [
                dict(quality=90),
                dict(quality=35, progressive=True, restart_interval=3),
                dict(quality=90, optimize=True),
            ]
            if ncomp == 3:
                variants += [
                    dict(quality=90, subsampling="420", progressive=True),
                    dict(quality=75, subsampling="422", restart_interval=1),
                    dict(quality=90, multi_scan=True),
                ]
            for kw in variants:
                data = J.encode_jpeg(arr, **kw)
                enc.update(data)
                pix.update(J.decode_jpeg(data).tobytes())
    assert enc.hexdigest() == "65a1f81e059915164f1ac5bcbb2593af"
    assert pix.hexdigest() == "de1dbfdeba2945870fd7829fc233dcf6"
