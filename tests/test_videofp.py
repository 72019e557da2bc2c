"""Video temporal near-dup (r14): walk-grid synthesis margins, dhash
stability under trim+re-encode, banded join == brute force, incremental
cross-table parity, fault isolation."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from deva_spark.functions import multimodal as mm
from deva_spark.functions import videofp as vfp
from deva_spark.functions.imagehash import dhash64


def _clip(doc=50, text=b"doc text", n_frames=6):
    seed = hashlib.md5(text + str(doc).encode()).digest()
    frames = np.stack(
        [
            np.repeat(np.repeat(mm._walk_grid(seed, b"vd%d" % t), 4, 0), 4, 1)
            for t in range(n_frames)
        ]
    )
    return np.repeat(frames.astype(np.uint8)[:, :, :, None], 3, axis=3)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_walk_grid_margins_and_determinism():
    g = mm._walk_grid(b"seed", b"t0")
    assert g.shape == (8, 9)
    # every horizontal neighbor differs by EXACTLY 45 (the dhash margin)
    assert np.all(np.abs(np.diff(g, axis=1)) == 45.0)
    assert g.min() >= 10.0 and g.max() <= 245.0
    assert np.array_equal(g, mm._walk_grid(b"seed", b"t0"))
    assert not np.array_equal(g, mm._walk_grid(b"seed", b"t1"))


def test_twin_frames_within_band_radius():
    # head-trim + brightness + MJPEG q92 re-encode: per-frame dhash
    # stays within the banded radius at offset -1; unrelated frames of
    # the SAME video sit far apart (no self-matching inside a clip)
    clip = _clip()
    twin_arr = np.clip(clip[1:].astype(np.int16) + 6, 0, 255).astype(np.uint8)
    base = mm.decode_avi(mm.encode_avi(clip, codec="dib"))
    twin = mm.decode_avi(mm.encode_avi(twin_arr, codec="mjpg", quality=92))
    hb = [dhash64(f) for f in base]
    ht = [dhash64(f) for f in twin]
    for i in range(5):
        assert _ham(hb[i + 1], ht[i]) <= 3  # aligned at offset -1
    cross = [_ham(hb[0], hb[j]) for j in range(1, 6)]
    assert min(cross) > 10  # distinct frames are far apart


def _fh(spark, docs):
    media = mm.synthesize_doc_videos(docs, twins=True, twin_every=2)
    return media, vfp.video_frame_hashes(media)


def _docs(spark, n=8):
    rows = [(i * 2, f"video doc {i} body") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_banded_pairs_equal_brute_force(spark):
    # the pin test: the banded+aligned join recovers EXACTLY what a
    # brute-force frame-distance + offset vote computes
    docs = _docs(spark)
    _, fh = _fh(spark, docs)
    got = {
        (r.id_a, r.id_b, r.aligned, r.offset)
        for r in vfp.video_neardup_pairs(fh, min_aligned=4).collect()
    }
    rows = fh.collect()
    byvid: dict[int, dict[int, int]] = {}
    for r in rows:
        byvid.setdefault(r.video_id, {})[r.frame_idx] = r.dhash
    want = set()
    vids = sorted(byvid)
    for i, va in enumerate(vids):
        for vb in vids[i + 1 :]:
            votes: dict[int, int] = {}
            for fa, ha in byvid[va].items():
                for fb, hb in byvid[vb].items():
                    if _ham(ha, hb) <= 3:
                        votes[fb - fa] = votes.get(fb - fa, 0) + 1
            if votes:
                best = max(votes.values())
                off = min(o for o, c in votes.items() if c == best)
                if best >= 4:
                    want.add((va, vb, best, off))
    assert got == want
    # every doc got a twin (twin_every=2, even ids): all pairs planted
    assert {(a, b) for a, b, *_ in got} == {
        (r.doc_id * 10, r.doc_id * 10 + 1) for r in docs.collect()
    }
    assert all(al == 5 and off == -1 for _, _, al, off in got)


def test_incremental_join_matches_full(spark):
    docs = _docs(spark, 6)
    media, fh = _fh(spark, docs)
    full = {
        (r.id_a, r.id_b, r.aligned, r.offset)
        for r in vfp.video_neardup_pairs(fh, min_aligned=4).collect()
    }
    corpus = vfp.video_frame_hashes(media.filter(F.col("video_id") % 10 == 0))
    batch = vfp.video_frame_hashes(media.filter(F.col("video_id") % 10 == 1))
    inc = {
        (r.id_a, r.id_b, r.aligned, r.offset)
        for r in vfp.video_neardup_join(corpus, batch, min_aligned=4).collect()
    }
    assert inc == full and len(inc) == 6


def test_undecodable_video_isolated(spark):
    docs = spark.createDataFrame([(2, "ok doc")], "doc_id long, text string")
    media = mm.synthesize_doc_videos(docs).unionByName(
        spark.createDataFrame(
            [(999, b"not an avi")], "video_id long, content binary"
        )
    )
    fh = vfp.video_frame_hashes(media)
    assert fh.filter(F.col("video_id") == 999).count() == 0
    assert fh.filter(F.col("video_id") == 20).count() == 6


def test_parameter_validation(spark):
    docs = _docs(spark, 2)
    _, fh = _fh(spark, docs)
    with pytest.raises(ValueError, match="max_distance"):
        vfp.video_neardup_pairs(fh, max_distance=4)
    with pytest.raises(ValueError, match="min_aligned"):
        vfp.video_neardup_pairs(fh, min_aligned=0)
    with pytest.raises(ValueError, match="max_distance"):
        vfp.video_neardup_join(fh, fh, max_distance=-1)
    with pytest.raises(ValueError, match="min_aligned"):
        vfp.video_neardup_join(fh, fh, min_aligned=0)
    with pytest.raises(ValueError, match="sample_every"):
        vfp.video_frame_hashes(spark.range(0), sample_every=0)


def test_frame_sampling_stride():
    # sample_every reindexes SAMPLED frames 0..k so offsets stay in
    # sample units — and the hashes are the strided subset
    from deva_spark.session import get_spark

    spark = get_spark("deva-spark-tests", cpus=8)
    docs = spark.createDataFrame([(4, "strided")], "doc_id long, text string")
    media = mm.synthesize_doc_videos(docs)
    all_rows = {
        r.frame_idx: r.dhash
        for r in vfp.video_frame_hashes(media).collect()
    }
    strided = {
        r.frame_idx: r.dhash
        for r in vfp.video_frame_hashes(media, sample_every=2).collect()
    }
    assert strided == {0: all_rows[0], 1: all_rows[2], 2: all_rows[4]}


def test_unordered_catches_resampled_twin_and_equals_bruteforce(spark):
    # the x123 contract: an fps-halved twin defeats the offset vote
    # (offsets vary: source 2j -> twin j) but not the order-free count;
    # and the order-free tier == brute force
    docs = spark.createDataFrame(
        [(i * 2, f"resampled doc {i}") for i in range(5)],
        "doc_id long, text string",
    )
    media = mm.synthesize_doc_videos(
        docs, twins=True, twin_every=2, twin_mode="resample"
    )
    fh = vfp.video_frame_hashes(media)
    # aligned tier: no pair reaches min_aligned=3 at ONE offset
    aligned = vfp.video_neardup_pairs(fh, min_aligned=3).collect()
    assert aligned == []
    # order-free tier recovers every planted twin with shared == 3
    got = {
        (r.id_a, r.id_b, r.shared)
        for r in vfp.video_neardup_unordered(fh, min_shared=3).collect()
    }
    assert got == {(r.doc_id * 10, r.doc_id * 10 + 1, 3) for r in docs.collect()}
    # brute force parity
    rows = fh.collect()
    byvid: dict[int, list[int]] = {}
    for r in rows:
        byvid.setdefault(r.video_id, []).append(r.dhash)
    vids = sorted(byvid)
    want = set()
    for i, va in enumerate(vids):
        for vb in vids[i + 1 :]:
            n = sum(
                1
                for ha in byvid[va]
                for hb in byvid[vb]
                if _ham(ha, hb) <= 3
            )
            if n >= 3:
                want.add((va, vb, n))
    assert got == want


def test_twin_mode_validation(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="twin_mode"):
        mm.synthesize_doc_videos(docs, twins=True, twin_mode="reverse")


def test_truncated_avi_isolated_not_struct_error(spark):
    # review r14 (reproduced): a crawl-truncated AVI whose avih chunk
    # DECLARES 40 bytes but whose buffer is cut short raised
    # struct.error — which is not a ValueError — and escaped the
    # per-row fault isolation, killing the whole Arrow stage. The
    # unpacks are now length-guarded into the documented ValueError.
    import struct

    hdr = b"avih" + struct.pack("<I", 40) + b"\x00" * 10  # cut short
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdr)) + b"hdrl" + hdr
    body = b"AVI " + hdrl
    bad = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="truncated AVI"):
        mm.decode_avi(bad)
    assert mm.avi_info(bad) is None  # sniffer contract: None, no raise
    media = spark.createDataFrame(
        [(7, bad)], "video_id long, content binary"
    )
    assert vfp.video_frame_hashes(media).count() == 0  # row isolated


def test_cross_table_join_never_pairs_equal_ids(spark):
    # review r14: a video present in BOTH corpus and batch (re-submitted
    # batch after the staged table was rebuilt) must not be reported as
    # its own duplicate (x, x, n_frames, 0)
    docs = _docs(spark, 3)
    media, fh = _fh(spark, docs)
    got = vfp.video_neardup_join(fh, fh, min_aligned=1).collect()
    assert all(r.id_a != r.id_b for r in got)
    # the genuine (base, twin) matches survive, in both directions
    pairs = {(r.id_a, r.id_b) for r in got}
    for r in docs.collect():
        assert (r.doc_id * 10, r.doc_id * 10 + 1) in pairs


def test_twins_only_matches_filtered_synthesis(spark):
    docs = _docs(spark, 4)
    full = mm.synthesize_doc_videos(docs, twins=True, twin_every=2)
    only = mm.synthesize_doc_videos(
        docs, twins=True, twin_every=2, twins_only=True
    )
    want = {
        r.video_id: bytes(r.content)
        for r in full.filter(F.col("video_id") % 10 == 1).collect()
    }
    got = {r.video_id: bytes(r.content) for r in only.collect()}
    assert got == want and len(got) == 4
    with pytest.raises(ValueError, match="twins_only"):
        mm.synthesize_doc_videos(docs, twins_only=True)
