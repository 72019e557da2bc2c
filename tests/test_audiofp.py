"""Spectral-peak audio fingerprints (r13): peak extraction, gain/noise
invariance, combinatorial pair hashes, inverted-index == brute force."""

import io
import wave

import numpy as np
import pytest

from deva_spark.functions import audiofp as afp


def _clip(seed: int, n=16000, rate=8000, tones=5):
    r = np.random.default_rng(seed)
    bins = sorted(int(v) * 5 for v in r.choice(198, size=tones, replace=False))
    t = np.arange(n) / rate
    x = np.zeros(n)
    for i, v in enumerate(bins):
        f = (60 + int(v) * 8) * rate / n
        x += (0.5 + 0.5 * i / tones) * np.sin(2 * np.pi * f * t)
    x /= np.abs(x).max() + 1e-9
    return x, sorted(60 + int(v) * 8 for v in bins)


def _wav(x, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            np.clip(np.round(x * 32000), -32768, 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def test_spectral_peaks_exact_and_invariant():
    x, bins = _clip(3)
    assert afp.spectral_peaks(x) == bins  # bin-exact tones found exactly
    # gain invariance (peak ORDER compares magnitudes relatively)
    assert afp.spectral_peaks(0.1 * x) == bins
    # noise floor at -50 dB leaves peaks untouched
    noisy = x * 0.45 + 0.003 * np.random.default_rng(0).standard_normal(len(x))
    assert afp.spectral_peaks(noisy) == bins
    # int16 quantization roundtrip
    q = np.round(x * 32000) / 32000
    assert afp.spectral_peaks(q) == bins
    # low bins excluded, empty input safe
    assert afp.spectral_peaks(np.zeros(100)) == []
    assert afp.spectral_peaks(np.array([])) == []


def test_peak_pair_hashes_combinatorics():
    hs = afp.peak_pair_hashes([5, 3, 9])
    assert hs == [(3 << 20) | 5, (3 << 20) | 9, (5 << 20) | 9]
    assert afp.peak_pair_hashes([7]) == []
    # aliasing guard: bins past the 20-bit field raise (r13 review)
    with pytest.raises(ValueError, match="2\\^20"):
        afp.peak_pair_hashes([2, 2**20 + 5])
    # symmetric suppression: whichever of two tones exactly min_sep
    # apart is louder, the survivor set is ONE of them + no leakage
    import numpy as _np
    t = _np.arange(16000) / 8000.0
    for loud_first in (True, False):
        a1, a2 = (1.0, 0.6) if loud_first else (0.6, 1.0)
        x = a1 * _np.sin(2 * _np.pi * (100 * 8000 / 16000) * t)
        x += a2 * _np.sin(2 * _np.pi * (108 * 8000 / 16000) * t)
        pk = afp.spectral_peaks(x, k=2, min_sep=8)
        win, lose = (100, 108) if loud_first else (108, 100)
        assert win in pk and lose not in pk, pk
    # m shared peaks => C(m,2) shared pair hashes
    a = set(afp.peak_pair_hashes([1, 2, 3, 4, 5]))
    b = set(afp.peak_pair_hashes([1, 2, 3, 4, 99]))
    assert len(a & b) == 6  # C(4,2)


def test_spark_fingerprint_and_pairs(spark):
    rows = []
    truth = []
    for i in range(24):
        x, _ = _clip(i)
        rows.append((i * 10, _wav(x)))
        if i % 3 == 0:
            rng = np.random.default_rng(i)
            twin = np.clip(
                0.45 * x + 0.003 * rng.standard_normal(len(x)), -1, 1
            )
            rows.append((i * 10 + 1, _wav(twin)))
            truth.append((i * 10, i * 10 + 1))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    fps = afp.audio_fingerprints(df)
    got = sorted(
        (r.id_a, r.id_b)
        for r in afp.audio_neardup_pairs(fps, min_shared=3).collect()
    )
    assert got == sorted(truth)
    # the x116 threshold (shared >= 6 pair hashes == >= 4 shared bins)
    # recovers the same twins — they share all 10
    got6 = sorted(
        (r.id_a, r.id_b)
        for r in afp.audio_neardup_pairs(fps, min_shared=6).collect()
    )
    assert got6 == sorted(truth)
    # brute-force equivalence over the pair-hash features
    feats = {r.media_id: set(r.pair_hashes) for r in fps.collect()}
    brute = sorted(
        (a, b)
        for a in feats
        for b in feats
        if a < b and len(feats[a] & feats[b]) >= 3
    )
    assert got == brute
    # every clip fingerprints to 5 peaks / 10 pair hashes
    assert all(
        len(r.peaks) == 5 and len(r.pair_hashes) == 10
        for r in fps.collect()
    )
    with pytest.raises(ValueError, match="min_shared"):
        afp.audio_neardup_pairs(fps, min_shared=0)
    # r15 optimization: the grouped formulation must (a) keep exact
    # shared counts (number of distinct shared features — brute force
    # below), (b) reference the opaque fingerprint Arrow stage ONCE in
    # the plan (the old self-join ran decode+fingerprint per branch)
    got_counts = {
        (r.id_a, r.id_b): r.shared
        for r in afp.audio_neardup_pairs(fps, min_shared=3).collect()
    }
    brute_counts = {
        (a, b): len(feats[a] & feats[b])
        for a in feats
        for b in feats
        if a < b and len(feats[a] & feats[b]) >= 3
    }
    assert got_counts == brute_counts
    plan = (
        afp.audio_neardup_pairs(fps, min_shared=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1, plan


def test_undecodable_clip_isolated_per_row(spark):
    # ADVICE r13: one bad payload must not kill the Arrow stage — it
    # emits an EMPTY fingerprint (never matches, auditable via
    # size(peaks)=0) while good rows fingerprint normally
    x, bins = _clip(11)
    df = spark.createDataFrame(
        [
            (1, _wav(x)),
            (2, b"not a riff payload"),
            (3, b"RIFF\x00\x00\x00\x00WAVEjunk"),  # truncated RIFF
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in afp.audio_fingerprints(df).collect()}
    assert list(rows[1].peaks) == bins
    assert list(rows[2].peaks) == [] and list(rows[2].pair_hashes) == []
    assert list(rows[3].peaks) == [] and list(rows[3].pair_hashes) == []
