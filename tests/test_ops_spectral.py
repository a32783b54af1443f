"""Formant/spectral/cepstral/LTAS/pulse op tests."""

import numpy as np
import pytest
import scipy.signal as sps

from robust_speech_analysis_framework_tpu.ops.cepstrum import (
    cpps,
    power_cepstrogram,
)
from robust_speech_analysis_framework_tpu.ops.formants import (
    burg_coeffs,
    durand_kerner_roots,
    formant_track_burg,
)
from robust_speech_analysis_framework_tpu.ops.intensity import intensity_contour
from robust_speech_analysis_framework_tpu.ops.ltas import ltas_pitch_corrected
from robust_speech_analysis_framework_tpu.ops.pitch import pitch_track_ac, pitch_track_cc
from robust_speech_analysis_framework_tpu.ops.pulses import (
    point_process_cc,
    silence_intervals,
    vuv_intervals,
)
from robust_speech_analysis_framework_tpu.ops.spectral import (
    spectral_moments,
    spectrogram,
)

import jax.numpy as jnp

SR = 16000


def test_burg_recovers_ar2():
    rng = np.random.default_rng(0)
    a_true = [1, -1.5, 0.9]
    x = sps.lfilter([1], a_true, rng.normal(size=3000)).astype(np.float32)
    a = np.asarray(burg_coeffs(jnp.asarray(x[None, :2000]), 2))[0]
    np.testing.assert_allclose(a, a_true[1:], atol=0.05)


def test_durand_kerner_known_roots():
    # (z-0.5)(z+0.25)(z-0.1j)(z+0.1j) → coeffs
    roots_true = np.array([0.5, -0.25, 0.1j, -0.1j])
    coeffs = np.poly(roots_true)  # leading 1
    re, im = durand_kerner_roots(jnp.asarray(coeffs[None, 1:].real + 0.0))
    got = np.asarray(re)[0] + 1j * np.asarray(im)[0]
    expect = np.sort_complex(roots_true)
    assert np.max(np.abs(np.sort(np.abs(got)) - np.sort(np.abs(expect)))) < 1e-3


def test_formants_on_synthetic_vowel():
    pulses = np.zeros(SR)
    pulses[:: SR // 120] = 1.0
    v = pulses
    for fc, bw in [(700, 90), (1200, 110)]:
        r = np.exp(-np.pi * bw / SR)
        th = 2 * np.pi * fc / SR
        v = sps.lfilter([1], [1, -2 * r * np.cos(th), r * r], v)
    ft = formant_track_burg(v, SR, time_step=0.01)
    f1 = np.nanmedian(ft.freqs[:, 0])
    f2 = np.nanmedian(ft.freqs[:, 1])
    assert abs(f1 - 700) < 60
    assert abs(f2 - 1200) < 60


def test_spectral_moments_tone():
    t = np.arange(SR) / SR
    sg = spectrogram(np.sin(2 * np.pi * 1000 * t), SR)
    g, s, sk, ku = spectral_moments(sg.power, sg.freqs)
    assert np.nanmean(g) == pytest.approx(1000.0, abs=5.0)
    assert np.nanmean(s) < 50


def test_cpps_voiced_vs_noise():
    t = np.arange(SR) / SR
    v = sum(np.sin(2 * np.pi * k * 150 * t) / k for k in range(1, 20))
    v /= np.abs(v).max()
    m_voiced, _ = cpps(power_cepstrogram(v, SR))
    rng = np.random.default_rng(0)
    m_noise, _ = cpps(power_cepstrogram(rng.normal(size=SR), SR))
    assert m_voiced > m_noise + 3


def test_point_process_period():
    t = np.arange(SR) / SR
    f0 = 125.0
    v = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 10))
    v /= np.abs(v).max()
    pt = pitch_track_cc(v, SR, time_step=0.01, floor=75, ceiling=400)
    pulses = point_process_cc(v, SR, pt)
    periods = np.diff(pulses)
    periods = periods[(periods > 0.004) & (periods < 0.02)]
    assert len(pulses) > 50
    assert np.median(periods) == pytest.approx(1.0 / f0, rel=0.05)


def test_vuv_intervals_cover():
    pulses = np.array([0.1, 0.11, 0.12, 0.5, 0.51])
    iv = vuv_intervals(pulses, 1.0)
    assert iv[0][0] == 0.0 and iv[-1][1] == 1.0
    labels = [lab for _, _, lab in iv]
    assert "V" in labels and "U" in labels
    # intervals are contiguous
    for (a1, b1, _), (a2, b2, _) in zip(iv, iv[1:]):
        assert b1 == pytest.approx(a2)


def test_silence_intervals():
    t = np.arange(2 * SR) / SR
    x = np.sin(2 * np.pi * 300 * t) * np.where((t > 0.7) & (t < 1.4), 0.001, 0.5)
    ic = intensity_contour(x, SR, minimum_pitch=50, time_step=0.016)
    iv = silence_intervals(ic, -25.0, 0.3, 0.1)
    labels = [lab for _, _, lab in iv]
    assert labels.count("silent") >= 1
    sil = [(a, b) for a, b, lab in iv if lab == "silent"]
    a, b = max(sil, key=lambda ab: ab[1] - ab[0])
    assert 0.55 < a < 0.9 and 1.2 < b < 1.55


def test_ltas_slope_sign():
    # Pulse train through a lowpass → energy concentrated low → positive slope
    t = np.arange(SR) / SR
    f0 = 130.0
    v = sum(np.sin(2 * np.pi * k * f0 * t) / (k * k) for k in range(1, 25))
    v /= np.abs(v).max()
    pt = pitch_track_cc(v, SR, time_step=0.01, floor=75, ceiling=400)
    pulses = point_process_cc(v, SR, pt)
    lt = ltas_pitch_corrected(v, SR, pulses)
    assert np.isfinite(lt.power_db[:40]).all()
    assert lt.slope_db(50, 1000, 1000, 4000) > 0
    tilt = lt.spectral_tilt(100, 5000)
    assert tilt < 0  # dB falls with frequency


def test_vuv_intervals_praat_padding_and_abutting():
    """Praat To TextGrid (vuv): voiced spans padded by mean_period/2;
    overlapping padded spans abut as SEPARATE V intervals (no merge)."""
    pulses = np.array([0.30, 0.31, 0.32, 0.40, 0.41])
    iv = vuv_intervals(pulses, 1.0, max_period=0.02, mean_period=0.1)
    v = [(a, b) for a, b, lab in iv if lab == "V"]
    assert len(v) == 2
    assert v[0][0] == pytest.approx(0.25)   # 0.30 - 0.05
    assert v[0][1] == pytest.approx(0.37)   # 0.32 + 0.05
    assert v[1][0] == pytest.approx(0.37)   # clipped to previous V end
    assert v[1][1] == pytest.approx(0.46)   # 0.41 + 0.05
    # contiguous cover of [0, 1]
    assert iv[0][0] == 0.0 and iv[-1][1] == 1.0
    for (a1, b1, _), (a2, b2, _) in zip(iv, iv[1:]):
        assert b1 == pytest.approx(a2)


def test_silence_intervals_tile_full_duration():
    t = np.arange(2 * SR) / SR
    x = np.sin(2 * np.pi * 300 * t) * np.where((t > 0.7) & (t < 1.4), 0.001, 0.5)
    ic = intensity_contour(x, SR, minimum_pitch=50, time_step=0.016)
    iv = silence_intervals(ic, -25.0, 0.3, 0.1, total_duration=2.0)
    assert iv[0][0] == 0.0 and iv[-1][1] == pytest.approx(2.0)


def test_cpps_batch_matches_host_oracle():
    """Device cpps_segments_batch == per-segment host cepstrogram+cpps
    (same preprocessed 10 kHz waveform, same smoothing)."""
    from robust_speech_analysis_framework_tpu.ops.cepstrum import (
        cepstrum_preprocess,
        cpps_segments_batch,
    )

    t = np.arange(2 * SR) / SR
    v = sum(np.sin(2 * np.pi * k * 140 * t) / k for k in range(1, 15))
    v = (v / np.abs(v).max()).astype(np.float64)
    x10k, sr10k = cepstrum_preprocess(v, SR)
    segs = [(0.10, 0.60), (0.80, 1.45)]

    got = cpps_segments_batch([(x10k, segs)], sr10k)[0]

    seg_means = []
    for a, b in segs:
        seg = x10k[int(a * sr10k) : int(b * sr10k)]
        cg = power_cepstrogram(seg, sr10k, preemphasis_from=0.0)
        m, _ = cpps(cg)
        if np.isfinite(m) and m > 4.0:
            seg_means.append(m)
    want = float(np.mean(seg_means)) if seg_means else float("nan")
    assert got == pytest.approx(want, abs=0.25)
