"""GEMM-native DFT primitives vs numpy FFT oracles (both backends)."""

import numpy as np
import pytest

import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.ops import dft


@pytest.fixture(params=[False, True], ids=["fft", "matmul"])
def force_mode(request, monkeypatch):
    monkeypatch.setenv("RSAF_FORCE_MATMUL_DFT", "1" if request.param else "0")
    return request.param


def test_rfft_power_matches_numpy(force_mode):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 400)).astype(np.float32)
    ours = np.asarray(dft.rfft_power(jnp.asarray(x), 512))
    ref = np.abs(np.fft.rfft(x, 512)) ** 2
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_rfft_mag_matches_numpy(force_mode):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 257)).astype(np.float32)
    ours = np.asarray(dft.rfft_mag(jnp.asarray(x), 512))
    ref = np.abs(np.fft.rfft(x, 512))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_autocorr_matches_numpy(force_mode):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 300)).astype(np.float32)
    n_fft, n_lags = 1024, 120
    ours = np.asarray(dft.autocorr(jnp.asarray(x), n_fft, n_lags))
    spec = np.fft.rfft(x, n_fft)
    ref = np.fft.irfft(spec * np.conj(spec), n_fft)[:, :n_lags]
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)


def test_cross_corr_matches_direct(force_mode):
    rng = np.random.default_rng(3)
    win, max_lag = 60, 40
    ext = rng.normal(size=(2, win + max_lag)).astype(np.float32)
    base = ext[:, :win]
    n_fft = 256
    ours = np.asarray(dft.cross_corr(jnp.asarray(base), jnp.asarray(ext), n_fft, max_lag + 1))
    # direct definition
    ref = np.zeros((2, max_lag + 1))
    for b in range(2):
        for tau in range(max_lag + 1):
            ref[b, tau] = np.dot(base[b], ext[b, tau : tau + win])
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)


def test_frontend_uses_dft(force_mode):
    from robust_speech_analysis_framework_tpu.audio.frontend import (
        FrontendConfig,
        framed_stft,
    )

    cfg = FrontendConfig()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=16000).astype(np.float32))
    frames, mag = framed_stft(x, cfg)
    w = np.hamming(400)  # scipy-equivalent symmetric hamming
    pre = np.asarray(frames)
    shifted = np.concatenate([pre[:, :1], pre[:, :-1]], axis=1)
    ref = np.abs(np.fft.rfft((pre - 0.97 * shifted) * w, 512))
    np.testing.assert_allclose(np.asarray(mag), ref, rtol=2e-3, atol=5e-3)


def test_pitch_accuracy_with_matmul_dft(monkeypatch):
    monkeypatch.setenv("RSAF_FORCE_MATMUL_DFT", "1")
    from robust_speech_analysis_framework_tpu.ops.pitch import pitch_track_ac

    sr = 16000
    t = np.arange(int(0.6 * sr)) / sr
    x = sum(np.sin(2 * np.pi * k * 150.0 * t) / k for k in range(1, 9))
    pt = pitch_track_ac(x / np.abs(x).max(), sr, time_step=0.01, floor=75, ceiling=500)
    v = pt.f0[pt.f0 > 0]
    assert len(v) > 0.8 * len(pt.f0)
    assert abs(np.median(v) - 150.0) / 150.0 < 0.01
