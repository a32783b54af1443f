"""Resampling kernels vs scipy oracles."""

import numpy as np
import pytest
import scipy.signal as sps

from robust_speech_analysis_framework_tpu.audio.resample import (
    design_lowpass,
    resample_poly,
    resample_poly_np,
    resample_sinc,
)


@pytest.mark.parametrize("up,down", [(1, 2), (2, 1), (160, 441), (147, 160), (3, 7)])
def test_resample_poly_matches_scipy_with_shared_filter(up, down):
    rng = np.random.default_rng(0)
    x = rng.normal(size=2000).astype(np.float64)
    h = design_lowpass(up, down)
    ours = resample_poly_np(x, up, down)
    theirs = sps.resample_poly(x, up, down, window=h / up)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


@pytest.mark.parametrize("up,down", [(1, 2), (160, 441), (2, 3)])
def test_jax_matches_numpy(up, down):
    rng = np.random.default_rng(1)
    x = rng.normal(size=1500).astype(np.float32)
    a = np.asarray(resample_poly(x, up, down))
    b = resample_poly_np(x.astype(np.float64), up, down)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_batched_resample():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 800)).astype(np.float32)
    y = np.asarray(resample_poly(x, 1, 2))
    assert y.shape == (3, 400)
    for i in range(3):
        np.testing.assert_allclose(
            y[i], np.asarray(resample_poly(x[i], 1, 2)), atol=1e-6
        )


@pytest.mark.slow
def test_sine_preserved_through_resample():
    sr_in, sr_out = 44100, 16000
    t = np.arange(44100) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float64)
    y = resample_poly_np(x, sr_out, sr_in)
    t_out = np.arange(len(y)) / sr_out
    expected = np.sin(2 * np.pi * 1000 * t_out)
    # Compare away from edges
    sl = slice(200, -200)
    assert np.max(np.abs(y[sl] - expected[sl])) < 5e-3


def test_sinc_resample_sine():
    sr_in, sr_out = 44100, 16000
    t = np.arange(22050) / sr_in
    x = np.sin(2 * np.pi * 500 * t).astype(np.float32)
    y = np.asarray(resample_sinc(x, sr_in, sr_out, precision=30))
    assert len(y) == round(len(x) * sr_out / sr_in)
    t_out = np.arange(len(y)) / sr_out
    expected = np.sin(2 * np.pi * 500 * t_out)
    sl = slice(100, -100)
    assert np.max(np.abs(y[sl] - expected[sl])) < 1e-2


def test_sinc_identity_ratio():
    x = np.random.default_rng(3).normal(size=100).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resample_sinc(x, 16000, 16000)), x)


def test_sinc_upsample():
    sr_in, sr_out = 8000, 16000
    t = np.arange(8000) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample_sinc(x, sr_in, sr_out, precision=30))
    t_out = np.arange(len(y)) / sr_out
    sl = slice(100, -100)
    assert np.max(np.abs(y[sl] - np.sin(2 * np.pi * 440 * t_out)[sl])) < 1e-2


@pytest.mark.slow
def test_sinc_downsample_antialiasing():
    """A tone above the target Nyquist must be strongly attenuated.

    Regression: the Hann window argument used to span ±scale instead of ±1
    over the widened kernel support, zeroing ~2/3 of the taps and leaving
    ~3.8e-5 RMS aliasing; the corrected window leaves ~1.4e-6.
    """
    from robust_speech_analysis_framework_tpu.audio.resample import resample_sinc_np

    sr_in, sr_out = 44100, 16000
    t = np.arange(44100) / sr_in
    x = np.sin(2 * np.pi * 10000 * t)  # 10 kHz > 8 kHz target Nyquist
    y = resample_sinc_np(x, sr_in, sr_out, precision=50)
    sl = slice(400, -400)
    assert np.sqrt(np.mean(y[sl] ** 2)) < 5e-6


def test_sinc_np_matches_jax():
    from robust_speech_analysis_framework_tpu.audio.resample import resample_sinc_np

    rng = np.random.default_rng(7)
    x = rng.normal(size=4000).astype(np.float32)
    a = np.asarray(resample_sinc(x, 44100, 16000, precision=20))
    b = resample_sinc_np(x, 44100, 16000, precision=20)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=5e-4)  # f32 device vs f64 host accumulation
