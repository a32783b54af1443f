"""Framed STFT / mel / MFCC front end vs scipy + hand-rolled oracles."""

import numpy as np
import pytest
import scipy.fft
import scipy.signal as sps

from robust_speech_analysis_framework_tpu.audio import frontend as fe

import jax.numpy as jnp


def test_num_frames():
    assert fe.num_frames(400, 400, 160) == 1
    assert fe.num_frames(399, 400, 160) == 0
    assert fe.num_frames(400 + 160 * 3, 400, 160) == 4


def test_frame_signal_values():
    x = jnp.arange(20.0)
    f = np.asarray(fe.frame_signal(x, 8, 4))
    assert f.shape == (4, 8)
    np.testing.assert_array_equal(f[0], np.arange(8.0))
    np.testing.assert_array_equal(f[1], np.arange(4.0, 12.0))
    np.testing.assert_array_equal(f[3], np.arange(12.0, 20.0))


def test_frame_signal_batched():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 100)))
    f = fe.frame_signal(x, 10, 5)
    assert f.shape == (2, 3, 19, 10)


def test_windows_match_scipy():
    np.testing.assert_allclose(
        fe.hamming_window(400), sps.get_window("hamming", 400, fftbins=False), atol=1e-12
    )
    np.testing.assert_allclose(
        fe.hann_window(256), sps.get_window("hann", 256, fftbins=False), atol=1e-12
    )
    g = fe.gaussian_window(101, alpha=2.5)
    sd = 100 / (2 * 2.5)
    np.testing.assert_allclose(
        g, sps.get_window(("gaussian", sd), 101, fftbins=False), atol=1e-12
    )


def test_preemphasis():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    y = np.asarray(fe.preemphasize(x, 0.97))
    np.testing.assert_allclose(y[0], [1 - 0.97, 2 - 0.97, 3 - 1.94, 4 - 2.91], atol=1e-6)


def test_stft_matches_scipy_rfft():
    rng = np.random.default_rng(1)
    x = rng.normal(size=1600).astype(np.float64)
    frames = np.asarray(fe.frame_signal(jnp.asarray(x), 400, 160))
    w = fe.hamming_window(400)
    ours = np.asarray(fe.stft_magnitude(jnp.asarray(frames), w, 512))
    theirs = np.abs(scipy.fft.rfft(frames * w, n=512, axis=-1))
    # JAX computes in float32 by default; compare at float32 precision.
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-4)


def test_mel_filterbank_properties():
    fb = fe.mel_filterbank(26, 512, 16000, 20.0, 8000.0)
    assert fb.shape == (257, 26)
    # Triangles peak at 1 and partition the band (roughly: interior bins covered)
    assert fb.max() <= 1.0 + 1e-12
    peaks = fb.max(axis=0)
    assert np.all(peaks > 0.5)
    # Center frequencies increase in mel space
    centers = np.argmax(fb, axis=0)
    assert np.all(np.diff(centers) > 0)
    # No response outside [fmin, fmax]
    freqs = np.arange(257) * 16000 / 512
    outside = (freqs < 20.0) | (freqs > 8000.0)
    assert np.allclose(fb[outside], 0.0)


def test_mfcc_shape_and_lifter():
    rng = np.random.default_rng(2)
    power = jnp.asarray(rng.uniform(0.1, 2.0, size=(5, 257)))
    fb = fe.mel_filterbank(26, 512, 16000)
    ceps = np.asarray(fe.mfcc_from_power(power, fb, n_ceps=12, first_cep=1))
    assert ceps.shape == (5, 12)
    # Hand-rolled HTK oracle
    mag = np.sqrt(np.asarray(power))
    mel_e = np.maximum(mag @ fb, 1e-10)
    log_e = np.log(mel_e)
    n_in = 26
    dct = np.stack(
        [np.cos(np.pi * i / n_in * (np.arange(n_in) + 0.5)) for i in range(1, 13)],
        axis=1,
    ) * np.sqrt(2.0 / n_in)
    expected = log_e @ dct
    lifter = 1.0 + 11.0 * np.sin(np.pi * np.arange(1, 13) / 22.0)
    np.testing.assert_allclose(ceps, expected * lifter, rtol=1e-4, atol=1e-4)


def test_framed_stft_end_to_end():
    cfg = fe.FrontendConfig()
    assert cfg.frame_len == 400 and cfg.hop == 160 and cfg.fft_size == 512
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=16000).astype(np.float32))
    frames, mag = fe.framed_stft(x, cfg)
    assert frames.shape == (98, 400)
    assert mag.shape == (98, 257)
    # frames are pre-window/pre-emphasis raw samples
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(x[:400]), atol=1e-7)


def test_framed_stft_batch():
    cfg = fe.FrontendConfig()
    x = jnp.zeros((4, 8000), dtype=jnp.float32)
    frames, mag = fe.framed_stft(x, cfg)
    assert frames.shape[0] == 4 and mag.shape[0] == 4


def test_mel_filterbank_weights_linear_in_mel():
    """HTK/openSMILE htkcompatible triangles are linear on the mel axis
    (regression: weights were computed linear in Hz)."""
    n_fft, sr = 512, 16000
    fb = fe.mel_filterbank(26, n_fft, sr, 20.0, 8000.0)
    mel_pts = np.linspace(fe.hz_to_mel(20.0), fe.hz_to_mel(8000.0), 28)
    bin_mels = fe.hz_to_mel(np.arange(n_fft // 2 + 1) * sr / n_fft)
    for m in (0, 7, 25):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (bin_mels - lo) / (ctr - lo)
        down = (hi - bin_mels) / (hi - ctr)
        expect = np.maximum(0.0, np.minimum(up, down))
        np.testing.assert_allclose(fb[:, m], expect, atol=1e-12)
