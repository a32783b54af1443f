"""Shared framed-STFT → mel → MFCC front end.

This single batched core feeds every feature extractor in the framework —
the openSMILE-style 911-feature DAG (Androids.conf: cFramer 25 ms/10 ms,
preemphasis k=0.97, Hamming, FFT magnitude, HTK mel 26 bands 20-8000 Hz,
MFCC 1-12: Androids.conf:71-113) and the Praat-style MSHDS analyses (5 ms
hop variants, Gaussian windows). The reference runs these as per-file C++
loops (openSMILE binary / Praat); here every stage is a batched JAX op over
``(..., T)`` signals so a whole corpus shard compiles into one XLA program
per bucket shape: framing is a gather, the filterbank and DCT are matmuls
that land on the MXU, and elementwise stages fuse into them.

All functions are jit/vmap-friendly with static frame geometry.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------

def num_frames(n_samples: int, frame_len: int, hop: int, center: bool = False) -> int:
    """Number of complete frames for a signal of ``n_samples``."""
    if center:
        n_samples = n_samples + 2 * (frame_len // 2)
    if n_samples < frame_len:
        return 0
    return 1 + (n_samples - frame_len) // hop


def frame_signal(
    x: jnp.ndarray, frame_len: int, hop: int, center: bool = False
) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, frame_len).

    ``center=False`` (openSMILE/HTK convention): frame i covers samples
    ``[i*hop, i*hop + frame_len)``; the signal tail that doesn't fill a frame
    is dropped. ``center=True`` (Praat-like): frames are centered on
    ``i*hop`` with reflect padding.
    """
    if center:
        pad = frame_len // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n = num_frames(x.shape[-1], frame_len, hop, center=False)
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]
    return x[..., idx]


# ---------------------------------------------------------------------------
# Windows (host-computed, cached; applied on device)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def hamming_window(n: int, periodic: bool = False) -> np.ndarray:
    m = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / m)


@lru_cache(maxsize=32)
def hann_window(n: int, periodic: bool = False) -> np.ndarray:
    m = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / m)


@lru_cache(maxsize=32)
def gaussian_window(n: int, alpha: float = 2.5) -> np.ndarray:
    """Gaussian window à la Praat spectrogram analysis (sd = (n-1)/(2*alpha))."""
    k = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
    sigma = (n - 1) / (2.0 * alpha)
    return np.exp(-0.5 * (k / sigma) ** 2)


# ---------------------------------------------------------------------------
# Preemphasis and spectra
# ---------------------------------------------------------------------------

def preemphasize(frames: jnp.ndarray, k: float = 0.97) -> jnp.ndarray:
    """Per-frame first-difference preemphasis: y[t] = x[t] - k*x[t-1].

    Applied within each frame with y[0] = x[0] - k*x[0]... openSMILE's
    cVectorPreemphasis (Androids.conf:78-81) operates on framed vectors with
    the first sample differenced against itself's predecessor inside the
    frame (first output equals x[0]*(1-k) in HTK convention).
    """
    shifted = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    return frames - k * shifted


def stft_magnitude(
    frames: jnp.ndarray, window: Optional[np.ndarray] = None, n_fft: Optional[int] = None
) -> jnp.ndarray:
    """Magnitude spectrum of windowed frames (..., n_frames, n_fft//2+1).

    Routed through :mod:`..ops.dft`: on TPU the transform is a GEMM over a
    cached cos/sin basis (MXU-native; also required on backends without
    XLA FftOp), elsewhere ``jnp.fft.rfft``.
    """
    from ..ops.dft import rfft_mag

    if window is not None:
        frames = frames * jnp.asarray(window, dtype=frames.dtype)
    n_fft = n_fft or _next_pow2(frames.shape[-1])
    return rfft_mag(frames, n_fft)


def power_spectrum(
    frames: jnp.ndarray, window: Optional[np.ndarray] = None, n_fft: Optional[int] = None
) -> jnp.ndarray:
    from ..ops.dft import rfft_power

    if window is not None:
        frames = frames * jnp.asarray(window, dtype=frames.dtype)
    return rfft_power(frames, n_fft or _next_pow2(frames.shape[-1]))


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# Mel filterbank + MFCC (HTK conventions, as used by openSMILE)
# ---------------------------------------------------------------------------

def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=16)
def mel_filterbank(
    n_mels: int, n_fft: int, sr: int, fmin: float = 20.0, fmax: float = 8000.0
) -> np.ndarray:
    """HTK-style triangular mel filterbank, shape (n_fft//2+1, n_mels).

    Triangle centers are equally spaced in mel between ``fmin`` and ``fmax``
    and the triangle *weights are linear in mel* (HTK/openSMILE
    ``htkcompatible=1`` compute each bin's weight on the mel axis, not the Hz
    axis); each filter peaks at 1, no area normalization
    (Androids.conf:99-105: 26 bands, 20-8000 Hz).
    """
    n_bins = n_fft // 2 + 1
    fft_mels = hz_to_mel(np.arange(n_bins, dtype=np.float64) * sr / n_fft)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_mels - lo) / max(ctr - lo, 1e-12)
        down = (hi - fft_mels) / max(hi - ctr, 1e-12)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


@lru_cache(maxsize=16)
def _dct_matrix(n_out: int, n_in: int, first: int = 1) -> np.ndarray:
    """HTK DCT-II rows ``first..first+n_out-1``, shape (n_in, n_out)."""
    j = np.arange(n_in, dtype=np.float64)
    rows = []
    for i in range(first, first + n_out):
        rows.append(np.cos(np.pi * i / n_in * (j + 0.5)))
    mat = np.stack(rows, axis=1) * math.sqrt(2.0 / n_in)
    return mat


@lru_cache(maxsize=16)
def _lifter(n_ceps: int, l: int = 22, first: int = 1) -> np.ndarray:
    i = np.arange(first, first + n_ceps, dtype=np.float64)
    return 1.0 + (l / 2.0) * np.sin(np.pi * i / l)


def mfcc_from_power(
    power: jnp.ndarray,
    filterbank: np.ndarray,
    n_ceps: int = 12,
    first_cep: int = 1,
    cep_lifter: int = 22,
    floor: float = 1e-10,
    use_power: bool = False,
    spec_is_power: bool = True,
) -> jnp.ndarray:
    """MFCCs from a (power or magnitude) spectrum.

    ``use_power=False`` feeds the filterbank with the magnitude spectrum
    (openSMILE cMelspec ``usePower=0``, Androids.conf:99-105); log energies
    then DCT-II (HTK scaling) rows ``first_cep..first_cep+n_ceps-1`` with
    sinusoidal liftering L=22 (cMfcc defaults, htkcompatible=1).
    ``spec_is_power=False`` declares the input is already a magnitude
    spectrum, avoiding a square→sqrt round-trip on the hot path.
    """
    if use_power == spec_is_power:
        spec = power
    elif use_power:
        spec = power * power
    else:
        spec = jnp.sqrt(jnp.maximum(power, 0.0))
    fb = jnp.asarray(filterbank, dtype=spec.dtype)
    mel_e = jnp.maximum(spec @ fb, floor)
    log_e = jnp.log(mel_e)
    dct = jnp.asarray(
        _dct_matrix(n_ceps, filterbank.shape[1], first_cep), dtype=spec.dtype
    )
    ceps = log_e @ dct
    if cep_lifter:
        ceps = ceps * jnp.asarray(
            _lifter(n_ceps, cep_lifter, first_cep), dtype=spec.dtype
        )
    return ceps


# ---------------------------------------------------------------------------
# Bundled configuration
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FrontendConfig:
    """Frame geometry + spectral settings shared by the extractors."""

    sample_rate: int = 16000
    frame_seconds: float = 0.025
    hop_seconds: float = 0.010
    preemphasis: float = 0.97
    n_fft: Optional[int] = None
    n_mels: int = 26
    fmin: float = 20.0
    fmax: float = 8000.0

    @property
    def frame_len(self) -> int:
        return int(round(self.frame_seconds * self.sample_rate))

    @property
    def hop(self) -> int:
        return int(round(self.hop_seconds * self.sample_rate))

    @property
    def fft_size(self) -> int:
        return self.n_fft or _next_pow2(self.frame_len)


@partial(jax.jit, static_argnums=(1,))
def framed_stft(x: jnp.ndarray, cfg: FrontendConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused pass: frame → preemphasize → Hamming → |FFT|.

    Returns ``(frames, magnitude)`` with shapes (..., N, frame_len) and
    (..., N, fft_size//2+1). ``frames`` are the raw (pre-window) frames, which
    downstream LLDs like ZCR need (openSMILE computes ZCR on the pre-window
    ``frames`` level, Androids.conf:125-132).
    """
    frames = frame_signal(x, cfg.frame_len, cfg.hop)
    pre = preemphasize(frames, cfg.preemphasis)
    mag = stft_magnitude(pre, hamming_window(cfg.frame_len), cfg.fft_size)
    return frames, mag
