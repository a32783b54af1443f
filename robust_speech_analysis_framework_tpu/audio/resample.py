"""Sample-rate conversion kernels.

Replaces the reference's torchaudio ``Resample`` (polyphase) and Praat
``resample(16000, 50)`` (windowed-sinc, precision 50) native code paths
(src/foundation_model_extractor.py:93, src/mshds_extractor.py:419) with
XLA-friendly implementations:

* :func:`resample_poly` — rational-ratio polyphase FIR resampling, expressed
  as a single ``lax.conv_general_dilated`` (input dilation = up-factor,
  stride = down-factor), so XLA lowers it to one fused convolution on device.
* :func:`resample_sinc` — Praat-style windowed-sinc interpolation with a
  configurable precision (half-width in samples), as a banded gather + matmul.
* ``*_np`` variants — NumPy host fallbacks with identical semantics.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _kaiser_beta(atten_db: float) -> float:
    if atten_db > 50:
        return 0.1102 * (atten_db - 8.7)
    if atten_db > 21:
        return 0.5842 * (atten_db - 21) ** 0.4 + 0.07886 * (atten_db - 21)
    return 0.0


@lru_cache(maxsize=64)
def design_lowpass(up: int, down: int, half_width: int = 10, atten_db: float = 70.0):
    """Kaiser-windowed sinc low-pass for a rational resampler.

    Cutoff at ``min(1/up, 1/down)`` of the intermediate Nyquist; the filter is
    scaled by ``up`` so passband gain is unity after zero-stuffing. Returns a
    float64 NumPy array of odd length ``2*half_width*max(up,down)+1``.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    max_rate = max(up, down)
    cutoff = 1.0 / (2.0 * max_rate)  # in units of the intermediate rate
    n_half = half_width * max_rate
    n = np.arange(-n_half, n_half + 1, dtype=np.float64)
    kernel = 2.0 * cutoff * np.sinc(2.0 * cutoff * n)
    beta = _kaiser_beta(atten_db)
    window = np.kaiser(len(n), beta)
    h = kernel * window
    return (h * up).astype(np.float64)


def _upfirdn_conv(x: jnp.ndarray, h: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """upfirdn(h, x, up, down) via one dilated conv. x: (..., T)."""
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    lhs = x.reshape(-1, 1, t)  # (N, C=1, T)
    rhs = h[::-1].reshape(1, 1, -1).astype(x.dtype)  # conv = correlation with flipped h
    n_h = h.shape[0]
    # Full convolution of the zero-stuffed signal, then stride-`down` sampling
    # starting at phase 0 (scipy.signal.upfirdn alignment).
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(n_h - 1, n_h - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    n_full = (t - 1) * up + n_h  # length of full convolution
    n_keep = -(-n_full // down)
    out = out[..., :n_keep]
    return out.reshape(*batch_shape, -1)


def _aligned_filter(up: int, down: int, half_width: int):
    """Low-pass filter pre-padded so the group delay is a multiple of `down`.

    Prepending zeros shifts the filter's center onto a down-sampling phase
    boundary, so output sample k of the strided conv sits exactly at time
    k*down/up of the input grid (same alignment trick as scipy's
    resample_poly).
    """
    h = design_lowpass(up, down, half_width)
    half_len = (len(h) - 1) // 2
    n_pre_pad = (-half_len) % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    return h, n_pre_remove


@partial(jax.jit, static_argnums=(1, 2, 3))
def resample_poly(x: jnp.ndarray, up: int, down: int, half_width: int = 10) -> jnp.ndarray:
    """Polyphase resample ``x`` (..., T) by rational factor up/down.

    Output length is ``ceil(T * up / down)``; alignment matches
    ``scipy.signal.resample_poly`` (verified in tests with a shared filter).
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    h_np, n_pre_remove = _aligned_filter(up, down, half_width)
    h = jnp.asarray(h_np, dtype=x.dtype)
    t = x.shape[-1]
    n_out = -(-t * up // down)
    full = _upfirdn_conv(x, h, up, down)
    pad_needed = n_pre_remove + n_out - full.shape[-1]
    if pad_needed > 0:
        full = jnp.pad(full, [(0, 0)] * (full.ndim - 1) + [(0, pad_needed)])
    return full[..., n_pre_remove : n_pre_remove + n_out]


def resample_poly_np(x: np.ndarray, up: int, down: int, half_width: int = 10) -> np.ndarray:
    """NumPy host-side equivalent of :func:`resample_poly`."""
    x = np.asarray(x)
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    h, n_pre_remove = _aligned_filter(up, down, half_width)
    t = x.shape[-1]
    stuffed = np.zeros(x.shape[:-1] + (t * up,), dtype=np.float64)
    stuffed[..., ::up] = x
    full = np.apply_along_axis(lambda v: np.convolve(v, h, mode="full"), -1, stuffed)
    n_out = -(-t * up // down)
    picked = full[..., ::down][..., n_pre_remove : n_pre_remove + n_out]
    if picked.shape[-1] < n_out:
        picked = np.pad(picked, [(0, 0)] * (picked.ndim - 1) + [(0, n_out - picked.shape[-1])])
    dtype = x.dtype if np.issubdtype(x.dtype, np.floating) else np.float64
    return picked.astype(dtype)


def _sinc_times(sr_in: int, sr_out: int, n_in: int):
    n_out = int(round(n_in * sr_out / sr_in))
    # Output sample m sits at input-sample coordinate m * sr_in / sr_out.
    return n_out


@partial(jax.jit, static_argnums=(1, 2, 3))
def resample_sinc(
    x: jnp.ndarray, sr_in: int, sr_out: int, precision: int = 50
) -> jnp.ndarray:
    """Windowed-sinc resampling with Praat-like semantics (precision ≈ 50).

    Each output sample interpolates ``2*precision`` neighboring input samples
    with a Hann-windowed sinc; when downsampling the sinc is widened to cut
    off at the target Nyquist (anti-aliasing), matching the behavior of
    Praat's ``Sound: Resample...`` (reference use: src/mshds_extractor.py:419).

    x: (..., T) → (..., round(T*sr_out/sr_in)).
    """
    if sr_in == sr_out:
        return x
    t_in = x.shape[-1]
    n_out = _sinc_times(sr_in, sr_out, t_in)
    ratio = sr_in / sr_out
    # Anti-alias scale: widen the sinc by `ratio` when downsampling.
    scale = max(ratio, 1.0)
    half = int(precision * scale) + 1

    pos = jnp.arange(n_out) * ratio  # fractional input positions, (n_out,)
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base

    offs = jnp.arange(-half + 1, half + 1)  # (2*half,)
    idx = base[:, None] + offs[None, :]  # (n_out, 2*half)
    idx_c = jnp.clip(idx, 0, t_in - 1)
    valid = (idx >= 0) & (idx < t_in)

    arg = (offs[None, :] - frac[:, None]) / scale  # sinc argument, |arg| ≤ ~precision
    win_x = arg / precision  # in [-1, 1] across the full (widened) kernel support
    window = jnp.where(jnp.abs(win_x) < 1.0, 0.5 + 0.5 * jnp.cos(jnp.pi * win_x), 0.0)
    kernel = jnp.sinc(arg) * window / scale
    kernel = jnp.where(valid, kernel, 0.0).astype(x.dtype)

    gathered = x[..., idx_c]  # (..., n_out, 2*half)
    return jnp.sum(gathered * kernel, axis=-1)


def resample_sinc_np(x: np.ndarray, sr_in: int, sr_out: int, precision: int = 50) -> np.ndarray:
    """Pure-NumPy float64 twin of :func:`resample_sinc` (host fallback/oracle)."""
    x = np.asarray(x, dtype=np.float64)
    if sr_in == sr_out:
        return x
    t_in = x.shape[-1]
    n_out = _sinc_times(sr_in, sr_out, t_in)
    ratio = sr_in / sr_out
    scale = max(ratio, 1.0)
    half = int(precision * scale) + 1

    pos = np.arange(n_out) * ratio
    base = np.floor(pos).astype(np.int64)
    frac = pos - base

    offs = np.arange(-half + 1, half + 1)
    idx = base[:, None] + offs[None, :]
    idx_c = np.clip(idx, 0, t_in - 1)
    valid = (idx >= 0) & (idx < t_in)

    arg = (offs[None, :] - frac[:, None]) / scale
    win_x = arg / precision
    window = np.where(np.abs(win_x) < 1.0, 0.5 + 0.5 * np.cos(np.pi * win_x), 0.0)
    kernel = np.sinc(arg) * window / scale
    kernel = np.where(valid, kernel, 0.0)

    return np.einsum("...ok,ok->...o", x[..., idx_c], kernel)
