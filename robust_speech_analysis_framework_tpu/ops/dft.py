"""GEMM-native spectral transforms (DFT / inverse-DFT as matmuls).

On TPU the MXU makes moderate-size DFTs *faster as matrix products* than as
FFT butterflies (the frame sizes here are 400-1070 samples), and some TPU
backends don't implement XLA's FftOp at all — so every spectral op in this
framework routes through this module: on TPU backends, transforms are
(frames @ cos/sin basis) matmuls batched over all frames; elsewhere they
fall back to ``jnp.fft``. (Same design as GEMM-native NDFT audio frontends,
e.g. MelT, arXiv:2606.01009.)

Provided primitives:
* :func:`rfft_mag` / :func:`rfft_power` — magnitude/power spectrum;
* :func:`autocorr_via_power` — r(τ) = iDFT of the power spectrum
  (Wiener–Khinchin), the core of the pitch/harmonicity ops;
* :func:`cross_corr` — linear cross-correlation of two framed signals;
* :func:`power_of_real_dft` — |DFT(x)|² of an arbitrary real sequence
  (cepstrum-of-log-spectrum use case).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def use_matmul_dft() -> bool:
    """True when spectral ops should run as matmuls (TPU backends)."""
    override = os.environ.get("RSAF_FORCE_MATMUL_DFT")
    if override is not None:
        return override not in ("0", "false", "")
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=64)
def _dft_basis(n_in: int, n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) bases mapping a length-``n_in`` real signal (zero-padded
    to ``n_fft``) to its rfft: shapes (n_in, n_fft//2+1).

    X[k] = Σ_t x[t]·exp(−2πi·k·t/n_fft) → Re = x@cos, Im = x@(−sin).
    """
    t = np.arange(n_in)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@lru_cache(maxsize=64)
def _idft_cos_basis(n_fft: int, n_out: int) -> np.ndarray:
    """Basis turning an rfft *power* spectrum into the signal's circular
    autocorrelation at lags [0, n_out): r = power @ B with the conjugate
    symmetry folded in (interior bins weighted 2)."""
    k = np.arange(n_fft // 2 + 1)[:, None]
    tau = np.arange(n_out)[None, :]
    b = np.cos(2.0 * np.pi * k * tau / n_fft)
    w = np.full((n_fft // 2 + 1, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    return (b * w / n_fft).astype(np.float32)


@partial(jax.jit, static_argnums=(1, 2))
def _matmul_rfft_parts(x: jnp.ndarray, n_fft: int, precision=None):
    n_in = x.shape[-1]
    cos_b, sin_b = _dft_basis(n_in, n_fft)
    cos_b = jnp.asarray(cos_b, x.dtype)
    sin_b = jnp.asarray(sin_b, x.dtype)
    re = jnp.matmul(x, cos_b, preferred_element_type=jnp.float32,
                    precision=precision)
    im = jnp.matmul(x, sin_b, preferred_element_type=jnp.float32,
                    precision=precision)
    return re, im


def rfft_power(x: jnp.ndarray, n_fft: Optional[int] = None) -> jnp.ndarray:
    """|rfft(x, n_fft)|² along the last axis."""
    n_fft = n_fft or x.shape[-1]
    if use_matmul_dft():
        re, im = _matmul_rfft_parts(x, n_fft)
        return re * re + im * im
    spec = jnp.fft.rfft(x, n_fft)
    return jnp.real(spec * jnp.conj(spec))


def rfft_mag(x: jnp.ndarray, n_fft: Optional[int] = None) -> jnp.ndarray:
    n_fft = n_fft or x.shape[-1]
    if use_matmul_dft():
        return jnp.sqrt(jnp.maximum(rfft_power(x, n_fft), 0.0))
    return jnp.abs(jnp.fft.rfft(x, n_fft))


def autocorr_via_power(power: jnp.ndarray, n_fft: int, n_lags: int) -> jnp.ndarray:
    """Circular autocorrelation r(τ), τ∈[0, n_lags), from an rfft power
    spectrum of length n_fft//2+1 (Wiener–Khinchin)."""
    if use_matmul_dft():
        basis = jnp.asarray(_idft_cos_basis(n_fft, n_lags), power.dtype)
        return jnp.matmul(power, basis, preferred_element_type=jnp.float32)
    full = jnp.fft.irfft(power, n_fft)
    return full[..., :n_lags]


def autocorr(x: jnp.ndarray, n_fft: int, n_lags: int) -> jnp.ndarray:
    """r(τ) of the (zero-padded) signal along the last axis."""
    return autocorr_via_power(rfft_power(x, n_fft), n_fft, n_lags)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _matmul_cross_corr(base, ext, n_fft, n_lags, precision=None):
    rb, ib = _matmul_rfft_parts(base, n_fft, precision)
    re_, ie = _matmul_rfft_parts(ext, n_fft, precision)
    # conj(F(base))·F(ext)
    h_re = rb * re_ + ib * ie
    h_im = rb * ie - ib * re_
    k = np.arange(n_fft // 2 + 1)[:, None]
    tau = np.arange(n_lags)[None, :]
    ang = 2.0 * np.pi * k * tau / n_fft
    w = np.full((n_fft // 2 + 1, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    cos_b = jnp.asarray((np.cos(ang) * w / n_fft).astype(np.float32))
    sin_b = jnp.asarray((np.sin(ang) * w / n_fft).astype(np.float32))
    return jnp.matmul(
        h_re, cos_b, preferred_element_type=jnp.float32, precision=precision
    ) - jnp.matmul(
        h_im, sin_b, preferred_element_type=jnp.float32, precision=precision
    )


def cross_corr(base: jnp.ndarray, ext: jnp.ndarray, n_fft: int, n_lags: int,
               precision=None) -> jnp.ndarray:
    """corr(τ) = Σ_t base[t]·ext[t+τ] for τ∈[0, n_lags) along the last axis
    (base zero-padded to ext's length; both zero-padded to n_fft ≥ len(ext) +
    len(base) to avoid circular wrap within the lag band).

    ``precision`` (TPU matmul path only): pass ``jax.lax.Precision.HIGHEST``
    when downstream consumes fine structure near a correlation peak (e.g.
    argmax lag searches) — the MXU's default bf16 passes add ~4e-3 relative
    noise, larger than the peak curvature of long-period signals."""
    if use_matmul_dft():
        return _matmul_cross_corr(base, ext, n_fft, n_lags, precision)
    fb = jnp.fft.rfft(base, n_fft)
    fe = jnp.fft.rfft(ext, n_fft)
    return jnp.fft.irfft(jnp.conj(fb) * fe, n_fft)[..., :n_lags]


def power_of_real_dft(x: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """|DFT(x, n_fft)|² of a real sequence along the last axis (bins
    0..n_fft//2). The cepstrum-of-log-spectrum building block."""
    return rfft_power(x, n_fft)
