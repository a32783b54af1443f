"""Contour smoothing, delta regression, and statistical functionals.

The tail of the openSMILE DAG (Androids.conf): ``cContourSmoother``
(moving-average, window 3 → ``_sma``), ``cDeltaRegression`` (deltawin=2 →
``_de``), and ``cFunctionals`` over the whole file with the Extremes /
Regression / Moments groups enabled as configured (Androids.conf:349-368):
max, min, range, maxPos, minPos, amean, linregc1, linregc2, linregerrQ,
stddev, skewness, kurtosis — 12 functionals per contour.

All functions are vectorized over (T, D) LLD matrices and jit-compatible;
one fused XLA program maps a whole corpus batch of LLD matrices to summary
vectors.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

FUNCTIONAL_NAMES: List[str] = [
    "max", "min", "range", "maxPos", "minPos", "amean",
    "linregc1", "linregc2", "linregerrQ",
    "stddev", "skewness", "kurtosis",
]


def smooth_sma(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Symmetric moving average over time (cContourSmoother default win 3).

    Edges use the shrunk window (average over available samples), matching
    openSMILE's no-delay symmetric smoother. x: (T, D).
    """
    t = x.shape[0]
    if t == 0 or window <= 1:
        return x
    half = window // 2
    padded = jnp.pad(x, ((half, half), (0, 0)))
    csum = jnp.cumsum(padded, axis=0)
    csum = jnp.concatenate([jnp.zeros_like(csum[:1]), csum], axis=0)
    sums = csum[window:] - csum[:-window]  # (T, D) full-window sums
    counts = jnp.minimum(jnp.arange(t) + half + 1, t) - jnp.maximum(
        jnp.arange(t) - half, 0
    )
    return sums / counts[:, None]


def delta_regression(x: jnp.ndarray, deltawin: int = 2) -> jnp.ndarray:
    """HTK-style delta coefficients (cDeltaRegression, deltawin=2):
    d_t = Σ_{n=1..W} n·(x_{t+n} − x_{t−n}) / (2·Σ n²), edges clamped."""
    t = x.shape[0]
    if t == 0:
        return x
    denom = 2.0 * sum(n * n for n in range(1, deltawin + 1))
    idx = jnp.arange(t)
    out = jnp.zeros_like(x)
    for n in range(1, deltawin + 1):
        plus = x[jnp.clip(idx + n, 0, t - 1)]
        minus = x[jnp.clip(idx - n, 0, t - 1)]
        out = out + n * (plus - minus)
    return out / denom


def apply_functionals(x: jnp.ndarray) -> jnp.ndarray:
    """The 12 enabled functionals per contour column.

    x: (T, D) → (12, D), rows in FUNCTIONAL_NAMES order. maxPos/minPos are
    frame indices (openSMILE 'frames' normalization); linreg fits value
    against the frame index with linregerrQ the mean quadratic error.
    """
    t, d = x.shape
    n = jnp.asarray(t, x.dtype)
    mx = jnp.max(x, axis=0)
    mn = jnp.min(x, axis=0)
    max_pos = jnp.argmax(x, axis=0).astype(x.dtype)
    min_pos = jnp.argmin(x, axis=0).astype(x.dtype)
    mean = jnp.mean(x, axis=0)

    ti = jnp.arange(t, dtype=x.dtype)[:, None]
    t_mean = (t - 1) / 2.0
    t_var = jnp.mean((ti[:, 0] - t_mean) ** 2)
    cov = jnp.mean((ti - t_mean) * (x - mean), axis=0)
    slope = cov / jnp.maximum(t_var, 1e-30)
    offset = mean - slope * t_mean
    resid = x - (slope[None, :] * ti + offset[None, :])
    err_q = jnp.mean(resid * resid, axis=0)

    var = jnp.mean((x - mean) ** 2, axis=0)
    std = jnp.sqrt(var)
    std_safe = jnp.maximum(std, 1e-30)
    skew = jnp.mean((x - mean) ** 3, axis=0) / std_safe**3
    kurt = jnp.mean((x - mean) ** 4, axis=0) / std_safe**4

    return jnp.stack(
        [mx, mn, mx - mn, max_pos, min_pos, mean,
         slope, offset, err_q, std, skew, kurt],
        axis=0,
    )


def lld_to_functionals(lld: jnp.ndarray, sma_window: int = 3, deltawin: int = 2):
    """Full tail: sma smoothing → deltas → functionals on both streams.

    lld: (T, D) raw LLD matrix → (12, 2D): functionals of the smoothed
    contours followed by functionals of their delta contours (matching the
    reader order lld;lld_de in Androids.conf:349-352... the conf interleaves
    level groups; the orchestrator handles final column ordering).
    """
    sma = smooth_sma(lld, sma_window)
    de = delta_regression(sma, deltawin)
    return apply_functionals(sma), apply_functionals(de)
