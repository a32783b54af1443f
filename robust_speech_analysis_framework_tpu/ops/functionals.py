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
    # zero-variance contours get 0 moments (1e-30 cubed underflows in f32)
    std_safe = jnp.maximum(std, 1e-6)
    degenerate = std < 1e-8
    skew = jnp.where(degenerate, 0.0, jnp.mean((x - mean) ** 3, axis=0) / std_safe**3)
    kurt = jnp.where(degenerate, 0.0, jnp.mean((x - mean) ** 4, axis=0) / std_safe**4)

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


# ---------------------------------------------------------------------------
# Length-masked variants (for bucket-padded LLD matrices)
# ---------------------------------------------------------------------------

def smooth_sma_masked(x: jnp.ndarray, length, window: int = 3) -> jnp.ndarray:
    """Masked moving average: identical to :func:`smooth_sma` on the first
    ``length`` rows of a padded (T_pad, D) matrix; rows ≥ length are
    whatever the padding left (callers mask downstream)."""
    t = x.shape[0]
    half = window // 2
    idx = jnp.arange(t)
    valid = (idx < length).astype(x.dtype)
    xm = x * valid[:, None]
    padded = jnp.pad(xm, ((half, half), (0, 0)))
    csum = jnp.cumsum(padded, axis=0)
    csum = jnp.concatenate([jnp.zeros_like(csum[:1]), csum], axis=0)
    sums = csum[window:] - csum[:-window]
    counts = jnp.minimum(idx + half + 1, length) - jnp.maximum(idx - half, 0)
    counts = jnp.maximum(counts, 1)
    return sums / counts[:, None]


def delta_regression_masked(x: jnp.ndarray, length, deltawin: int = 2) -> jnp.ndarray:
    """Masked delta regression: edge clamping at ``length−1`` instead of the
    padded end, matching :func:`delta_regression` on the unpadded matrix."""
    t = x.shape[0]
    denom = 2.0 * sum(n * n for n in range(1, deltawin + 1))
    idx = jnp.arange(t)
    hi = jnp.maximum(length - 1, 0)
    out = jnp.zeros_like(x)
    for n in range(1, deltawin + 1):
        plus = x[jnp.clip(idx + n, 0, hi)]
        minus = x[jnp.clip(idx - n, 0, hi)]
        out = out + n * (plus - minus)
    return out / denom


def apply_functionals_masked(x: jnp.ndarray, length) -> jnp.ndarray:
    """Masked :func:`apply_functionals`: statistics over rows [0, length)."""
    t, d = x.shape
    idx = jnp.arange(t)
    mask = (idx < length)[:, None].astype(x.dtype)
    n = jnp.maximum(length, 1).astype(x.dtype)

    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    pos_inf = jnp.asarray(jnp.inf, x.dtype)
    x_for_max = jnp.where(mask > 0, x, neg_inf)
    x_for_min = jnp.where(mask > 0, x, pos_inf)
    mx = jnp.max(x_for_max, axis=0)
    mn = jnp.min(x_for_min, axis=0)
    max_pos = jnp.argmax(x_for_max, axis=0).astype(x.dtype)
    min_pos = jnp.argmin(x_for_min, axis=0).astype(x.dtype)

    xm = x * mask
    mean = jnp.sum(xm, axis=0) / n
    ti = idx.astype(x.dtype)[:, None]
    t_mean = (n - 1) / 2.0
    t_var = jnp.sum(((ti[:, 0] - t_mean) ** 2) * mask[:, 0]) / n
    cov = jnp.sum((ti - t_mean) * (x - mean) * mask, axis=0) / n
    slope = cov / jnp.maximum(t_var, 1e-30)
    offset = mean - slope * t_mean
    resid = (x - (slope[None, :] * ti + offset[None, :])) * mask
    err_q = jnp.sum(resid * resid, axis=0) / n

    var = jnp.sum(((x - mean) ** 2) * mask, axis=0) / n
    std = jnp.sqrt(var)
    std_safe = jnp.maximum(std, 1e-6)
    degenerate = std < 1e-8
    skew = jnp.where(
        degenerate, 0.0, jnp.sum(((x - mean) ** 3) * mask, axis=0) / n / std_safe**3
    )
    kurt = jnp.where(
        degenerate, 0.0, jnp.sum(((x - mean) ** 4) * mask, axis=0) / n / std_safe**4
    )

    return jnp.stack(
        [mx, mn, mx - mn, max_pos, min_pos, mean,
         slope, offset, err_q, std, skew, kurt],
        axis=0,
    )
