"""Spectrogram and spectral-moment analysis (Praat semantics).

Replaces the Praat path of the reference's spectral-moment features
(src/mshds_extractor.py:355-369): Gaussian-window spectrogram (physical
window 2× the nominal length, as Praat documents), per-frame power spectrum,
and the first four moments of the power distribution (power=2): centre of
gravity, standard deviation, skewness, kurtosis.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pitch import praat_frame_grid


class SpectrogramFrames(NamedTuple):
    times: np.ndarray  # (N,)
    freqs: np.ndarray  # (F,)
    power: np.ndarray  # (N, F)


@partial(jax.jit, static_argnums=(1,))
def _power_frames(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    from .dft import rfft_power

    return rfft_power(frames, n_fft)


def spectrogram(
    x: np.ndarray,
    sr: float,
    window_length: float = 0.025,
    time_step: float = 0.005,
    max_frequency: float = None,
) -> SpectrogramFrames:
    """Gaussian-window spectrogram on the Praat grid."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    phys = 2.0 * window_length
    n_frames, t0 = praat_frame_grid(len(x), sr, phys, time_step)
    win_len = int(round(phys * sr))
    if n_frames < 1:
        return SpectrogramFrames(np.zeros(0), np.zeros(0), np.zeros((0, 0)))
    k = np.arange(win_len) - (win_len - 1) / 2
    window = (np.exp(-48.0 * (k / win_len) ** 2) - math.exp(-12.0)) / (
        1.0 - math.exp(-12.0)
    )
    centers = t0 + np.arange(n_frames) * time_step
    starts = np.clip(
        np.round(centers * sr - win_len / 2).astype(int), 0, max(len(x) - win_len, 0)
    )
    from .bucketing import pad_frames

    frames, _ = pad_frames(x[starts[:, None] + np.arange(win_len)[None, :]] * window)
    n_fft = 1 << int(np.ceil(np.log2(win_len)))
    power = np.asarray(_power_frames(jnp.asarray(frames), n_fft))[:n_frames]
    freqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    if max_frequency:
        keep = freqs <= max_frequency
        freqs, power = freqs[keep], power[:, keep]
    return SpectrogramFrames(centers, freqs, power)


def spectral_moments(
    power: np.ndarray, freqs: np.ndarray, power_exponent: float = 2.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-frame (gravity, std, skewness, kurtosis) of |S|^power_exponent.

    ``power`` is already |S|²; Praat's ``power=2`` option means moments are
    taken over |S|² — i.e. this array used as the weighting directly.
    """
    w = power if power_exponent == 2.0 else np.power(
        np.maximum(power, 0.0), power_exponent / 2.0
    )
    total = w.sum(axis=1)
    total = np.where(total > 0, total, np.nan)
    g = (w * freqs[None, :]).sum(axis=1) / total
    d = freqs[None, :] - g[:, None]
    var = (w * d**2).sum(axis=1) / total
    std = np.sqrt(var)
    with np.errstate(invalid="ignore", divide="ignore"):
        skew = (w * d**3).sum(axis=1) / (total * std**3)
        kurt = (w * d**4).sum(axis=1) / (total * var**2) - 3.0
    return g, std, skew, kurt


def voiced_mean_moments(
    x: np.ndarray,
    sr: float,
    voiced_at,  # callable t -> bool array (e.g. PitchTrack-based)
    window_length: float = 0.025,
    time_step: float = 0.005,
) -> Tuple[float, float, float, float]:
    """Mean of per-frame spectral moments over voiced frames only
    (reference behavior, src/mshds_extractor.py:361-369)."""
    sg = spectrogram(x, sr, window_length, time_step)
    if len(sg.times) == 0:
        return (float("nan"),) * 4
    g, s, sk, ku = spectral_moments(sg.power, sg.freqs)
    voiced = np.asarray(voiced_at(sg.times), dtype=bool)
    out = []
    for v in (g, s, sk, ku):
        vv = v[voiced & np.isfinite(v)]
        out.append(float(vv.mean()) if vv.size else float("nan"))
    return tuple(out)


@partial(jax.jit, static_argnums=(3, 4))
def _gathered_frame_moments(x_cat, starts, window, win_len: int, n_fft: int):
    """Device-side framing + power spectrum + first four spectral moments per
    frame; only the (N, 4) moment matrix crosses back to the host (the (N, F)
    power matrix — ~1000× larger — never leaves the device)."""
    from .dft import rfft_power

    from .framing import gather_frames

    w = rfft_power(gather_frames(x_cat, starts, win_len) * window[None, :], n_fft)
    freqs = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32)
    total = jnp.sum(w, axis=1)
    total = jnp.where(total > 0, total, jnp.nan)
    g = jnp.sum(w * freqs[None, :], axis=1) / total
    d = freqs[None, :] - g[:, None]
    var = jnp.sum(w * d * d, axis=1) / total
    std = jnp.sqrt(var)
    skew = jnp.sum(w * d * d * d, axis=1) / (total * std * var)
    kurt = jnp.sum(w * d * d * d * d, axis=1) / (total * var * var) - 3.0
    return jnp.stack([g, std, skew, kurt], axis=1)


def voiced_mean_moments_batch(
    xs,
    sr: float,
    voiced_fns,  # list of callables t -> bool array, one per file
    window_length: float = 0.025,
    time_step: float = 0.005,
    buf=None,
    indices=None,
    defer: bool = False,
) -> "list[Tuple[float, float, float, float]]":
    """Corpus-batched :func:`voiced_mean_moments`: all files' spectrogram
    frames go through one device program computing per-frame moments (in
    units of FFT bins, rescaled to Hz on the host), and only (N_total, 4)
    floats are transferred back."""
    from .bucketing import pad_frames
    from .pitch import praat_frame_grid

    phys = 2.0 * window_length
    win_len = int(round(phys * sr))
    k = np.arange(win_len) - (win_len - 1) / 2
    window = (np.exp(-48.0 * (k / win_len) ** 2) - math.exp(-12.0)) / (
        1.0 - math.exp(-12.0)
    )
    n_fft = 1 << int(np.ceil(np.log2(win_len)))
    df = sr / n_fft  # Hz per FFT bin; device moments are in bin units

    if buf is not None:
        idxs = list(indices) if indices is not None else list(range(len(buf.xs)))
        xs = [buf.xs[i] for i in idxs]
        if win_len > buf.pad:
            raise ValueError(f"corpus buffer pad {buf.pad} < window {win_len}")
    else:
        idxs = None

    metas, start_blocks, pieces = [], [], []
    offset = 0
    for k2, x in enumerate(xs):
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        n_frames, t0 = praat_frame_grid(len(x), sr, phys, time_step)
        centers = t0 + np.arange(max(n_frames, 0)) * time_step
        metas.append((n_frames, centers))
        if n_frames < 1:
            continue
        if buf is None:
            base = offset
            pieces.append(np.pad(x, (0, win_len)).astype(np.float32))
            offset += len(x) + win_len
        else:
            base = int(buf.offsets[idxs[k2]])
        starts = np.clip(
            np.round(centers * sr - win_len / 2).astype(int),
            0, max(len(x) - win_len, 0),
        )
        start_blocks.append(starts + base)

    from .framing import Deferred

    if not start_blocks:
        empty = [(float("nan"),) * 4 for _ in metas]
        return Deferred.ready(empty) if defer else empty

    x_cat = buf.x_cat if buf is not None else jnp.asarray(np.concatenate(pieces))
    all_starts = np.concatenate(start_blocks).astype(np.int32)
    starts_padded, _ = pad_frames(all_starts[:, None])
    m_dev = _gathered_frame_moments(
        x_cat, jnp.asarray(starts_padded[:, 0]),
        jnp.asarray(window, jnp.float32), win_len, n_fft,
    )

    def _finalize(m):
        # Late binding: voiced_fns may be a zero-arg callable producing the
        # per-file voiced predicates, so the device program can be
        # dispatched BEFORE the pitch tracks that define voicing are
        # finalized (the voiced mask is host-side finalize work only).
        fns = voiced_fns() if callable(voiced_fns) else voiced_fns
        m = np.asarray(m).astype(np.float64)
        # bin units → Hz (gravity/std scale by df; skew/kurt are scale-free)
        m[:, 0] *= df
        m[:, 1] *= df
        out = []
        cursor = 0
        for (n_frames, centers), voiced_at in zip(metas, fns):
            if n_frames < 1:
                out.append((float("nan"),) * 4)
                continue
            mm = m[cursor : cursor + n_frames]
            cursor += n_frames
            voiced = np.asarray(voiced_at(centers), dtype=bool)
            vals = []
            for c in range(4):
                v = mm[voiced & np.isfinite(mm[:, c]), c]
                vals.append(float(v.mean()) if v.size else float("nan"))
            out.append(tuple(vals))
        return out

    d = Deferred(m_dev, _finalize)
    return d if defer else d.result()
