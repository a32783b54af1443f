"""Intensity contour analysis (Praat ``Sound: To Intensity...`` semantics).

Replaces the Praat native path used by the reference for energy features and
silence/syllable detection (src/mshds_extractor.py:41,198): frames on the
symmetric Praat grid, Kaiser-windowed (β=20, ~190 dB sidelobes) energy in dB
re 2·10⁻⁵ Pa (air-pressure convention: WAV full scale ±1 ≙ ±1 Pa), with the
contour statistics the reference calls: energy-averaged mean, parabolic
min/max, quantiles, and values at arbitrary times.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pitch import praat_frame_grid

_REF_POWER = 4.0e-10  # (2e-5 Pa)^2


class IntensityContour(NamedTuple):
    times: np.ndarray
    values_db: np.ndarray  # (N,) dB SPL-like

    def mean_energy_db(self) -> float:
        """Praat 'Get mean ... energy': dB of the time-averaged power."""
        p = np.power(10.0, self.values_db / 10.0)
        return float(10.0 * np.log10(np.mean(p)))

    def mean_db(self) -> float:
        return float(np.mean(self.values_db))

    def _parabolic_extremum(self, idx: int, sign: float) -> float:
        v = self.values_db
        if 0 < idx < len(v) - 1:
            dl = v[idx] - v[idx - 1]
            dr = v[idx] - v[idx + 1]
            denom = dl + dr
            if denom > 0:
                return float(v[idx] + 0.125 * (dl - dr) ** 2 / denom)
        return float(v[idx])

    def min_db(self, parabolic: bool = True) -> float:
        idx = int(np.argmin(self.values_db))
        if not parabolic:
            return float(self.values_db[idx])
        inv = IntensityContour(self.times, -self.values_db)
        return -inv._parabolic_extremum(idx, 1.0)

    def max_db(self, parabolic: bool = True) -> float:
        idx = int(np.argmax(self.values_db))
        if not parabolic:
            return float(self.values_db[idx])
        return self._parabolic_extremum(idx, 1.0)

    def quantile(self, q: float) -> float:
        """Praat 'Get quantile': NUMquantile's interpolated order statistic
        at 1-based place q·(n+1) + 0.25, left index clipped to [1, n-1]."""
        v = np.sort(self.values_db)
        n = len(v)
        if n == 0:
            return float("nan")
        if n == 1:
            return float(v[0])
        place = q * (n + 1) + 0.25
        left = int(math.floor(place))
        left = min(max(left, 1), n - 1)
        return float(v[left - 1] + (place - left) * (v[left] - v[left - 1]))

    def value_at_time(self, t, interpolation: str = "cubic") -> float:
        """Contour value at time t (linear interp; 'Cubic' in Praat differs
        by O(dt²) which is negligible at the 1 ms steps used here)."""
        t = np.asarray(t, dtype=np.float64)
        dt = self.times[1] - self.times[0] if len(self.times) > 1 else 1.0
        pos = (t - self.times[0]) / dt
        i0 = np.clip(np.floor(pos).astype(int), 0, len(self.values_db) - 1)
        i1 = np.clip(i0 + 1, 0, len(self.values_db) - 1)
        w = np.clip(pos - i0, 0.0, 1.0)
        return float((1 - w) * self.values_db[i0] + w * self.values_db[i1])

    def min_in_range(self, t1: float, t2: float) -> float:
        mask = (self.times >= t1) & (self.times <= t2)
        if not mask.any():
            return float("nan")
        return float(self.values_db[mask].min())


@partial(jax.jit, static_argnums=(2,))
def _frame_power(frames: jnp.ndarray, window: jnp.ndarray, subtract_mean: bool = True):
    w = window / jnp.sum(window)
    if subtract_mean:
        mean = jnp.sum(frames * w, axis=-1, keepdims=True)
        frames = frames - mean
    return jnp.sum(frames * frames * w, axis=-1)


def intensity_contour(
    x: np.ndarray,
    sr: float,
    minimum_pitch: float = 100.0,
    time_step: float = 0.0,
    subtract_mean: bool = True,
) -> IntensityContour:
    """Praat-grid intensity contour.

    Window duration 6.4/minimum_pitch (two Praat 3.2-period halves), Kaiser
    β = 2π²+0.5; default time step = window/4.
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    window_s = 6.4 / minimum_pitch
    dt = time_step if time_step > 0 else window_s / 4.0
    n_frames, t0 = praat_frame_grid(len(x), sr, window_s, dt)
    if n_frames < 1:
        return IntensityContour(np.zeros(0), np.zeros(0))
    win_len = int(round(window_s * sr))
    # Praat Sound_to_Intensity: Kaiser-20-like window with
    # β = 2π² + 0.5 ≈ 20.24 (NUMbessel_i0_f((2π²+0.5)·sqrt(1−(2φ)²)));
    # the I0(β) normalization in np.kaiser cancels in w/Σw
    window = jnp.asarray(np.kaiser(win_len, 2.0 * np.pi**2 + 0.5))
    centers = t0 + np.arange(n_frames) * dt
    starts = np.clip(
        np.round(centers * sr - win_len / 2).astype(int), 0, max(len(x) - win_len, 0)
    )
    from .bucketing import pad_frames

    frames_np, _ = pad_frames(x[starts[:, None] + np.arange(win_len)[None, :]])
    power = np.asarray(
        _frame_power(jnp.asarray(frames_np), window, subtract_mean)
    )[:n_frames]
    db = 10.0 * np.log10(np.maximum(power, 1e-30) / _REF_POWER)
    return IntensityContour(centers, db)


@partial(jax.jit, static_argnums=(3, 4))
def _gathered_frame_power(x_cat, starts, window, win_len: int, subtract_mean: bool):
    """Device-side framing + windowed power (corpus-batched intensity)."""
    from .framing import gather_frames

    return _frame_power(gather_frames(x_cat, starts, win_len), window, subtract_mean)


def intensity_contour_batch(
    xs,
    sr: float,
    minimum_pitch: float = 100.0,
    time_step: float = 0.0,
    subtract_mean: bool = True,
    buf=None,
    indices=None,
    defer: bool = False,
) -> "list[IntensityContour]":
    """Batched :func:`intensity_contour` over many waveforms.

    All files' frames go through one jitted power computation — waveforms are
    uploaded concatenated and framed on device (same design as
    ops.pitch.pitch_track_batch), or gathered from an already-uploaded
    ``ops.framing.CorpusBuffer``. Bit-equivalent to the per-file path.
    With ``defer=True`` returns an ``ops.framing.Deferred`` (fetch via
    ``.result()`` or ``framing.collect``).
    """
    from .bucketing import pad_frames
    from .framing import Deferred
    from .pitch import praat_frame_grid

    window_s = 6.4 / minimum_pitch
    dt = time_step if time_step > 0 else window_s / 4.0
    win_len = int(round(window_s * sr))
    # Praat Sound_to_Intensity: Kaiser-20-like window with
    # β = 2π² + 0.5 ≈ 20.24 (NUMbessel_i0_f((2π²+0.5)·sqrt(1−(2φ)²)));
    # the I0(β) normalization in np.kaiser cancels in w/Σw
    window = jnp.asarray(np.kaiser(win_len, 2.0 * np.pi**2 + 0.5))

    if buf is not None:
        idxs = list(indices) if indices is not None else list(range(len(buf.xs)))
        xs = [buf.xs[i] for i in idxs]
        if win_len > buf.pad:
            raise ValueError(f"corpus buffer pad {buf.pad} < window {win_len}")
    else:
        idxs = None

    metas, start_blocks, pieces = [], [], []
    offset = 0
    for k, x in enumerate(xs):
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        n_frames, t0 = praat_frame_grid(len(x), sr, window_s, dt)
        centers = t0 + np.arange(n_frames) * dt
        metas.append((n_frames, centers))
        if n_frames < 1:
            continue
        if buf is None:
            base = offset
            pieces.append(np.pad(x, (0, win_len)).astype(np.float32))
            offset += len(x) + win_len
        else:
            base = int(buf.offsets[idxs[k]])
        starts = np.clip(
            np.round(centers * sr - win_len / 2).astype(int),
            0, max(len(x) - win_len, 0),
        )
        start_blocks.append(starts + base)

    if not start_blocks:
        empty = [IntensityContour(m[1], np.zeros(m[0])) for m in metas]
        return Deferred.ready(empty) if defer else empty

    x_cat = buf.x_cat if buf is not None else jnp.asarray(np.concatenate(pieces))
    all_starts = np.concatenate(start_blocks).astype(np.int32)
    starts_padded, _ = pad_frames(all_starts[:, None])
    power_dev = _gathered_frame_power(
        x_cat, jnp.asarray(starts_padded[:, 0]), window, win_len, subtract_mean
    )

    def _finalize(power):
        power = np.asarray(power)
        out = []
        cursor = 0
        for n_frames, centers in metas:
            if n_frames < 1:
                out.append(IntensityContour(centers, np.zeros(0)))
                continue
            p = power[cursor : cursor + n_frames]
            cursor += n_frames
            db = 10.0 * np.log10(np.maximum(p, 1e-30) / _REF_POWER)
            out.append(IntensityContour(centers, db))
        return out

    d = Deferred(power_dev, _finalize)
    return d if defer else d.result()
