"""Formant estimation by Burg's method (Praat ``To Formant (burg)...``).

Replaces the Praat native path at src/mshds_extractor.py:319 (step 5 ms,
5 formants to 5 kHz, window 25 ms, preemphasis from 50 Hz):

1. resample to 2×max_formant (device polyphase kernel);
2. preemphasis ``x[t] −= exp(−2π·F·dx)·x[t−1]`` from 50 Hz;
3. Gaussian-like windows of 2× the nominal length on the Praat grid;
4. Burg AR(2·n_formants) per frame — a ``fori_loop`` over model order with
   all frames advancing in lockstep (batched on device);
5. polynomial roots via batched Durand–Kerner iteration (plain complex
   arithmetic → runs on TPU, unlike nonsymmetric eig);
6. roots → (frequency, bandwidth), filtered to (50 Hz, max_formant−50).

Formant tracks support Praat-style linear interpolation at arbitrary times
for the pulse-located sampling the reference does (:326-331).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pitch import praat_frame_grid


@partial(jax.jit, static_argnums=(1,))
def burg_coeffs(frames: jnp.ndarray, order: int) -> jnp.ndarray:
    """Batched Burg AR coefficients.

    frames: (N, L) → a: (N, order) with prediction model
    x[t] ≈ −Σ a[k]·x[t−1−k] (sign convention: polynomial 1 + Σ a_k z^-k).
    """
    n, L = frames.shape
    ef = frames  # runs at the caller's dtype (f32 on device; f64 host oracle)
    eb = ef
    a = jnp.zeros((n, order), ef.dtype)
    idx = jnp.arange(L)

    def body(m, carry):
        ef, eb, a = carry
        # valid region for this order: forward errors at t ∈ [m+1, L), backward at [m, L-1)
        mask = (idx >= m + 1).astype(ef.dtype)
        ef_s = ef * mask
        eb_prev = jnp.roll(eb, 1, axis=1) * mask  # eb[t-1] aligned to t
        num = -2.0 * jnp.sum(ef_s * eb_prev, axis=1)
        den = jnp.sum(ef_s * ef_s, axis=1) + jnp.sum(eb_prev * eb_prev, axis=1)
        k = num / jnp.maximum(den, 1e-30)
        ef_new = ef + k[:, None] * jnp.roll(eb, 1, axis=1)
        eb_new = jnp.roll(eb, 1, axis=1) + k[:, None] * ef
        # Levinson update: a_new[j] = a[j] + k·a[m−1−j] for j<m; a_new[m] = k.
        ks = jnp.arange(order)
        prev_mask = (ks < m).astype(a.dtype)
        take = jnp.where(ks < m, m - 1 - ks, 0)
        a_flip = jnp.take_along_axis(a, jnp.broadcast_to(take[None, :], a.shape), axis=1)
        a_new = a + k[:, None] * a_flip * prev_mask[None, :]
        a_new = a_new.at[:, m].set(k)
        return ef_new, eb_new, a_new

    ef, eb, a = jax.lax.fori_loop(0, order, body, (ef, eb, a))
    return a


@partial(jax.jit, static_argnums=(1,))
def durand_kerner_roots(coeffs: jnp.ndarray, iters: int = 60):
    """Batched roots of monic polynomials z^m + c1 z^(m-1) + ... + cm.

    coeffs: (N, m) in descending power order (excluding the leading 1).
    Returns (real, imag) float arrays of shape (N, m) — the roots found by
    Durand–Kerner iteration with ring initialization.
    """
    n, m = coeffs.shape
    c = coeffs.astype(jnp.complex64)

    # initial guesses on a ring (distinct angles, radius from coeff norm)
    angles = 2.0 * np.pi * (np.arange(m) + 0.35) / m
    radius = 0.9
    z0 = jnp.asarray(radius * np.exp(1j * angles), jnp.complex64)
    z = jnp.broadcast_to(z0[None, :], (n, m))

    full = jnp.concatenate([jnp.ones((n, 1), jnp.complex64), c], axis=1)  # (N, m+1)

    def poly_eval(z):
        # Horner over coefficients, batched: p(z) for each root guess.
        def horner(acc, coef):
            return acc * z + coef[:, None], None
        acc = jnp.zeros_like(z)
        acc, _ = jax.lax.scan(horner, acc, jnp.swapaxes(full, 0, 1))
        return acc

    def step(z, _):
        p = poly_eval(z)
        diff = z[:, :, None] - z[:, None, :]  # (N, m, m)
        eye = jnp.eye(m, dtype=bool)[None]
        denom = jnp.prod(jnp.where(eye, 1.0 + 0j, diff), axis=2)
        z_new = z - p / jnp.where(jnp.abs(denom) < 1e-20, 1e-20 + 0j, denom)
        return z_new, None

    z, _ = jax.lax.scan(step, z, None, length=iters)
    # Return (real, imag) float pairs: some TPU backends cannot transfer
    # complex arrays back to the host, and complex stays internal anyway.
    return jnp.real(z), jnp.imag(z)


class FormantTrack(NamedTuple):
    times: np.ndarray  # (N,)
    freqs: np.ndarray  # (N, n_formants) Hz, NaN where absent
    bands: np.ndarray  # (N, n_formants) Hz bandwidths, NaN where absent

    def _interp(self, grid: np.ndarray, t) -> np.ndarray:
        t = np.atleast_1d(np.asarray(t, dtype=np.float64))
        dt = self.times[1] - self.times[0] if len(self.times) > 1 else 1.0
        pos = (t - self.times[0]) / dt
        i0 = np.clip(np.floor(pos).astype(int), 0, len(self.times) - 1)
        i1 = np.clip(i0 + 1, 0, len(self.times) - 1)
        w = np.clip(pos - i0, 0.0, 1.0)[:, None]
        vals = (1 - w) * grid[i0] + w * grid[i1]
        out = (t < self.times[0] - dt / 2) | (t > self.times[-1] + dt / 2)
        vals[out] = np.nan
        return vals

    def value_at(self, formant_number: int, t) -> np.ndarray:
        v = self._interp(self.freqs, t)[:, formant_number - 1]
        return v if v.shape != (1,) else float(v[0])

    def bandwidth_at(self, formant_number: int, t) -> np.ndarray:
        v = self._interp(self.bands, t)[:, formant_number - 1]
        return v if v.shape != (1,) else float(v[0])


def formant_track_burg(
    x: np.ndarray,
    sr: float,
    time_step: float = 0.005,
    max_formants: float = 5.0,
    max_formant_hz: float = 5000.0,
    window_length: float = 0.025,
    preemphasis_from: float = 50.0,
) -> FormantTrack:
    """Full Burg formant pass; arguments mirror the Praat command order used
    at src/mshds_extractor.py:319."""
    from ..audio.resample import resample_poly_np

    x = np.asarray(x, dtype=np.float64).reshape(-1)
    target_sr = 2.0 * max_formant_hz
    if sr != target_sr:
        g = math.gcd(int(round(target_sr)), int(round(sr)))
        x = resample_poly_np(x, int(round(target_sr)) // g, int(round(sr)) // g)
        sr = target_sr
    dx = 1.0 / sr
    pre = math.exp(-2.0 * math.pi * preemphasis_from * dx)
    x = np.concatenate([[x[0] * (1 - pre)], x[1:] - pre * x[:-1]])

    phys_window = 2.0 * window_length  # Praat: Gaussian window twice as long
    n_frames, t0 = praat_frame_grid(len(x), sr, phys_window, time_step)
    if n_frames < 1:
        empty = np.zeros((0, int(max_formants)))
        return FormantTrack(np.zeros(0), empty, empty)
    win_len = int(round(phys_window * sr))
    k = np.arange(win_len) - (win_len - 1) / 2
    # Praat's Gaussian-like analysis window
    window = (np.exp(-48.0 * (k / win_len) ** 2) - math.exp(-12.0)) / (
        1.0 - math.exp(-12.0)
    )
    centers = t0 + np.arange(n_frames) * time_step
    starts = np.clip(
        np.round(centers * sr - win_len / 2).astype(int), 0, max(len(x) - win_len, 0)
    )
    from .bucketing import pad_frames

    frames, _ = pad_frames(x[starts[:, None] + np.arange(win_len)[None, :]] * window)

    order = int(2 * max_formants)
    a = burg_coeffs(jnp.asarray(frames), order)
    roots_re, roots_im = durand_kerner_roots(a)
    roots_re = np.asarray(roots_re)[:n_frames]
    roots_im = np.asarray(roots_im)[:n_frames]

    out_f, out_b = _roots_to_formants(
        roots_re, roots_im, sr, max_formant_hz, int(max_formants)
    )
    return FormantTrack(centers, out_f, out_b)


def _roots_to_formants(
    roots_re: np.ndarray,
    roots_im: np.ndarray,
    sr: float,
    max_formant_hz: float,
    n_keep: int,
):
    """Vectorized root → (formant frequency, bandwidth) conversion: valid
    upper-half-plane roots inside (50 Hz, max−50 Hz), sorted ascending per
    frame, first ``n_keep`` kept, NaN elsewhere."""
    freq = np.abs(np.arctan2(roots_im, roots_re)) * sr / (2 * np.pi)
    mag_r = np.hypot(roots_re, roots_im)
    bw = -np.log(np.maximum(mag_r, 1e-12)) * sr / np.pi
    valid = (freq > 50.0) & (freq < max_formant_hz - 50.0) & (roots_im > 0)

    f_key = np.where(valid, freq, np.inf)
    order = np.argsort(f_key, axis=1, kind="stable")
    f_sorted = np.take_along_axis(f_key, order, axis=1)[:, :n_keep]
    b_sorted = np.take_along_axis(
        np.where(valid, bw, np.nan), order, axis=1
    )[:, :n_keep]
    out_f = np.where(np.isfinite(f_sorted), f_sorted, np.nan)
    out_b = np.where(np.isfinite(f_sorted), b_sorted, np.nan)
    return out_f, out_b


@partial(jax.jit, static_argnums=(3, 4))
def _gathered_burg_roots(x_cat, starts, window, win_len: int, order: int):
    """Device-side framing + windowing + Burg + Durand–Kerner over gathered
    frames of the concatenated (resampled, preemphasized) corpus buffer."""
    from .framing import gather_frames

    frames = gather_frames(x_cat, starts, win_len) * window[None, :]
    a = burg_coeffs(frames, order)
    re, im = durand_kerner_roots(a)
    return jnp.stack([re, im])


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _gathered_burg_formants(
    x_cat, starts, window, win_len: int, order: int,
    sr: float, max_formant_hz: float, n_keep: int,
):
    """:func:`_gathered_burg_roots` + the root→(freq, bandwidth) conversion
    fused on device (same math as :func:`_roots_to_formants`, f32 on the
    already-f32 roots), so the level transfer carries (2, frames, n_keep)
    instead of the full (2, frames, order) root stack — half the bytes on
    the tunnel."""
    re, im = _gathered_burg_roots(x_cat, starts, window, win_len, order)
    freq = jnp.abs(jnp.arctan2(im, re)) * sr / (2 * jnp.pi)
    mag_r = jnp.hypot(re, im)
    bw = -jnp.log(jnp.maximum(mag_r, 1e-12)) * sr / jnp.pi
    valid = (freq > 50.0) & (freq < max_formant_hz - 50.0) & (im > 0)
    f_key = jnp.where(valid, freq, jnp.inf)
    idx = jnp.argsort(f_key, axis=1, stable=True)
    f_sorted = jnp.take_along_axis(f_key, idx, axis=1)[:, :n_keep]
    b_sorted = jnp.take_along_axis(
        jnp.where(valid, bw, jnp.nan), idx, axis=1
    )[:, :n_keep]
    out_f = jnp.where(jnp.isfinite(f_sorted), f_sorted, jnp.nan)
    out_b = jnp.where(jnp.isfinite(f_sorted), b_sorted, jnp.nan)
    return jnp.stack([out_f, out_b]).astype(jnp.float32)


def formant_track_burg_batch(
    xs,
    sr: float,
    time_step: float = 0.005,
    max_formants: float = 5.0,
    max_formant_hz: float = 5000.0,
    window_length: float = 0.025,
    preemphasis_from: float = 50.0,
    preprocessed: bool = False,
    buf=None,
    defer: bool = False,
) -> "list[FormantTrack]":
    """Corpus-batched :func:`formant_track_burg`: every file's analysis
    frames go through ONE Burg + root-finding device program (same
    device-gather design as ops.pitch.pitch_track_batch), with a single
    device→host transfer of the root stack.

    ``preprocessed=True`` means ``xs`` are already at 2·max_formant_hz and
    preemphasized (the MSHDS pipeline shares that buffer with the
    cepstrogram pass).
    """
    from ..audio.resample import resample_poly_np
    from .bucketing import pad_frames

    target_sr = 2.0 * max_formant_hz
    if buf is not None:
        prepped = buf.xs  # must already be at target_sr + preemphasized
    else:
        prepped = []
        for x in xs:
            x = np.asarray(x, dtype=np.float64).reshape(-1)
            if not preprocessed:
                if sr != target_sr:
                    g = math.gcd(int(round(target_sr)), int(round(sr)))
                    x = resample_poly_np(
                        x, int(round(target_sr)) // g, int(round(sr)) // g
                    )
                if len(x):
                    pre = math.exp(-2.0 * math.pi * preemphasis_from / target_sr)
                    x = np.concatenate([[x[0] * (1 - pre)], x[1:] - pre * x[:-1]])
            prepped.append(x)
    sr = target_sr

    phys_window = 2.0 * window_length
    win_len = int(round(phys_window * sr))
    if buf is not None and win_len > buf.pad:
        raise ValueError(f"corpus buffer pad {buf.pad} < window {win_len}")
    k = np.arange(win_len) - (win_len - 1) / 2
    window = (np.exp(-48.0 * (k / win_len) ** 2) - math.exp(-12.0)) / (
        1.0 - math.exp(-12.0)
    )

    metas, start_blocks, pieces = [], [], []
    offset = 0
    for fi, x in enumerate(prepped):
        n_frames, t0 = praat_frame_grid(len(x), sr, phys_window, time_step)
        centers = t0 + np.arange(max(n_frames, 0)) * time_step
        metas.append((n_frames, centers))
        if n_frames < 1:
            continue
        if buf is None:
            base = offset
            pieces.append(np.pad(x, (0, win_len)).astype(np.float32))
            offset += len(x) + win_len
        else:
            base = int(buf.offsets[fi])
        starts = np.clip(
            np.round(centers * sr - win_len / 2).astype(int),
            0, max(len(x) - win_len, 0),
        )
        start_blocks.append(starts + base)

    from .framing import Deferred

    n_keep = int(max_formants)
    if not start_blocks:
        empty = [
            FormantTrack(m[1], np.full((max(m[0], 0), n_keep), np.nan),
                         np.full((max(m[0], 0), n_keep), np.nan))
            for m in metas
        ]
        return Deferred.ready(empty) if defer else empty

    x_cat = buf.x_cat if buf is not None else jnp.asarray(np.concatenate(pieces))
    all_starts = np.concatenate(start_blocks).astype(np.int32)
    starts_padded, _ = pad_frames(all_starts[:, None])
    fb_dev = _gathered_burg_formants(
        x_cat, jnp.asarray(starts_padded[:, 0]), jnp.asarray(window, jnp.float32),
        win_len, int(2 * max_formants), float(sr), float(max_formant_hz),
        n_keep,
    )

    def _finalize(fb):
        fb = np.asarray(fb, np.float64)
        out = []
        cursor = 0
        for n_frames, centers in metas:
            if n_frames < 1:
                out.append(FormantTrack(
                    centers, np.full((0, n_keep), np.nan),
                    np.full((0, n_keep), np.nan)
                ))
                continue
            f = fb[0, cursor : cursor + n_frames]
            b = fb[1, cursor : cursor + n_frames]
            cursor += n_frames
            out.append(FormantTrack(centers, f, b))
        return out

    d = Deferred(fb_dev, _finalize)
    return d if defer else d.result()
