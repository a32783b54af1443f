"""Power cepstrogram and cepstral peak prominence (CPPS).

Replaces the Praat path of the reference's CPP feature
(src/mshds_extractor.py:286-298: ``To PowerCepstrogram: 60, 0.002, 5000,
50`` then ``Get CPPS`` with peak search 60-330 Hz, straight robust trend):

* resample to 2×max_frequency, optional preemphasis from 50 Hz;
* Gaussian windows of 2/pitch_floor seconds every ``time_step``;
* per frame: power spectrum → dB → power cepstrum
  ``|FFT(log-power-spectrum)|²`` expressed in dB;
* CPPS per frame: highest cepstral peak (parabolic) inside the quefrency
  band [1/f_max, 1/f_min], minus a robust (iteratively reweighted) straight
  line fit of cepstrum-dB over quefrency; averaged over frames.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pitch import praat_frame_grid


class PowerCepstrogram(NamedTuple):
    times: np.ndarray  # (N,)
    quefrencies: np.ndarray  # (Q,) seconds
    cepstrum_db: np.ndarray  # (N, Q)


@partial(jax.jit, static_argnums=(1,))
def _cepstrum_frames(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    from .dft import power_of_real_dft, rfft_power

    power = rfft_power(frames, n_fft)
    log_power = jnp.log10(jnp.maximum(power, 1e-30))
    return power_of_real_dft(log_power, n_fft)


def power_cepstrogram(
    x: np.ndarray,
    sr: float,
    pitch_floor: float = 60.0,
    time_step: float = 0.002,
    max_frequency: float = 5000.0,
    preemphasis_from: float = 50.0,
) -> PowerCepstrogram:
    x, sr = cepstrum_preprocess(x, sr, max_frequency, preemphasis_from)

    window_s = 2.0 / pitch_floor
    n_frames, t0 = praat_frame_grid(len(x), sr, window_s, time_step)
    if n_frames < 1:
        return PowerCepstrogram(np.zeros(0), np.zeros(0), np.zeros((0, 0)))
    win_len = int(round(window_s * sr))
    k = np.arange(win_len) - (win_len - 1) / 2
    window = np.exp(-0.5 * (6.0 * k / win_len) ** 2)  # Gaussian, σ = L/6
    centers = t0 + np.arange(n_frames) * time_step
    starts = np.clip(
        np.round(centers * sr - win_len / 2).astype(int), 0, max(len(x) - win_len, 0)
    )
    from .bucketing import pad_frames

    frames, _ = pad_frames(x[starts[:, None] + np.arange(win_len)[None, :]] * window)
    n_fft = 1 << int(np.ceil(np.log2(win_len)))
    ceps_pow = np.asarray(_cepstrum_frames(jnp.asarray(frames), n_fft))[:n_frames]
    # Quefrency axis: the log-power spectrum (n_fft//2+1 samples at
    # Δf = sr/n_fft) is zero-padded back to n_fft before its rfft, so bin q
    # sits at quefrency q/(n_fft·Δf) = q/sr exactly.
    dq = 1.0 / sr
    quefrency = np.arange(ceps_pow.shape[1]) * dq
    ceps_db = 10.0 * np.log10(np.maximum(ceps_pow, 1e-30))
    return PowerCepstrogram(centers, quefrency, ceps_db)


def cepstrum_preprocess(
    x: np.ndarray,
    sr: float,
    max_frequency: float = 5000.0,
    preemphasis_from: float = 50.0,
) -> Tuple[np.ndarray, float]:
    """Host-side shared preprocessing for the cepstrogram/formant passes:
    resample the whole file to 2·max_frequency and preemphasize from 50 Hz.
    Returns (x_preprocessed, new_sr)."""
    from ..audio.resample import resample_poly_np

    x = np.asarray(x, dtype=np.float64).reshape(-1)
    target_sr = 2.0 * max_frequency
    if sr != target_sr:
        g = math.gcd(int(round(target_sr)), int(round(sr)))
        x = resample_poly_np(x, int(round(target_sr)) // g, int(round(sr)) // g)
    if preemphasis_from > 0 and len(x):
        pre = math.exp(-2.0 * math.pi * preemphasis_from / target_sr)
        x = np.concatenate([[x[0] * (1 - pre)], x[1:] - pre * x[:-1]])
    return x, target_sr


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _gathered_cpps_prominence(
    x_cat, starts, window,
    win_len: int, n_fft: int, dq: float,
    trend_lo: int, trend_hi: int, band_lo: int, band_hi: int,
):
    """Device-side CPPS core over gathered cepstrogram frames: power
    cepstrum → dB → robust (Tukey-reweighted, 5-iteration) straight-line
    trend over quefrency [trend_lo, trend_hi) → parabolic band peak in
    [band_lo, band_hi) → per-frame prominence. Only the (N,) prominence
    vector returns to the host."""
    from .framing import gather_frames

    frames = gather_frames(x_cat, starts, win_len) * window[None, :]
    ceps_pow = _cepstrum_frames(frames, n_fft)
    v = 10.0 * jnp.log10(jnp.maximum(ceps_pow, 1e-30))
    n, Q = v.shape
    qs = jnp.arange(Q, dtype=jnp.float32) * dq

    qt = qs[trend_lo:trend_hi]
    vt = v[:, trend_lo:trend_hi]
    w = jnp.ones_like(vt)
    slope = jnp.zeros(n, v.dtype)
    inter = jnp.zeros(n, v.dtype)
    for _ in range(5):
        sw = w.sum(axis=1)
        sq = (w * qt[None, :]).sum(axis=1)
        sv = (w * vt).sum(axis=1)
        sqq = (w * qt[None, :] ** 2).sum(axis=1)
        sqv = (w * qt[None, :] * vt).sum(axis=1)
        denom = jnp.maximum(sw * sqq - sq**2, 1e-30)
        slope = (sw * sqv - sq * sv) / denom
        inter = (sv - slope * sq) / sw
        resid = vt - (slope[:, None] * qt[None, :] + inter[:, None])
        mad = jnp.median(jnp.abs(resid), axis=1, keepdims=True)
        c = 4.685 * jnp.maximum(mad, 1e-12) / 0.6745
        u = resid / c
        w = jnp.where(jnp.abs(u) < 1.0, (1 - u**2) ** 2, 0.0)
        w = jnp.maximum(w, 1e-6)

    vb = v[:, band_lo:band_hi]
    rel = jnp.argmax(vb, axis=1)
    idxp = rel + band_lo
    rows = jnp.arange(n)
    peak = v[rows, idxp]
    il = jnp.clip(idxp - 1, 0, Q - 1)
    ir = jnp.clip(idxp + 1, 0, Q - 1)
    dl = peak - v[rows, il]
    dr = peak - v[rows, ir]
    denom = dl + dr
    ok = denom > 0
    peak_ref = peak + jnp.where(
        ok, 0.125 * (dl - dr) ** 2 / jnp.maximum(denom, 1e-12), 0.0
    )
    q_peak = qs[idxp] + jnp.where(
        ok, 0.5 * (dl - dr) / jnp.maximum(denom, 1e-12), 0.0
    ) * dq
    return peak_ref - (slope * q_peak + inter)


def cpps_segments_batch(
    items,  # list of (x_preprocessed, [(a_sec, b_sec), ...]) per file
    sr: float,
    pitch_floor: float = 60.0,
    time_step: float = 0.002,
    pitch_min: float = 60.0,
    pitch_max: float = 330.0,
    keep_above: float = 4.0,
    trend_q_start: float = 0.001,
    buf=None,
    defer: bool = False,
) -> "list[float]":
    """Corpus-batched per-voiced-segment CPPS (reference behavior,
    src/mshds_extractor.py:277-298): every voiced segment of every file is
    framed on the Praat grid, ALL frames go through one device program
    (:func:`_gathered_cpps_prominence`), and each file's feature is the mean
    of its per-segment mean prominences that exceed ``keep_above``.

    ``items`` waveforms must already be preprocessed via
    :func:`cepstrum_preprocess` (resampled to 2·max_frequency,
    preemphasized)."""
    from ..ops.bucketing import pad_frames
    from .pitch import praat_frame_grid

    window_s = 2.0 / pitch_floor
    win_len = int(round(window_s * sr))
    k = np.arange(win_len) - (win_len - 1) / 2
    window = np.exp(-0.5 * (6.0 * k / win_len) ** 2)
    n_fft = 1 << int(np.ceil(np.log2(win_len)))
    Q = n_fft // 2 + 1
    dq = 1.0 / sr
    qs = np.arange(Q) * dq
    q_lo, q_hi = 1.0 / pitch_max, 1.0 / pitch_min
    band_idx = np.flatnonzero((qs >= q_lo) & (qs <= q_hi))
    trend_idx = np.flatnonzero(qs >= trend_q_start)
    if band_idx.size == 0 or trend_idx.size == 0:
        return [float("nan")] * len(items)
    band_lo, band_hi = int(band_idx[0]), int(band_idx[-1]) + 1
    trend_lo, trend_hi = int(trend_idx[0]), int(trend_idx[-1]) + 1

    if buf is not None and win_len > buf.pad:
        raise ValueError(f"corpus buffer pad {buf.pad} < window {win_len}")
    seg_meta = []  # (file_idx, n_frames)
    start_blocks, pieces = [], []
    offset = 0
    for fi, (x, segments) in enumerate(items):
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        piece = None
        for (a, b) in segments:
            # clamp into the waveform: segments can outlive a file whose
            # preprocessing degraded it (e.g. a zero-length fallback) and
            # would otherwise gather frames from the NEXT file's region of
            # the shared corpus buffer
            sa = min(int(a * sr), len(x))
            sb = min(int(b * sr), len(x))
            seg_len = max(sb - sa, 0)
            n_frames, t0 = praat_frame_grid(seg_len, sr, window_s, time_step)
            if n_frames < 1:
                continue
            if buf is not None:
                file_offset = int(buf.offsets[fi])
            elif piece is None:
                piece = np.pad(x, (0, win_len)).astype(np.float32)
                pieces.append(piece)
                file_offset = offset
                offset += len(piece)
            centers = t0 + np.arange(n_frames) * time_step
            starts = np.clip(
                np.round(centers * sr - win_len / 2).astype(int),
                0, max(seg_len - win_len, 0),
            )
            start_blocks.append(starts + sa + file_offset)
            seg_meta.append((fi, n_frames))

    from .framing import Deferred

    n_items = len(items)
    if not start_blocks:
        empty = [float("nan")] * n_items
        return Deferred.ready(empty) if defer else empty

    x_cat = buf.x_cat if buf is not None else jnp.asarray(np.concatenate(pieces))
    all_starts = np.concatenate(start_blocks).astype(np.int32)
    starts_padded, _ = pad_frames(all_starts[:, None])
    prom_dev = _gathered_cpps_prominence(
        x_cat, jnp.asarray(starts_padded[:, 0]),
        jnp.asarray(window, jnp.float32),
        win_len, n_fft, dq, trend_lo, trend_hi, band_lo, band_hi,
    )

    def _finalize(prom):
        prom = np.asarray(prom).astype(np.float64)
        per_file: "list[list[float]]" = [[] for _ in range(n_items)]
        cursor = 0
        for fi, n_frames in seg_meta:
            seg_mean = float(np.mean(prom[cursor : cursor + n_frames]))
            cursor += n_frames
            if np.isfinite(seg_mean) and seg_mean > keep_above:
                per_file[fi].append(seg_mean)
        return [
            float(np.mean(vals)) if vals else float("nan") for vals in per_file
        ]

    d = Deferred(prom_dev, _finalize)
    return d if defer else d.result()


def _robust_line_fit(
    q: np.ndarray, v: np.ndarray, iters: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame straight-line fit of v over q with Tukey-style reweighting.

    q: (Q,), v: (N, Q) → (slope (N,), intercept (N,)).
    """
    n, Q = v.shape
    w = np.ones_like(v)
    slope = np.zeros(n)
    inter = np.zeros(n)
    for _ in range(iters):
        sw = w.sum(axis=1)
        sq = (w * q[None, :]).sum(axis=1)
        sv = (w * v).sum(axis=1)
        sqq = (w * q[None, :] ** 2).sum(axis=1)
        sqv = (w * q[None, :] * v).sum(axis=1)
        denom = np.maximum(sw * sqq - sq**2, 1e-30)
        slope = (sw * sqv - sq * sv) / denom
        inter = (sv - slope * sq) / sw
        resid = v - (slope[:, None] * q[None, :] + inter[:, None])
        mad = np.median(np.abs(resid), axis=1, keepdims=True)
        c = 4.685 * np.maximum(mad, 1e-12) / 0.6745
        u = resid / c
        w = np.where(np.abs(u) < 1.0, (1 - u**2) ** 2, 0.0)
        w = np.maximum(w, 1e-6)
    return slope, inter


def cpps(
    cg: PowerCepstrogram,
    pitch_min: float = 60.0,
    pitch_max: float = 330.0,
    trend_q_start: float = 0.001,
    trend_q_end: float = 0.0,
) -> Tuple[float, np.ndarray]:
    """Mean cepstral peak prominence (smoothed) over frames.

    Returns (mean_cpps, per_frame_prominence). Trend fitted robustly over
    [trend_q_start, trend_q_end or max quefrency].
    """
    if len(cg.times) == 0:
        return float("nan"), np.zeros(0)
    q = cg.quefrencies
    v = cg.cepstrum_db
    q_lo, q_hi = 1.0 / pitch_max, 1.0 / pitch_min
    band = (q >= q_lo) & (q <= q_hi)
    if not band.any():
        return float("nan"), np.zeros(0)
    trend_end = trend_q_end if trend_q_end > 0 else q[-1]
    trend_mask = (q >= trend_q_start) & (q <= trend_end)
    slope, inter = _robust_line_fit(q[trend_mask], v[:, trend_mask])

    band_idx = np.flatnonzero(band)
    sub = v[:, band_idx]
    rel = sub.argmax(axis=1)
    idx = band_idx[rel]
    rows = np.arange(v.shape[0])
    peak = v[rows, idx]
    # parabolic peak refinement
    il = np.clip(idx - 1, 0, v.shape[1] - 1)
    ir = np.clip(idx + 1, 0, v.shape[1] - 1)
    dl = peak - v[rows, il]
    dr = peak - v[rows, ir]
    denom = dl + dr
    ok = denom > 0
    peak_ref = peak + np.where(ok, 0.125 * (dl - dr) ** 2 / np.maximum(denom, 1e-12), 0.0)
    q_peak = q[idx] + np.where(
        ok, 0.5 * (dl - dr) / np.maximum(denom, 1e-12), 0.0
    ) * (q[1] - q[0])
    trend_at_peak = slope * q_peak + inter
    prominence = peak_ref - trend_at_peak
    return float(np.mean(prominence)), prominence
