"""Power cepstrogram and cepstral peak prominence (CPPS).

Replaces the Praat path of the reference's CPP feature
(src/mshds_extractor.py:286-298: ``To PowerCepstrogram: 60, 0.002, 5000,
50`` then ``Get CPPS`` with peak search 60-330 Hz, straight robust trend):

* resample to 2×max_frequency, optional preemphasis from 50 Hz;
* Gaussian windows of 2/pitch_floor seconds every ``time_step``;
* per frame: power spectrum → ln power → power cepstrum = the SQUARE of the
  symmetric real inverse DFT (Praat Spectrum_to_PowerCepstrum: the log
  spectrum is Hermitian, so its inverse transform is real — an
  ``|FFT(·)|²`` construction would add a spurious quefrency-dependent Im²
  term of several dB);
* cepstrogram smoothing in the POWER domain, time (0.01 s) then quefrency
  (0.001 s), with a truncated Gaussian kernel (Praat ≥6.0.37 smooths with a
  Gaussian; exact kernel shape pending a parselmouth oracle — see
  PARITY.md);
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
    """Power cepstrum of each frame: (real symmetric IDFT of ln|X|²)².

    Praat's Spectrum_to_PowerCepstrum takes the log power spectrum (real,
    imaginary part zeroed) back through Spectrum_to_Sound — a Hermitian-
    symmetric inverse transform whose output is real — and squares it. The
    inverse-of-symmetric-spectrum is exactly the autocorrelation basis
    (cos-basis GEMM on TPU / irfft elsewhere). Global scale factors (ln vs
    log10, 1/n_fft) shift every frame's dB by a constant and cancel in the
    peak-minus-trend prominence.
    """
    from .dft import autocorr_via_power, rfft_power

    power = rfft_power(frames, n_fft)
    log_power = jnp.log(jnp.maximum(power, 1e-30))
    c = autocorr_via_power(log_power, n_fft, n_fft // 2 + 1)
    return c * c


def _gauss_kernel(n_window: int) -> np.ndarray:
    """Truncated Gaussian over offsets [-n//2, n//2], σ = n/4."""
    half = n_window // 2
    k = np.arange(-half, half + 1, dtype=np.float64)
    sigma = max(n_window / 4.0, 1e-6)
    return np.exp(-0.5 * (k / sigma) ** 2)


def _smooth_cepstrogram_power(
    power: np.ndarray, n_t: int, n_q: int
) -> np.ndarray:
    """Host twin of the device smoothing: POWER-domain moving Gaussian
    average over time then quefrency, edge-renormalized."""
    out = np.asarray(power, np.float64)
    for axis, n_win in ((0, n_t), (1, n_q)):
        if n_win <= 1 or out.shape[axis] == 0:
            continue
        w = _gauss_kernel(n_win)
        half = len(w) // 2
        acc = np.zeros_like(out)
        den = np.zeros_like(out)
        for off, wk in zip(range(-half, half + 1), w):
            sl = np.roll(out, off, axis=axis)
            valid = np.ones(out.shape[axis], bool)
            if off > 0:
                valid[:off] = False
            elif off < 0:
                valid[off:] = False
            shape = [1, 1]
            shape[axis] = -1
            m = valid.reshape(shape)
            acc += wk * sl * m
            den += wk * m
        out = acc / np.maximum(den, 1e-30)
    return out


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


def _shift_rows(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift along axis 0 by k (row i reads a[i-k]), zero-filled — NOT a
    roll: wraparound would let a segment's tail smooth into its own head."""
    if k == 0:
        return a
    pad = jnp.zeros((abs(k),) + a.shape[1:], a.dtype)
    if k > 0:
        return jnp.concatenate([pad, a[:-k]], axis=0)
    return jnp.concatenate([a[-k:], pad], axis=0)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _gathered_cpps_prominence(
    x_cat, starts, window, seg_ids,
    win_len: int, n_fft: int, dq: float,
    trend_lo: int, trend_hi: int, band_lo: int, band_hi: int,
    n_t_smooth: int = 5, n_q_smooth: int = 10,
):
    """Device-side CPPS core over gathered cepstrogram frames: power
    cepstrum → segment-aware Gaussian smoothing (time then quefrency, in
    POWER) → dB → robust (Tukey-reweighted, 5-iteration) straight-line
    trend over quefrency [trend_lo, trend_hi) → parabolic band peak in
    [band_lo, band_hi) → per-frame prominence. ``seg_ids`` (N,) keeps the
    time smoothing from mixing frames of different voiced segments packed
    into one gathered batch. Only the (N,) prominence vector returns to the
    host."""
    from .framing import gather_frames

    frames = gather_frames(x_cat, starts, win_len) * window[None, :]
    ceps_pow = _cepstrum_frames(frames, n_fft)

    if n_t_smooth > 1:
        w = _gauss_kernel(n_t_smooth)
        half = len(w) // 2
        acc = jnp.zeros_like(ceps_pow)
        den = jnp.zeros((ceps_pow.shape[0], 1), ceps_pow.dtype)
        for off, wk in zip(range(-half, half + 1), w):
            same = (_shift_rows(seg_ids, off) == seg_ids) & (seg_ids >= 0)
            m = same[:, None].astype(ceps_pow.dtype)
            acc = acc + wk * _shift_rows(ceps_pow, off) * m
            den = den + wk * m
        ceps_pow = acc / jnp.maximum(den, 1e-30)
    if n_q_smooth > 1:
        w = _gauss_kernel(n_q_smooth)
        half = len(w) // 2
        q_dim = ceps_pow.shape[1]
        acc = jnp.zeros_like(ceps_pow)
        den = jnp.zeros((1, q_dim), ceps_pow.dtype)
        ones = jnp.ones((1, q_dim), ceps_pow.dtype)
        for off, wk in zip(range(-half, half + 1), w):
            sl = _shift_rows(ceps_pow.T, off).T
            mv = _shift_rows(ones.T, off).T
            acc = acc + wk * sl
            den = den + wk * mv
        ceps_pow = acc / jnp.maximum(den, 1e-30)

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
    seg_ids = np.concatenate([
        np.full(nf, si, np.int32) for si, (_, nf) in enumerate(seg_meta)
    ])
    starts_padded, _ = pad_frames(all_starts[:, None])
    ids_padded = np.full(starts_padded.shape[0], -1, np.int32)
    ids_padded[: len(seg_ids)] = seg_ids
    n_t_smooth = max(int(0.01 / time_step), 1)   # Get CPPS time window
    n_q_smooth = max(int(0.001 / dq), 1)         # quefrency window
    prom_dev = _gathered_cpps_prominence(
        x_cat, jnp.asarray(starts_padded[:, 0]),
        jnp.asarray(window, jnp.float32), jnp.asarray(ids_padded),
        win_len, n_fft, dq, trend_lo, trend_hi, band_lo, band_hi,
        n_t_smooth, n_q_smooth,
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
    # Get CPPS smooths the cepstrogram (time 0.01 s, quefrency 0.001 s, in
    # POWER) before measuring prominence; the cepstrogram stores dB.
    dt_frames = cg.times[1] - cg.times[0] if len(cg.times) > 1 else 0.002
    dq_bins = q[1] - q[0] if len(q) > 1 else 1e-4
    power = np.power(10.0, np.asarray(cg.cepstrum_db, np.float64) / 10.0)
    power = _smooth_cepstrogram_power(
        power, max(int(0.01 / dt_frames), 1), max(int(0.001 / dq_bins), 1)
    )
    v = 10.0 * np.log10(np.maximum(power, 1e-300))
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
