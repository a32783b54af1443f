"""Waveform-domain jitter, shimmer and log-HNR (openSMILE ``cPitchJitter``).

Implements the voice-quality LLDs of the Androids configuration
(Androids.conf:231-255): guided by the frame-level F0 contour, exact pitch
periods are located on the raw waveform by maximizing the normalized
cross-correlation of adjacent candidate periods within ±searchRangeRel
(0.25) of the expected length. Per output frame:

* jitterLocal — mean |T_i − T_{i−1}| / mean T over periods in the frame;
* jitterDDP — mean |(T_i−T_{i−1}) − (T_{i−1}−T_{i−2})| / mean T;
* shimmerLocal — mean |A_i − A_{i−1}| / mean A of per-period peak amplitudes;
* logHNR — log of the harmonic/noise energy ratio estimated from the
  waveform correlation ρ of adjacent periods: ln(ρ/(1−ρ)).

Unvoiced frames emit 0 (``onlyVoiced=0`` keeps them in the output stream).
Period marching is sequential by nature and runs host-side in NumPy; the
arrays it consumes (F0 contour) come from the batched SHS chain.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np


class PeriodTrack(NamedTuple):
    starts: np.ndarray  # (P,) sample index of each period start
    lengths: np.ndarray  # (P,) samples
    amplitudes: np.ndarray  # (P,) peak absolute amplitude within the period
    correlations: np.ndarray  # (P,) correlation with the previous period


def mark_periods(
    x: np.ndarray,
    sr: float,
    f0_frames: np.ndarray,
    hop_s: float = 0.010,
    search_range_rel: float = 0.25,
) -> PeriodTrack:
    """March period boundaries through voiced regions.

    For each voiced stretch of the frame-level F0 contour, successive period
    lengths are chosen to maximize the normalized cross-correlation between
    the current period and the next one, searched within
    (1 ± search_range_rel)·T_expected.
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    starts: List[int] = []
    lengths: List[int] = []
    amps: List[float] = []
    corrs: List[float] = []

    n_frames = len(f0_frames)
    frame_of = lambda s: int(s / sr / hop_s)

    pos = 0
    n = len(x)
    while pos < n - 16:
        fi = min(frame_of(pos), n_frames - 1)
        f0 = f0_frames[fi]
        if f0 <= 0:
            pos += max(int(hop_s * sr) // 2, 1)
            continue
        t0 = sr / f0
        lo = max(int(t0 * (1 - search_range_rel)), 8)
        hi = int(t0 * (1 + search_range_rel)) + 1
        if pos + hi * 2 >= n:
            break
        # One vectorized normalized cross-correlation over the whole lag
        # band: template = one expected period, searched against the next.
        w0 = int(round(t0))
        a = x[pos : pos + w0]
        seg = x[pos + lo : pos + hi + w0]
        corr = np.correlate(seg, a, mode="valid")  # corr[j] ↔ lag lo+j
        sq = np.concatenate([[0.0], np.cumsum(seg * seg)])
        e_b = sq[w0:] - sq[: len(sq) - w0]
        e_b = e_b[: len(corr)]
        e_a = float(np.dot(a, a))
        denom = np.sqrt(np.maximum(e_a * e_b, 1e-30))
        ncc = np.where(denom > 0, corr / denom, -2.0)
        j = int(np.argmax(ncc))
        best_corr = float(ncc[j])
        best_len = lo + j
        starts.append(pos)
        lengths.append(best_len)
        amps.append(float(np.max(np.abs(x[pos : pos + best_len]))))
        corrs.append(best_corr)
        pos += best_len

    return PeriodTrack(
        np.asarray(starts, dtype=np.int64),
        np.asarray(lengths, dtype=np.int64),
        np.asarray(amps),
        np.asarray(corrs),
    )


def jitter_shimmer_llds(
    x: np.ndarray,
    sr: float,
    f0_frames: np.ndarray,
    hop_s: float = 0.010,
    frame_s: float = 0.025,
    search_range_rel: float = 0.25,
) -> np.ndarray:
    """Frame-level [jitterLocal, jitterDDP, shimmerLocal, logHNR] (T, 4)."""
    periods = mark_periods(x, sr, f0_frames, hop_s, search_range_rel)
    n_frames = len(f0_frames)
    out = np.zeros((n_frames, 4))
    if len(periods.starts) < 3:
        return out

    centers = (periods.starts + periods.lengths / 2) / sr
    T = periods.lengths.astype(np.float64) / sr
    A = periods.amplitudes
    dT = np.abs(np.diff(T))
    ddT = np.abs(np.diff(T, n=2))
    dA = np.abs(np.diff(A))
    rho = np.clip(periods.correlations, 0.0, 0.999999)

    frame_len = frame_s
    for t_idx in range(n_frames):
        t_c = t_idx * hop_s + frame_len / 2
        in_frame = np.abs(centers - t_c) <= frame_len / 2
        idx = np.flatnonzero(in_frame)
        if len(idx) < 2 or f0_frames[t_idx] <= 0:
            continue
        mean_t = T[idx].mean()
        mean_a = max(A[idx].mean(), 1e-12)
        i0, i1 = int(idx[0]), int(idx[-1])
        # consecutive-period differences wholly inside the frame
        if i1 > i0 and mean_t > 0:
            out[t_idx, 0] = dT[i0:i1].mean() / mean_t
            out[t_idx, 2] = dA[i0:i1].mean() / mean_a
        if i1 - 1 > i0 and mean_t > 0:
            out[t_idx, 1] = ddT[i0 : i1 - 1].mean() / mean_t
        r = float(np.mean(rho[idx]))
        if r > 0:
            out[t_idx, 3] = np.log(r / max(1.0 - r, 1e-9))
    return out
