"""Harmonics-to-noise ratio (Praat ``Sound: To Harmonicity (cc)...``).

Replaces the Praat native path used for the HNR feature and for the
speechrate voice-quality probe (src/mshds_extractor.py:36,221-223). Boersma
(1993): per frame, the maximum r of the normalized forward cross-correlation
within the pitch band estimates the fraction of periodic energy; HNR(dB) =
10·log10(r/(1−r)). Frames whose local peak falls below
``silence_threshold × global peak`` (or with no positive correlation peak)
are undefined and excluded from summary statistics.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from .pitch import praat_frame_grid, _forward_crosscorr


class HarmonicityContour(NamedTuple):
    times: np.ndarray
    hnr_db: np.ndarray  # NaN where undefined

    def mean_db(self) -> float:
        v = self.hnr_db[np.isfinite(self.hnr_db)]
        return float(v.mean()) if v.size else float("nan")


def harmonicity_cc(
    x: np.ndarray,
    sr: float,
    time_step: float = 0.01,
    minimum_pitch: float = 75.0,
    silence_threshold: float = 0.1,
    periods_per_window: float = 4.5,
) -> HarmonicityContour:
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    window_s = periods_per_window / minimum_pitch
    n_frames, t0 = praat_frame_grid(len(x), sr, window_s, time_step)
    if n_frames < 1:
        return HarmonicityContour(np.zeros(0), np.zeros(0))

    win_len = int(round(window_s * sr))
    max_lag = int(math.ceil(sr / minimum_pitch)) + 2
    ext = win_len + max_lag
    centers = t0 + np.arange(n_frames) * time_step
    x_pad = np.pad(x, (0, max(ext - len(x), 0)))
    starts = np.clip(
        np.round(centers * sr - win_len / 2).astype(int), 0, max(len(x_pad) - ext, 0)
    )
    from .bucketing import pad_frames

    frames_np, _ = pad_frames(x_pad[starts[:, None] + np.arange(ext)[None, :]])
    r, local_peak = _forward_crosscorr(jnp.asarray(frames_np), win_len, max_lag)
    r = np.asarray(r)[:n_frames]
    local_peak = np.asarray(local_peak)[:n_frames]
    hnr = _hnr_from_r(r, local_peak, x, sr, minimum_pitch, silence_threshold, max_lag)
    return HarmonicityContour(centers, hnr)


def _hnr_from_r(r: np.ndarray, local_peak: np.ndarray, x: np.ndarray,
                sr: float, minimum_pitch: float, silence_threshold: float,
                max_lag: int) -> np.ndarray:
    """Shared contour math: correlation block → per-frame HNR dB (NaN where
    silent/unvoiced).

    The lag floor sr/(10·minimum_pitch) (an implicit 10·minimum_pitch Hz
    ceiling) is a deliberate substitute for Praat's full candidate +
    path-finder machinery inside To Harmonicity (cc): a raw argmax with
    Praat's Nyquist ceiling would latch onto formant-period correlation
    peaks (~1/700 s) that Praat's octave cost and Viterbi continuity reject.
    Voices with F0 above 10× the pitch floor underestimate HNR relative to
    Praat; calibration against constructed-SNR oracles is in
    tests/test_mshds.py."""
    lag_min = max(2, int(math.floor(sr / (minimum_pitch * 10))))
    band = r[:, lag_min : max_lag + 1]
    r_best = band.max(axis=1)
    idx = band.argmax(axis=1) + lag_min
    valid_idx = (idx > 0) & (idx < r.shape[1] - 1)
    il = np.clip(idx - 1, 0, r.shape[1] - 1)
    ir = np.clip(idx + 1, 0, r.shape[1] - 1)
    rows = np.arange(len(idx))
    dl = r[rows, idx] - r[rows, il]
    dr_ = r[rows, idx] - r[rows, ir]
    denom = dl + dr_
    bump = np.where(
        (denom > 0) & valid_idx, 0.125 * (dl - dr_) ** 2 / np.maximum(denom, 1e-12), 0.0
    )
    # saturated frames: r -> 1 must cap HNR at 90 dB. A <1 ceiling on
    # r_best is a no-op in f32 (0.999999999 rounds to 1.0f), so the cap
    # lives in the denominator floor: 10*log10(1/1e-9) = 90 dB.
    r_best = np.minimum(r_best + bump, 1.0)
    global_peak = np.max(np.abs(x - x.mean())) or 1e-30
    silent = local_peak < silence_threshold * global_peak
    undefined = silent | (r_best <= 0)
    return np.where(
        undefined, np.nan,
        10.0 * np.log10(np.maximum(r_best, 1e-12) / np.maximum(1.0 - r_best, 1e-9)),
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _gathered_hnr(
    x_cat, starts, global_peak,
    ext: int, win_len: int, max_lag: int, lag_min: int,
    silence_threshold: float,
):
    """Device-side HNR: gathered forward cross-correlation → band peak with
    parabolic refinement → 10·log10(r/(1−r)), NaN where silent/unvoiced.
    Only the (N,) HNR vector crosses back to the host."""
    from .framing import gather_frames

    r, local_peak = _forward_crosscorr(
        gather_frames(x_cat, starts, ext), win_len, max_lag
    )
    band = r[:, lag_min : max_lag + 1]
    r_best = band.max(axis=1)
    idx = band.argmax(axis=1) + lag_min
    valid_idx = (idx > 0) & (idx < r.shape[1] - 1)
    rows = jnp.arange(r.shape[0])
    il = jnp.clip(idx - 1, 0, r.shape[1] - 1)
    ir = jnp.clip(idx + 1, 0, r.shape[1] - 1)
    dl = r[rows, idx] - r[rows, il]
    dr_ = r[rows, idx] - r[rows, ir]
    denom = dl + dr_
    bump = jnp.where(
        (denom > 0) & valid_idx,
        0.125 * (dl - dr_) ** 2 / jnp.maximum(denom, 1e-12), 0.0,
    )
    # see _hnr_from_r: the 90 dB cap lives in the denominator floor (a <1
    # ceiling on r_best is a no-op in f32)
    r_best = jnp.minimum(r_best + bump, 1.0)
    silent = local_peak < silence_threshold * global_peak
    undefined = silent | (r_best <= 0)
    return jnp.where(
        undefined, jnp.nan,
        10.0 * jnp.log10(
            jnp.maximum(r_best, 1e-12) / jnp.maximum(1.0 - r_best, 1e-9)
        ),
    )


def harmonicity_cc_batch(
    xs,
    sr: float,
    time_step: float = 0.01,
    minimum_pitch: float = 75.0,
    silence_threshold: float = 0.1,
    periods_per_window: float = 4.5,
    buf=None,
    indices=None,
    defer: bool = False,
) -> "list[HarmonicityContour]":
    """Batched :func:`harmonicity_cc` (device-gathered frames, one core call
    over every file's frames — same design as ops.pitch.pitch_track_batch).
    The band-peak → HNR math runs on device (:func:`_gathered_hnr`) so only
    (N_total,) floats transfer back. ``defer=True`` →
    ``ops.framing.Deferred``."""
    from .bucketing import pad_frames
    from .framing import Deferred

    window_s = periods_per_window / minimum_pitch
    win_len = int(round(window_s * sr))
    max_lag = int(math.ceil(sr / minimum_pitch)) + 2
    ext = win_len + max_lag

    if buf is not None:
        idxs = list(indices) if indices is not None else list(range(len(buf.xs)))
        xs = [buf.xs[i] for i in idxs]
        if ext > buf.pad:
            raise ValueError(f"corpus buffer pad {buf.pad} < required ext {ext}")
    else:
        idxs = None

    metas, start_blocks, pieces, gp_blocks = [], [], [], []
    offset = 0
    for k, x in enumerate(xs):
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        n_frames, t0 = praat_frame_grid(len(x), sr, window_s, time_step)
        centers = t0 + np.arange(n_frames) * time_step
        metas.append((n_frames, centers))
        if n_frames < 1:
            continue
        if buf is None:
            base = offset
            pieces.append(np.pad(x, (0, ext)).astype(np.float32))
            offset += len(x) + ext
        else:
            base = int(buf.offsets[idxs[k]])
        # match the serial path: trailing frames shift LEFT so the whole
        # win+lag extension reads real samples (clipping only to len(x)
        # read the zero pad and diverged on file tails — same fix as the
        # batched cc pitch path, pitch.py)
        starts = np.clip(
            np.round(centers * sr - win_len / 2).astype(int),
            0, max(len(x) - ext, 0),
        )
        start_blocks.append(starts + base)
        gp = float(np.max(np.abs(x - x.mean()))) or 1e-30
        gp_blocks.append(np.full(n_frames, gp, np.float32))

    if not start_blocks:
        empty = [HarmonicityContour(m[1], np.zeros(m[0])) for m in metas]
        return Deferred.ready(empty) if defer else empty

    x_cat = buf.x_cat if buf is not None else jnp.asarray(np.concatenate(pieces))
    all_starts = np.concatenate(start_blocks).astype(np.int32)
    starts_padded, _ = pad_frames(all_starts[:, None])
    gp_padded, _ = pad_frames(np.concatenate(gp_blocks)[:, None])
    lag_min = max(2, int(math.floor(sr / (minimum_pitch * 10))))
    hnr_dev = _gathered_hnr(
        x_cat, jnp.asarray(starts_padded[:, 0]), jnp.asarray(gp_padded[:, 0]),
        ext, win_len, max_lag, lag_min, float(silence_threshold),
    )

    def _finalize(hnr_all):
        hnr_all = np.asarray(hnr_all).astype(np.float64)
        out = []
        cursor = 0
        for n_frames, centers in metas:
            if n_frames < 1:
                out.append(HarmonicityContour(centers, np.zeros(0)))
                continue
            out.append(
                HarmonicityContour(centers, hnr_all[cursor : cursor + n_frames])
            )
            cursor += n_frames
        return out

    d = Deferred(hnr_dev, _finalize)
    return d if defer else d.result()
