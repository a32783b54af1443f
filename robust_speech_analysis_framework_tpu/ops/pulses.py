"""Glottal pulse marking and interval segmentation (TextGrid-style).

Host-side control-heavy analyses that the reference performs through Praat
objects; compute-heavy inputs (pitch tracks, intensity contours) come from
the batched device ops:

* :func:`point_process_cc` — Praat ``[Sound, Pitch]: To PointProcess (cc)``:
  period-synchronous peak picking guided by the pitch track
  (src/mshds_extractor.py:271,321).
* :func:`vuv_intervals` — ``PointProcess: To TextGrid (vuv)...`` voiced /
  unvoiced segmentation from inter-pulse gaps (:272).
* :func:`silence_intervals` — ``Intensity: To TextGrid (silences)...``
  threshold-below-max silence detection with minimum-duration merging (:55).

These run in O(number of pulses / frames) NumPy on the host — they are
decision logic, not FLOPs — and their outputs feed back into batched ops.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .intensity import IntensityContour
from .pitch import PitchTrack


def point_process_cc(
    x: np.ndarray, sr: float, pitch: PitchTrack
) -> np.ndarray:
    """Glottal pulse times from waveform peaks guided by the pitch track.

    Within each voiced frame span, successive pulses are located by finding
    the absolute waveform peak inside a window of ±0.625·T around the
    predicted next period (Praat's interpolation-free variant of
    Sound_Pitch_to_PointProcess_cc).
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    x_abs = np.abs(x)
    times = pitch.times
    f0 = np.asarray(pitch.f0, dtype=np.float64)
    n = len(times)
    n_x = len(x)
    # Scalar-arithmetic interpolator matching PitchTrack.value_at_time
    # (linear between voiced frames, NaN in unvoiced spans) — the marching
    # loop below calls it once per pulse, so it must be cheap.
    f0_nan = np.where(f0 > 0, f0, np.nan)
    f0_list = f0_nan.tolist()
    t0 = float(times[0]) if n else 0.0
    dt = float(times[1] - times[0]) if n > 1 else 1.0
    t_last = float(times[-1]) if n else 0.0

    def f_at(t: float) -> float:
        if t < t0 or t > t_last:
            return float("nan")
        pos = (t - t0) / dt
        i0 = int(pos)
        if i0 < 0:
            i0 = 0
        elif i0 > n - 1:
            i0 = n - 1
        i1 = i0 + 1 if i0 + 1 < n else n - 1
        w = pos - i0
        if w < 0.0:
            w = 0.0
        elif w > 1.0:
            w = 1.0
        return (1 - w) * f0_list[i0] + w * f0_list[i1]

    pulses: List[float] = []
    i = 0
    while i < n:
        if f0[i] <= 0:
            i += 1
            continue
        # voiced stretch [i, j)
        j = i
        while j < n and f0[j] > 0:
            j += 1
        t_start, t_end = float(times[i]), float(times[j - 1])
        # seed at the absolute peak near the middle of the first period
        T = 1.0 / f0[i]
        a = int(max(0.0, (t_start - T) * sr))
        b = int(min(n_x, (t_start + T) * sr))
        if b <= a:
            i = j
            continue
        seed = (a + int(np.argmax(x_abs[a:b]))) / sr
        head: List[float] = []
        tail: List[float] = [seed]
        # march forward
        t = seed
        while True:
            f_here = f_at(t if t < t_end else t_end)
            if not (f_here > 0):  # NaN or non-positive
                break
            T = 1.0 / f_here
            lo = t + 0.8 * T
            if lo > t_end + T:
                break
            a = int(lo * sr)
            b = int((t + 1.25 * T) * sr) + 1
            if b > n_x:
                b = n_x
            if b <= a:
                break
            t = (a + int(np.argmax(x_abs[a:b]))) / sr
            tail.append(t)
        # march backward from seed
        t = seed
        while True:
            f_here = f_at(t if t > t_start else t_start)
            if not (f_here > 0):
                break
            T = 1.0 / f_here
            hi = t - 0.8 * T
            if hi < t_start - T:
                break
            a = int((t - 1.25 * T) * sr)
            if a < 0:
                a = 0
            b = int(hi * sr) + 1
            if b <= a:
                break
            t = (a + int(np.argmax(x_abs[a:b]))) / sr
            head.append(t)
        head.reverse()
        pulses.extend(head)
        pulses.extend(tail)
        i = j
    pulses = np.asarray(sorted(set(np.round(np.asarray(pulses), 9))))
    return pulses


def vuv_intervals(
    pulses: np.ndarray,
    total_duration: float,
    max_period: float = 0.02,
    mean_period_factor: float = 1.0,  # unused placeholder for API parity
) -> List[Tuple[float, float, str]]:
    """Voiced/unvoiced segmentation from pulse gaps.

    Gaps ≤ ``max_period`` chain pulses into voiced intervals (padded by half
    a period at both ends); everything else is unvoiced. Returns
    [(tmin, tmax, 'V'|'U'), ...] covering [0, total_duration].
    """
    out: List[Tuple[float, float, str]] = []
    if len(pulses) == 0:
        return [(0.0, total_duration, "U")]
    voiced_spans = []
    start = pulses[0]
    prev = pulses[0]
    for t in pulses[1:]:
        if t - prev > max_period:
            voiced_spans.append((start, prev))
            start = t
        prev = t
    voiced_spans.append((start, prev))
    # pad each span by half the local inter-pulse interval
    padded = []
    for a, b in voiced_spans:
        pad = min(max_period / 2, 0.005)
        padded.append((max(0.0, a - pad), min(total_duration, b + pad)))
    cursor = 0.0
    for a, b in padded:
        if a > cursor:
            out.append((cursor, a, "U"))
        out.append((a, b, "V"))
        cursor = b
    if cursor < total_duration:
        out.append((cursor, total_duration, "U"))
    return out


def silence_intervals(
    intensity: IntensityContour,
    silence_threshold_db: float,
    min_silent_duration: float = 0.3,
    min_sounding_duration: float = 0.1,
) -> List[Tuple[float, float, str]]:
    """Silent/sounding segmentation of an intensity contour.

    Praat semantics: a frame is silent when its intensity is below
    ``max + silence_threshold_db`` (the threshold is negative, relative to
    the contour maximum). Silent runs shorter than ``min_silent_duration``
    are absorbed into the neighboring sounding intervals and vice versa.
    Returns [(tmin, tmax, 'silent'|'sounding'), ...].
    """
    v = intensity.values_db
    t = intensity.times
    if len(v) == 0:
        return []
    thresh = v.max() + silence_threshold_db
    silent = v < thresh
    # build runs over frame times, extended to the contour edges
    bounds = np.concatenate([[0.0], (t[1:] + t[:-1]) / 2, [t[-1] + (t[-1] - t[-2]) if len(t) > 1 else t[-1]]])
    runs: List[Tuple[float, float, bool]] = []
    k = 0
    for m in range(1, len(v) + 1):
        if m == len(v) or silent[m] != silent[k]:
            runs.append((bounds[k], bounds[m], bool(silent[k])))
            k = m
    # enforce minimum durations: flip too-short runs, then merge
    def merge(runs):
        merged = []
        for r in runs:
            if merged and merged[-1][2] == r[2]:
                merged[-1] = (merged[-1][0], r[1], r[2])
            else:
                merged.append(list(r) if isinstance(r, tuple) else r)
                merged[-1] = (r[0], r[1], r[2])
        return merged

    changed = True
    while changed:
        changed = False
        runs = merge(runs)
        for idx, (a, b, is_sil) in enumerate(runs):
            dur = b - a
            min_dur = min_silent_duration if is_sil else min_sounding_duration
            if dur < min_dur and len(runs) > 1:
                runs[idx] = (a, b, not is_sil)
                changed = True
                break
    runs = merge(runs)
    return [(a, b, "silent" if s else "sounding") for a, b, s in runs]


def label_at_time(intervals: List[Tuple[float, float, str]], t: float) -> str:
    for a, b, lab in intervals:
        if a <= t <= b:
            return lab
    return intervals[-1][2] if intervals else ""
