"""MSHDS: 25 handcrafted acoustic features per recording.

Capability parity with the reference extractor (src/mshds_extractor.py,
feature list at :397-404, per-file preprocessing at :415-419): temporal
(speech-rate) features via the de Jong & Wempe (2009) syllable-nuclei
algorithm, speaker-adaptive pitch statistics, intensity, HNR, LTAS
slope/tilt, CPPS over voiced segments, pulse-located Burg formants, and
voiced-frame spectral moments — all computed by this framework's own DSP ops
(ops/*) instead of Praat, with the same NaN-on-failure row semantics
(:450-457).

The device ops (pitch, intensity, cepstrum, formants, spectra) are batched
frame-parallel XLA programs; the host orchestrates per-file decision logic.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Optional

import numpy as np
import pandas as pd

from ..ops.cepstrum import cpps, power_cepstrogram
from ..ops.formants import formant_track_burg
from ..ops.harmonicity import harmonicity_cc
from ..ops.intensity import IntensityContour, intensity_contour
from ..ops.ltas import ltas_pitch_corrected
from ..ops.pitch import PitchTrack, pitch_track_ac, pitch_track_cc
from ..ops.pulses import (
    label_at_time,
    point_process_cc,
    silence_intervals,
    vuv_intervals,
)
from ..ops.spectral import voiced_mean_moments
from ..utils.reliability import retry_transient

FEATURE_NAMES = [
    "Speaking_Rate", "Articulation_Rate", "Phonation_Ratio", "Pause_Rate",
    "Mean_Pause_Duration",
    "mean_F0", "stdev_F0_Semitone", "mean_dB", "range_ratio_dB", "HNR_dB",
    "Spectral_Slope", "Spectral_Tilt", "Cepstral_Peak_Prominence",
    "mean_F1_Loc", "std_F1_Loc", "mean_B1_Loc", "std_B1_Loc",
    "mean_F2_Loc", "std_F2_Loc", "mean_B2_Loc", "std_B2_Loc",
    "Spectral_Gravity", "Spectral_Std_Dev", "Spectral_Skewness",
    "Spectral_Kurtosis",
]


def speaker_pitch_range(x: np.ndarray, sr: float):
    """Adaptive pitch floor/ceiling (reference :127-162): wide 50-600 Hz
    pass, |z|≤2 outlier filter, mean<170 Hz → (60, 250) else (100, 500);
    (75, 500) fallback."""
    try:
        wide = pitch_track_ac(x, sr, time_step=0.005, floor=50, ceiling=600)
        v = wide.f0[wide.f0 > 0]
        if v.size == 0:
            return 75, 500
        z = (v - v.mean()) / max(v.std(), 1e-12)
        v = v[np.abs(z) <= 2]
        if v.size == 0:
            return 75, 500
        return (60, 250) if v.mean() < 170 else (100, 500)
    except Exception:
        return 75, 500


def speechrate_features(
    x: np.ndarray,
    sr: float,
    pitch: "PitchTrack | None" = None,
    intensity: "IntensityContour | None" = None,
) -> Dict[str, float]:
    """de Jong & Wempe syllable-nuclei speech-rate analysis (reference
    :11-122): intensity-peak syllable candidates above a quantile-based
    silence threshold, validated by a ≥2 dB following dip and voicing."""
    nan5 = dict.fromkeys(
        ["Speaking_Rate", "Articulation_Rate", "Phonation_Ratio", "Pause_Rate",
         "Mean_Pause_Duration"], float("nan")
    )
    try:
        silencedb = -25.0
        mindip = 2.0
        minpause = 0.3

        if intensity is None:
            intensity = intensity_contour(
                x, sr, minimum_pitch=50, time_step=0.016, subtract_mean=True
            )
        if len(intensity.times) < 3:
            return nan5
        min_int = intensity.min_db()
        max_int = intensity.max_db()
        q99 = intensity.quantile(0.99)
        thresh_abs = max(q99 + silencedb, min_int)  # peak floor, absolute dB
        thresh_rel = silencedb - (max_int - q99)  # silence cut, re contour max

        intervals = silence_intervals(intensity, thresh_rel, minpause, 0.1)
        sounding = [(a, b) for a, b, lab in intervals if lab == "sounding"]
        if not sounding:
            return nan5
        phonation_time = sum(b - a for a, b in sounding)
        begin_speak, end_speak = sounding[0][0], sounding[-1][1]

        # Intensity maxima above the peak floor.
        v = intensity.values_db
        t = intensity.times
        is_peak = np.zeros(len(v), bool)
        is_peak[1:-1] = (v[1:-1] > v[:-2]) & (v[1:-1] > v[2:])
        peak_idx = np.flatnonzero(is_peak & (v > thresh_abs))
        timepeaks = t[peak_idx]
        intensities = v[peak_idx]

        # Keep peaks with a ≥ mindip intensity dip before the next peak.
        validtime = []
        if len(timepeaks) > 1:
            current_t, current_i = timepeaks[0], intensities[0]
            for p in range(len(timepeaks) - 1):
                dip = intensity.min_in_range(current_t, timepeaks[p + 1])
                if abs(current_i - dip) > mindip:
                    validtime.append(timepeaks[p])
                current_t = timepeaks[p + 1]
                current_i = intensity.value_at_time(timepeaks[p + 1])

        if pitch is None:
            pitch = pitch_track_ac(
                x, sr, time_step=0.02, floor=30, ceiling=450, max_candidates=4,
                silence_threshold=0.03, voicing_threshold=0.25, octave_cost=0.01,
                octave_jump_cost=0.35, voiced_unvoiced_cost=0.25,
            )
        n_syll = 0
        for time in validtime:
            f = pitch.value_at_time(time)
            if np.isfinite(f) and label_at_time(intervals, time) == "sounding":
                n_syll += 1

        duration = end_speak - begin_speak
        n_pauses = len(sounding) - 1
        pause_time = duration - phonation_time
        return {
            "Speaking_Rate": n_syll / duration if duration > 0 else 0.0,
            "Articulation_Rate": n_syll / phonation_time if phonation_time > 0 else 0.0,
            "Phonation_Ratio": phonation_time / duration if duration > 0 else 0.0,
            "Pause_Rate": n_pauses / duration if duration > 0 else 0.0,
            "Mean_Pause_Duration": pause_time / n_pauses if n_pauses > 0 else 0.0,
        }
    except Exception:
        return nan5


def extract_mshds_single(
    x: np.ndarray,
    sr: float = 16000,
    precomputed: Optional[Dict[str, object]] = None,
    pitch_range: Optional[tuple] = None,
) -> Dict[str, float]:
    """All 25 MSHDS features for one mono 16 kHz waveform.

    ``precomputed`` may carry pitch tracks produced by the corpus-batched
    front end (keys: 'speechrate', 'main', 'cc', 'cpp'); ``pitch_range``
    overrides the adaptive floor/ceiling (both supplied by
    :func:`extract_mshds_batch`).
    """
    pre = precomputed or {}
    out: Dict[str, float] = {}
    out.update(speechrate_features(
        x, sr, pitch=pre.get("speechrate"),
        intensity=pre.get("speechrate_intensity"),
    ))

    floor, ceiling = pitch_range or speaker_pitch_range(x, sr)

    # Pitch statistics (reference :164-183).
    try:
        pitch = pre.get("main") or retry_transient(lambda: pitch_track_ac(
            x, sr, time_step=0.005, floor=floor, ceiling=ceiling))
        out["mean_F0"] = pitch.mean_hz()
        out["stdev_F0_Semitone"] = pitch.std_semitones()
    except Exception:
        pitch = None
        out["mean_F0"] = out["stdev_F0_Semitone"] = float("nan")

    # Intensity (reference :185-205).
    try:
        intens = pre.get("intensity") or retry_transient(lambda: intensity_contour(
            x, sr, minimum_pitch=floor, time_step=0.005, subtract_mean=True
        ))
        out["mean_dB"] = intens.mean_energy_db()
        mn, mx = intens.min_db(), intens.max_db()
        out["range_ratio_dB"] = mx / mn if mn != 0 else float("nan")
    except Exception:
        out["mean_dB"] = out["range_ratio_dB"] = float("nan")

    # HNR (reference :207-225).
    try:
        hc = pre.get("harmonicity") or retry_transient(lambda: harmonicity_cc(
            x, sr, time_step=0.005, minimum_pitch=floor,
            silence_threshold=0.1, periods_per_window=4.5,
        ))
        out["HNR_dB"] = hc.mean_db()
    except Exception:
        out["HNR_dB"] = float("nan")

    # LTAS slope + tilt (reference :227-251).
    try:
        pcc = pre.get("cc") or pitch_track_cc(
            x, sr, time_step=0.005, floor=floor, ceiling=ceiling)
        pulses = point_process_cc(x, sr, pcc)
        lt = ltas_pitch_corrected(x, sr, pulses)
        out["Spectral_Slope"] = lt.slope_db(50, 1000, 1000, 4000)
        out["Spectral_Tilt"] = lt.spectral_tilt(100, 5000)
    except Exception:
        pulses = np.zeros(0)
        out["Spectral_Slope"] = out["Spectral_Tilt"] = float("nan")

    # CPPS over voiced segments (reference :253-301).
    try:
        p_v = pre.get("cpp") or pitch_track_ac(
            x, sr, time_step=0.005, floor=floor, ceiling=ceiling,
            voicing_threshold=0.3,
        )
        vuv_pulses = point_process_cc(x, sr, p_v)
        segments = vuv_intervals(vuv_pulses, len(x) / sr, max_period=0.02)
        cpp_vals = []
        for a, b, lab in segments:
            if lab != "V" or b - a < 0.06:
                continue
            seg = x[int(a * sr) : int(b * sr)]
            cg = power_cepstrogram(seg, sr, pitch_floor=60, time_step=0.002,
                                   max_frequency=5000, preemphasis_from=50)
            val, _ = cpps(cg, pitch_min=60, pitch_max=330)
            if np.isfinite(val) and val > 4:
                cpp_vals.append(val)
        out["Cepstral_Peak_Prominence"] = (
            float(np.mean(cpp_vals)) if cpp_vals else float("nan")
        )
    except Exception:
        out["Cepstral_Peak_Prominence"] = float("nan")

    # Formants at glottal pulses (reference :303-338).
    try:
        ft = retry_transient(lambda: formant_track_burg(
            x, sr, time_step=0.005, max_formants=5,
            max_formant_hz=5000, window_length=0.025, preemphasis_from=50))
        if len(pulses) == 0:
            pcc2 = pitch_track_cc(x, sr, time_step=0.005, floor=floor, ceiling=ceiling)
            pulses = point_process_cc(x, sr, pcc2)
        for fi, (fkey, bkey) in enumerate(
            [("F1", "B1"), ("F2", "B2")], start=1
        ):
            fv = ft.value_at(fi, pulses) if len(pulses) else np.asarray([])
            bv = ft.bandwidth_at(fi, pulses) if len(pulses) else np.asarray([])
            fv = np.atleast_1d(fv)
            bv = np.atleast_1d(bv)
            fv = fv[np.isfinite(fv)]
            bv = bv[np.isfinite(bv)]
            out[f"mean_{fkey}_Loc"] = float(fv.mean()) if fv.size else float("nan")
            out[f"std_{fkey}_Loc"] = (
                float(fv.std(ddof=1)) if fv.size > 1 else float("nan")
            )
            out[f"mean_{bkey}_Loc"] = float(bv.mean()) if bv.size else float("nan")
            out[f"std_{bkey}_Loc"] = (
                float(bv.std(ddof=1)) if bv.size > 1 else float("nan")
            )
    except Exception:
        for k in ["mean_F1_Loc", "std_F1_Loc", "mean_B1_Loc", "std_B1_Loc",
                  "mean_F2_Loc", "std_F2_Loc", "mean_B2_Loc", "std_B2_Loc"]:
            out[k] = float("nan")

    # Spectral moments over voiced frames (reference :340-376).
    try:
        if pitch is None:
            raise ValueError("no pitch track")
        def voiced_at(times):
            vals = np.atleast_1d(pitch.value_at_time(times))
            return np.isfinite(vals)
        g, s, sk, ku = voiced_mean_moments(x, sr, voiced_at, 0.025, 0.005)
        out["Spectral_Gravity"], out["Spectral_Std_Dev"] = g, s
        out["Spectral_Skewness"], out["Spectral_Kurtosis"] = sk, ku
    except Exception:
        out["Spectral_Gravity"] = out["Spectral_Std_Dev"] = float("nan")
        out["Spectral_Skewness"] = out["Spectral_Kurtosis"] = float("nan")

    return out


def extract_mshds_features(
    input_df: pd.DataFrame,
    audio_file_column: str = "filepath",
    verbose: bool = True,
    waveforms: Optional[Mapping[str, np.ndarray]] = None,
    n_workers: int = 4,
) -> pd.DataFrame:
    """Corpus-level front door with the reference's API shape (:379-459):
    one row per file, 'filename' + 25 features, NaN row on failure.

    ``waveforms`` may supply pre-decoded 16 kHz mono audio keyed by
    filename (skips disk IO; used by the batched pipelines and tests).
    Files are processed by a small thread pool — the host decision logic of
    one file overlaps the device work of others, and the jitted ops are
    shared (XLA compilation/execution is thread-safe).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..audio.io import load_mono_16k

    if input_df.empty:
        return pd.DataFrame(columns=["filename"] + FEATURE_NAMES)

    names = [os.path.basename(p) for p in input_df[audio_file_column]]
    paths = list(input_df[audio_file_column])

    def one(idx: int) -> dict:
        name = names[idx]
        try:
            if waveforms is not None and name in waveforms:
                x = np.asarray(waveforms[name], dtype=np.float64)
            else:
                x = load_mono_16k(paths[idx]).astype(np.float64)
            feats = extract_mshds_single(x, 16000)
            return {"filename": name,
                    **{k: feats.get(k, float("nan")) for k in FEATURE_NAMES}}
        except Exception as e:
            if verbose:
                print(f"ERROR processing '{name}': {e}. Appending NaNs.")
            return {"filename": name, **dict.fromkeys(FEATURE_NAMES, float("nan"))}

    if n_workers <= 1 or len(paths) <= 1:
        rows = [one(i) for i in range(len(paths))]
    else:
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            rows = list(pool.map(one, range(len(paths))))
    return pd.DataFrame(rows)


def extract_mshds_batch(
    waveforms: Mapping[str, np.ndarray],
    sr: float = 16000,
    n_workers: int = 4,
    verbose: bool = True,
) -> pd.DataFrame:
    """Corpus-batched MSHDS extraction.

    The pitch analyses — four per file, the dominant device cost — run as
    corpus-level batches (ops.pitch.pitch_track_batch): the wide
    speaker-adaptation pass and the fixed-parameter speech-rate pass batch
    across ALL files; the range-adapted passes batch per (floor, ceiling)
    group (only three possible ranges). Remaining per-file analyses reuse the
    precomputed tracks through :func:`extract_mshds_single`.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..ops.pitch import PitchParams, pitch_track_batch

    names = list(waveforms.keys())
    xs = [np.asarray(waveforms[n], dtype=np.float64).reshape(-1) for n in names]
    if not names:
        return pd.DataFrame(columns=["filename"] + FEATURE_NAMES)

    # 1) wide speaker-adaptation pass, batched over every file (:141-162).
    wide = pitch_track_batch(
        xs, sr, PitchParams(time_step=0.005, floor=50, ceiling=600)
    )
    ranges = []
    for track in wide:
        v = track.f0[track.f0 > 0]
        if v.size == 0:
            ranges.append((75, 500))
            continue
        z = (v - v.mean()) / max(v.std(), 1e-12)
        v = v[np.abs(z) <= 2]
        if v.size == 0:
            ranges.append((75, 500))
        else:
            ranges.append((60, 250) if v.mean() < 170 else (100, 500))

    from ..ops.intensity import intensity_contour_batch

    # 2) fixed-parameter speech-rate pass, batched over every file (:104),
    # plus its intensity contour (fixed min_pitch=50, step 16 ms, :41).
    speechrate_intensity = intensity_contour_batch(
        xs, sr, minimum_pitch=50, time_step=0.016, subtract_mean=True
    )
    speechrate_tracks = pitch_track_batch(
        xs, sr,
        PitchParams(
            time_step=0.02, floor=30, ceiling=450, max_candidates=4,
            silence_threshold=0.03, voicing_threshold=0.25, octave_cost=0.01,
            octave_jump_cost=0.35, voiced_unvoiced_cost=0.25,
        ),
    )

    # 3) range-adapted passes, batched per (floor, ceiling) group.
    precomputed = [
        dict(speechrate=speechrate_tracks[i],
             speechrate_intensity=speechrate_intensity[i])
        for i in range(len(xs))
    ]
    groups: Dict[tuple, list] = {}
    for i, rng_ in enumerate(ranges):
        groups.setdefault(rng_, []).append(i)
    from ..ops.harmonicity import harmonicity_cc_batch

    for (floor, ceiling), idxs in groups.items():
        grp = [xs[i] for i in idxs]
        intens = intensity_contour_batch(
            grp, sr, minimum_pitch=floor, time_step=0.005, subtract_mean=True
        )
        hnr = harmonicity_cc_batch(
            grp, sr, time_step=0.005, minimum_pitch=floor,
            silence_threshold=0.1, periods_per_window=4.5,
        )
        main = pitch_track_batch(
            grp, sr, PitchParams(time_step=0.005, floor=floor, ceiling=ceiling)
        )
        cc = pitch_track_batch(
            grp, sr,
            PitchParams(time_step=0.005, floor=floor, ceiling=ceiling, method="cc"),
        )
        cpp = pitch_track_batch(
            grp, sr,
            PitchParams(time_step=0.005, floor=floor, ceiling=ceiling,
                        voicing_threshold=0.3),
        )
        for j, i in enumerate(idxs):
            precomputed[i].update(
                main=main[j], cc=cc[j], cpp=cpp[j], intensity=intens[j],
                harmonicity=hnr[j],
            )

    # 4) remaining per-file analyses, thread pool as in the serial path.
    def one(i: int) -> dict:
        name = names[i]
        try:
            feats = extract_mshds_single(
                xs[i], sr, precomputed=precomputed[i], pitch_range=ranges[i]
            )
            return {"filename": name,
                    **{k: feats.get(k, float("nan")) for k in FEATURE_NAMES}}
        except Exception as e:
            if verbose:
                print(f"ERROR processing '{name}': {e}. Appending NaNs.")
            return {"filename": name, **dict.fromkeys(FEATURE_NAMES, float("nan"))}

    if n_workers <= 1 or len(xs) <= 1:
        rows = [one(i) for i in range(len(xs))]
    else:
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            rows = list(pool.map(one, range(len(xs))))
    return pd.DataFrame(rows)
