"""MSHDS: 25 handcrafted acoustic features per recording.

Capability parity with the reference extractor (src/mshds_extractor.py,
feature list at :397-404, per-file preprocessing at :415-419): temporal
(speech-rate) features via the de Jong & Wempe (2009) syllable-nuclei
algorithm, speaker-adaptive pitch statistics, intensity, HNR, LTAS
slope/tilt, CPPS over voiced segments, pulse-located Burg formants, and
voiced-frame spectral moments — all computed by this framework's own DSP ops
(ops/*) instead of Praat, with the same NaN-on-failure row semantics
(:450-457).

The pipeline is corpus-staged: every device analysis (pitch ×4, intensity
×2, harmonicity, Burg formants + roots, cepstrogram CPPS, spectral moments)
runs as ONE batched XLA program over the frames of EVERY file, with a single
device→host transfer per stage — the design that turns the reference's
per-file Praat call graph (thousands of Python↔C++ crossings per file,
src/mshds_extractor.py:408) into a dozen device round trips per corpus. The
serial entry points route through the same machinery with a one-file corpus,
so batch and serial results are identical by construction.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Mapping, Optional

import numpy as np
import pandas as pd

from ..ops.cepstrum import cepstrum_preprocess, cpps_segments_batch
from ..ops.formants import formant_track_burg_batch
from ..ops.framing import corpus_buffer, resample_buffer
from ..ops.harmonicity import harmonicity_cc_batch
from ..ops.intensity import IntensityContour, intensity_contour_batch
from ..ops.ltas import ltas_pitch_corrected_batch
from ..ops.pitch import (
    PitchParams,
    PitchTrack,
    pitch_track_batch,
    pitch_track_batch_shared,
)
from ..ops.pulses import (
    label_at_time,
    point_process_cc,
    point_process_cc_batch,
    silence_intervals,
    vuv_intervals,
)
from ..ops.spectral import voiced_mean_moments_batch
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

_TEMPORAL = ["Speaking_Rate", "Articulation_Rate", "Phonation_Ratio",
             "Pause_Rate", "Mean_Pause_Duration"]


def _range_from_track(track: PitchTrack):
    """Adaptive pitch floor/ceiling decision from the wide 50-600 Hz pass
    (reference :127-162): |z|≤2 outlier filter, mean<170 Hz → (60, 250)
    else (100, 500); (75, 500) fallback."""
    v = track.f0[track.f0 > 0]
    if v.size == 0:
        return 75, 500
    z = (v - v.mean()) / max(v.std(), 1e-12)
    v = v[np.abs(z) <= 2]
    if v.size == 0:
        return 75, 500
    return (60, 250) if v.mean() < 170 else (100, 500)


def speaker_pitch_range(x: np.ndarray, sr: float):
    """Adaptive pitch floor/ceiling (reference :127-162) for one file."""
    try:
        wide = pitch_track_batch(
            [np.asarray(x, dtype=np.float64).reshape(-1)], sr,
            PitchParams(time_step=0.005, floor=50, ceiling=600),
        )[0]
        return _range_from_track(wide)
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
    nan5 = dict.fromkeys(_TEMPORAL, float("nan"))
    try:
        silencedb = -25.0
        mindip = 2.0
        minpause = 0.3

        if intensity is None:
            intensity = intensity_contour_batch(
                [x], sr, minimum_pitch=50, time_step=0.016, subtract_mean=True
            )[0]
        if len(intensity.times) < 3:
            return nan5
        min_int = intensity.min_db()
        max_int = intensity.max_db()
        q99 = intensity.quantile(0.99)
        thresh_abs = max(q99 + silencedb, min_int)  # peak floor, absolute dB
        thresh_rel = silencedb - (max_int - q99)  # silence cut, re contour max

        intervals = silence_intervals(
            intensity, thresh_rel, minpause, 0.1, total_duration=len(x) / sr
        )
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
            pitch = pitch_track_batch(
                [x], sr,
                PitchParams(
                    time_step=0.02, floor=30, ceiling=450, max_candidates=4,
                    silence_threshold=0.03, voicing_threshold=0.25,
                    octave_cost=0.01, octave_jump_cost=0.35,
                    voiced_unvoiced_cost=0.25,
                ),
            )[0]
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


def _stage(fn, default, verbose: bool, label: str):
    """Run one corpus-batched stage; on failure return ``default`` so the
    affected feature group degrades to NaN instead of killing the corpus
    (reference NaN-row semantics, src/mshds_extractor.py:450-457)."""
    try:
        return retry_transient(fn)
    except Exception as e:
        if verbose:
            print(f"MSHDS stage '{label}' failed: {e}. NaN-filling.")
        return default


class _Level:
    """One pipeline level of independent deferred stages.

    ``add`` dispatches a stage (async — the device program is queued and
    the call returns immediately); ``collect`` fetches every stage's device
    outputs in ONE overlapped transfer and finalizes them. The tunnel to
    the chip costs ~100 ms per synchronous round trip, so collapsing the
    pipeline's dozen per-stage syncs into three level syncs is worth ~1 s
    per corpus. Failure semantics match :func:`_stage`: a failed dispatch
    or finalize degrades that stage to its default (NaN features), never
    the whole corpus.
    """

    def __init__(self, verbose: bool):
        self.verbose = verbose
        self.stages: list = []  # (label, deferred|None, default)

    def add(self, fn, default, label: str):
        """Dispatch ``fn()`` (which must return an ops.framing.Deferred);
        returns an index into this level's results."""
        try:
            d = fn()
        except Exception as e:
            if self.verbose:
                print(f"MSHDS stage '{label}' failed: {e}. NaN-filling.")
            d = None
        self.stages.append((label, d, default))
        return len(self.stages) - 1

    def collect(self) -> list:
        import jax

        live = [(i, d) for i, (_, d, _) in enumerate(self.stages) if d is not None]
        results = [default for (_, _, default) in self.stages]
        host = None
        if live:
            try:
                host = retry_transient(
                    lambda: jax.device_get([d.arrays for _, d in live])
                )
            except Exception as e:
                if self.verbose:
                    print(f"MSHDS level fetch failed: {e}. NaN-filling.")
        if host is not None:
            for (i, d), h in zip(live, host):
                try:
                    results[i] = d.finalize(h)
                except Exception as e:
                    if self.verbose:
                        print(
                            f"MSHDS stage '{self.stages[i][0]}' failed: {e}."
                            " NaN-filling."
                        )
        return results


def _extract_corpus(
    xs: "List[np.ndarray]", sr: float, verbose: bool = True
) -> "List[Dict[str, float]]":
    """All 25 MSHDS features for every waveform, corpus-staged (see module
    docstring). Returns one feature dict per input."""
    n = len(xs)
    xs = [np.asarray(x, dtype=np.float64).reshape(-1) for x in xs]
    rows: "List[Dict[str, float]]" = [
        dict.fromkeys(FEATURE_NAMES, float("nan")) for _ in range(n)
    ]
    if n == 0:
        return rows

    # One device upload for all 16 kHz analysis stages: pad covers the
    # largest window+lag extension used below, which scales with sr — the
    # range-adapted intensity window is 6.4/50·sr and harmonicity-cc needs
    # (4.5+1)/60·sr, so a fixed 4096 only covers sr ≤ ~32 kHz (at 48 kHz
    # every HNR/intensity stage raised and NaN'd the whole corpus).
    # Offsets are aligned to the 10 kHz-resample down-factor so the
    # formant/cepstrum buffer can be produced on device by resampling this
    # one (no second upload).
    _g = math.gcd(10000, int(round(sr)))
    _up, _down = 10000 // _g, int(round(sr)) // _g
    pad16 = max(4096, int(0.14 * sr) + 64)
    buf16 = corpus_buffer(xs, pad=pad16, align=_down)

    # Three dispatch→collect levels (see _Level): stages inside a level are
    # independent and fetch together with one overlapped transfer.
    #
    # L0: wide-pitch + speech-rate passes + every stage whose DEVICE work
    #     has no data dependency on earlier host decisions (spectral
    #     moments — the voiced mask is finalize-time host work; Burg
    #     formants — pulses only matter when sampling the finished track).
    # L1: the range-adapted passes (need the wide track's floor/ceiling).
    # L2: LTAS + CPPS (need glottal pulses, a host decision from L1 tracks).

    main_tracks: "List[Optional[PitchTrack]]" = [None] * n

    def _voiced_fn(track):
        if track is None:
            return lambda t: np.zeros(len(np.atleast_1d(t)), bool)

        def fn(t):
            vals = np.atleast_1d(track.value_at_time(t))
            return np.isfinite(vals)

        return fn

    # --- L0 dispatch -------------------------------------------------------
    sr10k = 10000.0
    pre10k = math.exp(-2.0 * math.pi * 50.0 / sr10k)
    buf10k = _stage(
        lambda: resample_buffer(buf16, _up, _down, preemphasis=pre10k),
        None, verbose, "resample-10k",
    )
    if buf10k is None:  # host fallback (per-file resample + upload)
        x10k_list: "List[np.ndarray]" = []
        for i in range(n):
            try:
                x10k_list.append(cepstrum_preprocess(xs[i], sr)[0])
            except Exception:
                x10k_list.append(np.zeros(0))
        buf10k = corpus_buffer(x10k_list, pad=1024)
    x10k = buf10k.xs

    l0 = _Level(verbose)
    # wide speaker-adaptation pitch pass (:141-162)
    k_wide = l0.add(
        lambda: pitch_track_batch(
            None, sr, PitchParams(time_step=0.005, floor=50, ceiling=600),
            buf=buf16, defer=True,
        ),
        None, "wide-pitch",
    )
    # fixed-parameter speech-rate passes (:41,:104)
    k_srint = l0.add(
        lambda: intensity_contour_batch(
            None, sr, minimum_pitch=50, time_step=0.016, subtract_mean=True,
            buf=buf16, defer=True,
        ),
        [None] * n, "speechrate-intensity",
    )
    k_srpitch = l0.add(
        lambda: pitch_track_batch(
            None, sr,
            PitchParams(
                time_step=0.02, floor=30, ceiling=450, max_candidates=4,
                silence_threshold=0.03, voicing_threshold=0.25,
                octave_cost=0.01, octave_jump_cost=0.35,
                voiced_unvoiced_cost=0.25,
            ),
            buf=buf16, defer=True,
        ),
        [None] * n, "speechrate-pitch",
    )
    tail = _Level(verbose)  # collected LAST

    l0_res = l0.collect()
    wide = l0_res[k_wide]
    sr_intensity = l0_res[k_srint]
    sr_pitch = l0_res[k_srpitch]
    ranges = (
        [_range_from_track(t) for t in wide] if wide is not None
        else [(75, 500)] * n
    )

    # --- L1: range-adapted passes, batched per (floor, ceiling) ------------
    cpp_tracks: "List[Optional[PitchTrack]]" = [None] * n
    cc_tracks: "List[Optional[PitchTrack]]" = [None] * n
    groups: "Dict[tuple, list]" = {}
    for i, rng_ in enumerate(ranges):
        groups.setdefault(rng_, []).append(i)
    l1 = _Level(verbose)
    group_keys = {}
    for (floor, ceiling), idxs in groups.items():
        # main (voicing 0.45) + CPP (voicing 0.3) share one autocorr pass
        group_keys[(floor, ceiling)] = (
            l1.add(
                lambda f=floor, c=ceiling, ii=idxs: pitch_track_batch_shared(
                    None, sr,
                    [PitchParams(time_step=0.005, floor=f, ceiling=c),
                     PitchParams(time_step=0.005, floor=f, ceiling=c,
                                 voicing_threshold=0.3)],
                    buf=buf16, indices=ii, defer=True,
                ),
                None, "main-pitch",
            ),
            l1.add(
                lambda f=floor, c=ceiling, ii=idxs: pitch_track_batch(
                    None, sr,
                    PitchParams(time_step=0.005, floor=f, ceiling=c,
                                method="cc"),
                    buf=buf16, indices=ii, defer=True,
                ),
                [None] * len(idxs), "cc-pitch",
            ),
            l1.add(
                lambda f=floor, ii=idxs: intensity_contour_batch(
                    None, sr, minimum_pitch=f, time_step=0.005,
                    subtract_mean=True, buf=buf16, indices=ii, defer=True,
                ),
                [None] * len(idxs), "intensity",
            ),
            l1.add(
                lambda f=floor, ii=idxs: harmonicity_cc_batch(
                    None, sr, time_step=0.005, minimum_pitch=f,
                    silence_threshold=0.1, periods_per_window=4.5,
                    buf=buf16, indices=ii, defer=True,
                ),
                [None] * len(idxs), "harmonicity",
            ),
        )
    # Host speech-rate decision logic overlaps the queued device programs.
    for i in range(n):
        try:
            rows[i].update(speechrate_features(
                xs[i], sr, pitch=sr_pitch[i], intensity=sr_intensity[i]
            ))
        except Exception:
            pass

    l1_res = l1.collect()
    for (floor, ceiling), idxs in groups.items():
        k_ac, k_cc, k_int, k_hnr = group_keys[(floor, ceiling)]
        ac, cc = l1_res[k_ac], l1_res[k_cc]
        intens, hnr = l1_res[k_int], l1_res[k_hnr]
        for j, i in enumerate(idxs):
            if ac is not None:
                main_tracks[i], cpp_tracks[i] = ac[0][j], ac[1][j]
            cc_tracks[i] = cc[j]
            # pitch statistics (reference :164-183)
            if main_tracks[i] is not None:
                rows[i]["mean_F0"] = main_tracks[i].mean_hz()
                rows[i]["stdev_F0_Semitone"] = main_tracks[i].std_semitones()
            # intensity statistics (reference :185-205)
            if intens[j] is not None and len(intens[j].times):
                rows[i]["mean_dB"] = intens[j].mean_energy_db()
                mn, mx = intens[j].min_db(), intens[j].max_db()
                rows[i]["range_ratio_dB"] = mx / mn if mn != 0 else float("nan")
            # HNR (reference :207-225)
            if hnr[j] is not None:
                rows[i]["HNR_dB"] = hnr[j].mean_db()

    # --- glottal pulses: batched device march over all voiced stretches ----
    # (ops.pulses.point_process_cc_batch; the per-file NumPy march remains
    # the oracle/fallback). Both track families fetch in one round trip.
    # Path choice: the host march costs ~9 ms per voiced second per pass
    # (sequential NumPy), the device march a near-flat ~0.2 s per corpus
    # (lane-parallel, lockstep-bounded). Crossover ≈ 25 voiced seconds —
    # small corpora take the host path, real corpora the device one.
    voiced_s = sum(
        float((np.asarray(t.f0) > 0).sum()) * 0.005
        for t in list(cc_tracks) + list(cpp_tracks) if t is not None
    )
    use_device_pulses = voiced_s > 25.0

    pulse_lvl = _Level(verbose)
    k_pulse = None
    if use_device_pulses:
        k_pulse = pulse_lvl.add(
            lambda: point_process_cc_batch(
                None, sr, list(cc_tracks) + list(cpp_tracks), buf=buf16,
                defer=True,
            ),
            None, "pulses",
        )
    # Queued AFTER the pulse-march program (so the pulse fetch doesn't wait
    # on them); their device execution overlaps the host-side vuv/CPPS-item
    # preparation below. Device part of moments is voicing-independent —
    # the voiced mask binds late via the callable; formant tracks are only
    # sampled at pulses on the host after the tail collect.
    t_moments = tail.add(
        lambda: voiced_mean_moments_batch(
            None, sr,
            lambda: [_voiced_fn(t) for t in main_tracks],
            0.025, 0.005, buf=buf16, defer=True,
        ),
        [(float("nan"),) * 4] * n, "moments",
    )
    t_formants = tail.add(
        lambda: formant_track_burg_batch(
            x10k, sr10k, time_step=0.005, max_formants=5,
            max_formant_hz=5000, window_length=0.025, preemphasis_from=50,
            preprocessed=True, buf=buf10k, defer=True,
        ),
        [None] * n, "formants",
    )

    both = pulse_lvl.collect()[k_pulse] if k_pulse is not None else None
    if both is not None:
        cc_pulses, cpp_pulses = list(both[:n]), list(both[n:])
        # per-file host fallback: a transiently failed lane degrades to the
        # NumPy march instead of NaN-ing every pulse-derived feature
        for i in range(n):
            if len(cc_pulses[i]) == 0 and cc_tracks[i] is not None \
                    and (np.asarray(cc_tracks[i].f0) > 0).any():
                try:
                    cc_pulses[i] = point_process_cc(xs[i], sr, cc_tracks[i])
                except Exception:
                    pass
            if len(cpp_pulses[i]) == 0 and cpp_tracks[i] is not None \
                    and (np.asarray(cpp_tracks[i].f0) > 0).any():
                try:
                    cpp_pulses[i] = point_process_cc(xs[i], sr, cpp_tracks[i])
                except Exception:
                    pass
    else:  # host path (small corpora) / device-march failure fallback;
        # overlaps the moments/formants programs dispatched above
        cc_pulses = [np.zeros(0)] * n
        cpp_pulses = [np.zeros(0)] * n
        for i in range(n):
            try:
                if cc_tracks[i] is not None:
                    cc_pulses[i] = point_process_cc(xs[i], sr, cc_tracks[i])
            except Exception:
                pass
            try:
                if cpp_tracks[i] is not None:
                    cpp_pulses[i] = point_process_cc(xs[i], sr, cpp_tracks[i])
            except Exception:
                pass

    # --- L2: pulse-dependent stages ----------------------------------------
    t_ltas = tail.add(
        lambda: ltas_pitch_corrected_batch(
            xs, sr, cc_pulses, buf=buf16, defer=True
        ),
        [None] * n, "ltas",
    )
    # Reference (src/mshds_extractor.py:277-297): EVERY voiced segment with
    # tmin < tmax goes through 'To PowerCepstrogram', whose too-short-for-
    # one-window failure sits OUTSIDE the per-segment try and NaNs the whole
    # file's CPP. Praat frames the 10 kHz-resampled segment with a
    # 2/pitch_floor window, so feasibility is judged on the same grid the
    # batch kernel uses.
    from ..ops.pitch import praat_frame_grid

    window_s = 2.0 / 60.0
    items = []
    for i in range(n):
        try:
            segments = vuv_intervals(
                cpp_pulses[i], len(xs[i]) / sr, max_period=0.02,
                mean_period=0.1,  # the reference's literal vuv call
                # (src/mshds_extractor.py:272): 50 ms pads per side
            )
            segs = []
            for a, b, lab in segments:
                if lab != "V" or b <= a:
                    continue
                seg_len = min(int(b * sr10k), len(x10k[i])) - min(
                    int(a * sr10k), len(x10k[i])
                )
                if praat_frame_grid(max(seg_len, 0), sr10k, window_s, 0.002)[0] < 1:
                    segs = []  # whole-file NaN, as the reference's outer try
                    break
                segs.append((a, b))
        except Exception:
            segs = []
        items.append((x10k[i], segs))
    t_cpps = tail.add(
        lambda: cpps_segments_batch(items, sr10k, pitch_floor=60,
                                    time_step=0.002, pitch_min=60,
                                    pitch_max=330, buf=buf10k, defer=True),
        [float("nan")] * n, "cpps",
    )

    tail_res = tail.collect()
    moments = tail_res[t_moments]
    fts = tail_res[t_formants]
    ltas_list = tail_res[t_ltas]
    cpp_vals = tail_res[t_cpps]

    # LTAS slope + tilt (reference :227-251)
    for i in range(n):
        lt = ltas_list[i]
        if lt is None:
            continue
        try:
            rows[i]["Spectral_Slope"] = lt.slope_db(50, 1000, 1000, 4000)
            rows[i]["Spectral_Tilt"] = lt.spectral_tilt(100, 5000)
        except Exception:
            pass

    # Formants sampled at glottal pulses (reference :303-338)
    for i in range(n):
        ft, pulses = fts[i], cc_pulses[i]
        if ft is None:
            continue
        try:
            for fi, (fkey, bkey) in enumerate([("F1", "B1"), ("F2", "B2")], 1):
                fv = ft.value_at(fi, pulses) if len(pulses) else np.asarray([])
                bv = ft.bandwidth_at(fi, pulses) if len(pulses) else np.asarray([])
                fv = np.atleast_1d(fv)
                bv = np.atleast_1d(bv)
                fv = fv[np.isfinite(fv)]
                bv = bv[np.isfinite(bv)]
                rows[i][f"mean_{fkey}_Loc"] = (
                    float(fv.mean()) if fv.size else float("nan")
                )
                rows[i][f"std_{fkey}_Loc"] = (
                    float(fv.std(ddof=1)) if fv.size > 1 else float("nan")
                )
                rows[i][f"mean_{bkey}_Loc"] = (
                    float(bv.mean()) if bv.size else float("nan")
                )
                rows[i][f"std_{bkey}_Loc"] = (
                    float(bv.std(ddof=1)) if bv.size > 1 else float("nan")
                )
        except Exception:
            pass

    # CPPS over voiced segments (reference :253-301)
    for i in range(n):
        rows[i]["Cepstral_Peak_Prominence"] = cpp_vals[i]

    # Spectral moments over voiced frames (reference :340-376)
    for i in range(n):
        if main_tracks[i] is None:
            continue
        g, s, sk, ku = moments[i]
        rows[i]["Spectral_Gravity"], rows[i]["Spectral_Std_Dev"] = g, s
        rows[i]["Spectral_Skewness"], rows[i]["Spectral_Kurtosis"] = sk, ku

    return rows


def extract_mshds_single(
    x: np.ndarray, sr: float = 16000
) -> Dict[str, float]:
    """All 25 MSHDS features for one mono 16 kHz waveform (a one-file corpus
    through :func:`_extract_corpus`, so serial == batch by construction)."""
    return _extract_corpus([np.asarray(x)], sr, verbose=False)[0]


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
    ``n_workers`` is kept for API compatibility; extraction is corpus-batched
    on device rather than thread-parallel per file.
    """
    from ..audio.io import load_mono_16k

    if input_df.empty:
        return pd.DataFrame(columns=["filename"] + FEATURE_NAMES)

    names = [os.path.basename(p) for p in input_df[audio_file_column]]
    paths = list(input_df[audio_file_column])
    xs = []
    ok = []
    for idx, name in enumerate(names):
        try:
            if waveforms is not None and name in waveforms:
                xs.append(np.asarray(waveforms[name], dtype=np.float64))
            else:
                xs.append(load_mono_16k(paths[idx]).astype(np.float64))
            ok.append(True)
        except Exception as e:
            if verbose:
                print(f"ERROR processing '{name}': {e}. Appending NaNs.")
            xs.append(np.zeros(0))
            ok.append(False)

    feats = _extract_corpus(xs, 16000, verbose=verbose)
    rows = []
    for i, name in enumerate(names):
        if ok[i]:
            rows.append({"filename": name,
                         **{k: feats[i].get(k, float("nan"))
                            for k in FEATURE_NAMES}})
        else:
            rows.append({"filename": name,
                         **dict.fromkeys(FEATURE_NAMES, float("nan"))})
    return pd.DataFrame(rows)


def extract_mshds_batch(
    waveforms: Mapping[str, np.ndarray],
    sr: float = 16000,
    n_workers: int = 4,
    verbose: bool = True,
    devices=None,
) -> pd.DataFrame:
    """Corpus-batched MSHDS extraction over pre-decoded waveforms (same
    staged pipeline as :func:`extract_mshds_features`).

    ``devices`` (a list of ``jax.Device``) partitions the corpus into one
    sub-corpus per device and runs each through the staged pipeline on its
    own chip from its own host thread — the MSHDS multi-chip scaling axis.
    Unlike the openSMILE (B, L) bucket stacks, this pipeline works on ONE
    concatenated corpus buffer with host decisions between levels, so the
    natural partition is by file group, not by batch-axis sharding; per-file
    results match the single-device run to float precision (the same
    per-file programs run, only the corpus-buffer grouping and placement
    differ). Replaces the reference's serial per-file Praat loop
    (src/mshds_extractor.py:408) at corpus scale."""
    names = list(waveforms.keys())
    xs = [np.asarray(waveforms[n], dtype=np.float64).reshape(-1) for n in names]
    if not names:
        return pd.DataFrame(columns=["filename"] + FEATURE_NAMES)
    if devices is not None and len(devices) > 1 and len(names) > 1:
        import concurrent.futures

        import jax

        n_groups = min(len(devices), len(names))
        group_idx = [
            list(range(g, len(names), n_groups)) for g in range(n_groups)
        ]

        def run_group(g: int):
            with jax.default_device(devices[g]):
                return _extract_corpus(
                    [xs[i] for i in group_idx[g]], sr, verbose=False
                )

        feats: list = [None] * len(names)
        with concurrent.futures.ThreadPoolExecutor(max_workers=n_groups) as pool:
            for g, group_feats in enumerate(pool.map(run_group, range(n_groups))):
                for i, f in zip(group_idx[g], group_feats):
                    feats[i] = f
    else:
        feats = _extract_corpus(xs, sr, verbose=verbose)
    return pd.DataFrame([
        {"filename": name,
         **{k: feats[i].get(k, float("nan")) for k in FEATURE_NAMES}}
        for i, name in enumerate(names)
    ])
