from .pitch import PitchParams, PitchTrack, pitch_track_ac, pitch_track_cc
from .intensity import IntensityContour, intensity_contour
from .harmonicity import HarmonicityContour, harmonicity_cc
from .formants import FormantTrack, burg_coeffs, durand_kerner_roots, formant_track_burg
from .spectral import spectrogram, spectral_moments, voiced_mean_moments
from .cepstrum import PowerCepstrogram, cpps, power_cepstrogram
from .ltas import Ltas, ltas_pitch_corrected
from .pulses import point_process_cc, silence_intervals, vuv_intervals
from .shs_pitch import ShsParams, shs_pitch, shs_pitch_batch
from .jitter import jitter_shimmer_llds, mark_periods
from .functionals import (
    FUNCTIONAL_NAMES,
    apply_functionals,
    delta_regression,
    smooth_sma,
)
from .lld_spectral import SPECTRAL_NAMES, spectral_llds, zero_crossing_rate
from .dft import autocorr, cross_corr, rfft_mag, rfft_power

__all__ = [
    "PitchParams", "PitchTrack", "pitch_track_ac", "pitch_track_cc",
    "IntensityContour", "intensity_contour",
    "HarmonicityContour", "harmonicity_cc",
    "FormantTrack", "burg_coeffs", "durand_kerner_roots", "formant_track_burg",
    "spectrogram", "spectral_moments", "voiced_mean_moments",
    "PowerCepstrogram", "cpps", "power_cepstrogram",
    "Ltas", "ltas_pitch_corrected",
    "point_process_cc", "silence_intervals", "vuv_intervals",
    "ShsParams", "shs_pitch", "shs_pitch_batch",
    "jitter_shimmer_llds", "mark_periods",
    "FUNCTIONAL_NAMES", "apply_functionals", "delta_regression", "smooth_sma",
    "SPECTRAL_NAMES", "spectral_llds", "zero_crossing_rate",
    "autocorr", "cross_corr", "rfft_mag", "rfft_power",
]
