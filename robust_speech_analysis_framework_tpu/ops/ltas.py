"""Long-term average spectrum, pitch-corrected (Praat ``To Ltas
(pitch-corrected)...``), with the slope/tilt statistics the reference reads
from it (src/mshds_extractor.py:241-248).

The pitch-corrected LTAS removes the F0 comb from the long-term spectrum by
analyzing whole fundamental periods: glottal pulses segment the voiced
signal into periods; consecutive periods whose durations lie within
[shortest, longest] and whose neighbor ratio is ≤ max_period_factor are each
Fourier-analyzed and their power accumulated into fixed-bandwidth frequency
bins, energy-normalized per period. Slope = difference of dB band energies
(low vs high band); tilt = robust straight-line fit of dB vs frequency.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import numpy as np

from .cepstrum import _robust_line_fit


class Ltas(NamedTuple):
    freqs: np.ndarray  # bin centers (Hz)
    power_db: np.ndarray

    def band_energy_db(self, f1: float, f2: float) -> float:
        mask = (self.freqs >= f1) & (self.freqs < f2)
        if not mask.any():
            return float("nan")
        p = np.power(10.0, self.power_db[mask] / 10.0)
        return float(10.0 * np.log10(np.mean(p)))

    def slope_db(self, lo1: float, hi1: float, lo2: float, hi2: float) -> float:
        """Praat 'Get slope: lo1, hi1, lo2, hi2, dB' = low-band energy minus
        high-band energy, in dB."""
        return self.band_energy_db(lo1, hi1) - self.band_energy_db(lo2, hi2)

    def spectral_tilt(self, fmin: float, fmax: float) -> float:
        """Robust linear fit of dB over [fmin, fmax]; returns dB/Hz slope
        (the 'Slope:' line of Praat's 'Report spectral tilt ... Robust')."""
        mask = (self.freqs >= fmin) & (self.freqs <= fmax) & np.isfinite(self.power_db)
        if mask.sum() < 3:
            return float("nan")
        slope, _ = _robust_line_fit(
            self.freqs[mask], self.power_db[None, mask]
        )
        return float(slope[0])


def ltas_pitch_corrected(
    x: np.ndarray,
    sr: float,
    pulses: np.ndarray,
    max_frequency: float = 5000.0,
    bandwidth: float = 100.0,
    shortest_period: float = 1e-4,
    longest_period: float = 0.02,
    max_period_factor: float = 1.3,
) -> Ltas:
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    n_bins = int(round(max_frequency / bandwidth))
    accum = np.zeros(n_bins)
    n_periods = 0

    periods = np.diff(pulses)
    for i, T in enumerate(periods):
        if not (shortest_period <= T <= longest_period):
            continue
        if i > 0 and periods[i - 1] > 0:
            ratio = max(T / periods[i - 1], periods[i - 1] / T)
            if ratio > max_period_factor:
                continue
        a = int(round(pulses[i] * sr))
        b = int(round(pulses[i + 1] * sr))
        if b <= a + 2 or b > len(x):
            continue
        seg = x[a:b]
        n_fft = 1 << int(math.ceil(math.log2(max(len(seg) * 4, 64))))
        spec = np.abs(np.fft.rfft(seg, n_fft)) ** 2
        freqs = np.arange(len(spec)) * sr / n_fft
        # accumulate into fixed-bandwidth bins, normalizing per period energy
        idx = np.clip((freqs / bandwidth).astype(int), 0, n_bins - 1)
        e = spec.sum() or 1.0
        np.add.at(accum, idx, spec / e)
        n_periods += 1

    if n_periods == 0:
        return Ltas(
            (np.arange(n_bins) + 0.5) * bandwidth, np.full(n_bins, np.nan)
        )
    accum /= n_periods
    power_db = 10.0 * np.log10(np.maximum(accum, 1e-30))
    return Ltas((np.arange(n_bins) + 0.5) * bandwidth, power_db)
