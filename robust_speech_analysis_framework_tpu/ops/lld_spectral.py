"""Frame-level spectral LLDs (openSMILE ``cSpectral`` bank).

Implements the 16 spectral descriptors the Androids configuration enables
(Androids.conf:258-280): relative band energies 250-650 / 1000-4000 Hz,
roll-off points at 25/50/75/90%, flux, centroid, entropy, variance,
skewness, kurtosis, slope, sharpness, harmonicity, flatness — all computed
from the shared framed magnitude spectrum, fully batched over frames (and
over files when stacked), jit-compatible.

Definitions follow openSMILE's documented semantics: energy quantities use
the squared magnitude; moments treat the normalized power spectrum as a
distribution over Hz; sharpness is the Zwicker/Bark-weighted centroid;
harmonicity is the mean peak-to-adjacent-valley contrast of the magnitude
spectrum; flatness is the geometric/arithmetic mean ratio of power.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

SPECTRAL_NAMES: List[str] = [
    "fftMag_spectralEnergyInBand250-650",
    "fftMag_spectralEnergyInBand1000-4000",
    "fftMag_spectralRollOff25.0",
    "fftMag_spectralRollOff50.0",
    "fftMag_spectralRollOff75.0",
    "fftMag_spectralRollOff90.0",
    "fftMag_spectralFlux",
    "fftMag_spectralCentroid",
    "fftMag_spectralEntropy",
    "fftMag_spectralVariance",
    "fftMag_spectralSkewness",
    "fftMag_spectralKurtosis",
    "fftMag_spectralSlope",
    "fftMag_spectralSharpness",
    "fftMag_spectralHarmonicity",
    "fftMag_spectralFlatness",
]


def _hz_to_bark(f):
    return 13.0 * jnp.arctan(0.00076 * f) + 3.5 * jnp.arctan((f / 7500.0) ** 2)


@partial(jax.jit, static_argnums=(1,))
def spectral_llds(mag: jnp.ndarray, sr: float) -> jnp.ndarray:
    """All 16 descriptors. mag: (T, F) magnitude spectrum → (T, 16)."""
    t, n_bins = mag.shape
    freqs = jnp.arange(n_bins) * (sr / 2.0) / (n_bins - 1)
    power = mag * mag
    total_p = jnp.maximum(power.sum(axis=1, keepdims=True), 1e-30)

    def band_energy(lo, hi):
        m = ((freqs >= lo) & (freqs < hi)).astype(mag.dtype)
        return (power * m[None, :]).sum(axis=1) / total_p[:, 0]

    band1 = band_energy(250.0, 650.0)
    band2 = band_energy(1000.0, 4000.0)

    csum = jnp.cumsum(power, axis=1) / total_p
    def rolloff(q):
        reached = csum >= q
        idx = jnp.argmax(reached, axis=1)
        return freqs[idx]

    roll = [rolloff(q) for q in (0.25, 0.50, 0.75, 0.90)]

    # Flux: L2 difference of energy-normalized magnitude spectra.
    norm_mag = mag / jnp.maximum(
        jnp.sqrt((mag * mag).sum(axis=1, keepdims=True)), 1e-30
    )
    diff = norm_mag[1:] - norm_mag[:-1]
    flux_tail = jnp.sqrt((diff * diff).sum(axis=1))
    flux = jnp.concatenate([flux_tail[:1] * 0.0, flux_tail])

    p_norm = power / total_p
    centroid = (p_norm * freqs[None, :]).sum(axis=1)
    entropy = -(p_norm * jnp.log(jnp.maximum(p_norm, 1e-30))).sum(axis=1)
    d = freqs[None, :] - centroid[:, None]
    variance = (p_norm * d * d).sum(axis=1)
    # the moment-denominator floor must keep std³ and variance² normal in
    # f32: a 1e-30 floor gives 1e-45/1e-60 denominators that flush to zero
    # and turn digitally-silent frames into 0/0 = NaN (which then poisons
    # every skewness/kurtosis functional of the file). Real speech frames
    # have spectral variance ≥ O(10⁴ Hz²), so a 1e-6 floor only fires on
    # silence, where the zero numerator makes the moments 0.
    var_f = jnp.maximum(variance, 1e-6)
    std = jnp.sqrt(var_f)
    skew = (p_norm * d**3).sum(axis=1) / (var_f * std)
    kurt = (p_norm * d**4).sum(axis=1) / (var_f * var_f)

    f_mean = freqs.mean()
    f_var = jnp.mean((freqs - f_mean) ** 2)
    slope = ((mag - mag.mean(axis=1, keepdims=True)) * (freqs - f_mean)[None, :]).mean(
        axis=1
    ) / jnp.maximum(f_var, 1e-30)

    bark = _hz_to_bark(freqs)
    g = jnp.where(bark < 15.8, 1.0, 0.15 * jnp.exp(0.42 * (bark - 15.8)) + 0.85)
    sharp_num = (p_norm * g[None, :] * bark[None, :]).sum(axis=1)
    sharp_den = jnp.maximum(p_norm.sum(axis=1), 1e-30)
    sharpness = 0.11 * sharp_num / sharp_den

    # Harmonicity: mean local peak-to-valley contrast of the magnitude.
    prev = jnp.concatenate([mag[:, :1], mag[:, :-1]], axis=1)
    nxt = jnp.concatenate([mag[:, 1:], mag[:, -1:]], axis=1)
    is_peak = (mag > prev) & (mag > nxt)
    is_valley = (mag < prev) & (mag < nxt)
    peak_mean = (mag * is_peak).sum(axis=1) / jnp.maximum(is_peak.sum(axis=1), 1)
    valley_mean = (mag * is_valley).sum(axis=1) / jnp.maximum(is_valley.sum(axis=1), 1)
    harmonicity = peak_mean - valley_mean

    log_p = jnp.log(jnp.maximum(power, 1e-30))
    flatness = jnp.exp(log_p.mean(axis=1)) / jnp.maximum(power.mean(axis=1), 1e-30)

    return jnp.stack(
        [band1, band2, *roll, flux, centroid, entropy, variance, skew, kurt,
         slope, sharpness, harmonicity, flatness],
        axis=1,
    )


def zero_crossing_rate(frames: jnp.ndarray) -> jnp.ndarray:
    """cMZcr zcr: sign-change count per frame divided by frame length,
    computed on the raw pre-window frames (Androids.conf:125-132)."""
    s = jnp.sign(frames)
    changes = (s[..., 1:] * s[..., :-1] < 0).sum(axis=-1)
    return changes / frames.shape[-1]


def rms_energy(win_frames: jnp.ndarray) -> jnp.ndarray:
    """cEnergy rms=1 log=0 on windowed frames."""
    return jnp.sqrt(jnp.mean(win_frames * win_frames, axis=-1))


def intensity_loudness(win_frames: jnp.ndarray) -> jnp.ndarray:
    """cIntensity: Hamming-normalized frame power I, and loudness (I/I0)^0.3
    with I0 = 10⁻⁶ (openSMILE's narrow-band approximation)."""
    i0 = 1.0e-6
    intensity = jnp.mean(win_frames * win_frames, axis=-1)
    loudness = (intensity / i0) ** 0.3
    return jnp.stack([intensity, loudness], axis=-1)
