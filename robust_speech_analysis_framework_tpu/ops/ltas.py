"""Long-term average spectrum, pitch-corrected (Praat ``To Ltas
(pitch-corrected)...``), with the slope/tilt statistics the reference reads
from it (src/mshds_extractor.py:241-248).

Praat's algorithm (fon/Ltas.cpp PointProcess_Sound_to_Ltas): for every
INTERIOR pulse whose left and right intervals both lie within
[shortest, longest] and whose mutual ratio is ≤ max_period_factor, the
pulse-centered stretch [t − left/2, t + right/2] is Fourier-analyzed; each
spectrum bin's energy |X|²·2·df is added to band ceil(f/bandwidth) (f = 0
is dropped) and the band's contribution COUNT incremented; final band level
is 10·log10(energy / count · duration / 4e-10). There is no per-period
normalization — louder periods weigh more, as in Praat. One deliberate
approximation: Praat evaluates each period's spectrum at its exact-length
DFT grid (bins at local harmonics); here the same smooth single-period DTFT
is sampled on the zero-padded pow2 grid instead (denser sampling of the
same envelope, count-normalized per band), which keeps the analysis a
shared-basis GEMM per FFT-size group. Slope = difference of dB band
energies (low vs high band); tilt = robust straight-line fit of dB vs
frequency.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cepstrum import _robust_line_fit


@partial(jax.jit, static_argnums=(5, 6, 7))
def _ltas_group_device(
    x_cat, starts, lens, file_ids, bin_mat,
    l_max: int, n_fft: int, n_files: int,
):
    """Device-side LTAS accumulation for one FFT-size group: gather each
    period's samples (zero-masked beyond its own length), power spectrum via
    the GEMM DFT, per-period energy normalization, scatter into
    fixed-bandwidth bins (a matmul with a 0/1 bin-indicator), and a
    segment-sum per file. Only (n_files, n_bins) floats transfer back."""
    from .dft import rfft_power
    from .framing import gather_frames

    fr = gather_frames(x_cat, starts, l_max)
    mask = jnp.arange(l_max)[None, :] < lens[:, None]
    fr = fr * mask
    spec = rfft_power(fr, n_fft)
    # raw energy accumulation (Praat has no per-period normalization);
    # bin_mat carries the 2·df·dt² energy scale and the in-band selection
    binned = jnp.matmul(spec, bin_mat, preferred_element_type=jnp.float32)
    return jax.ops.segment_sum(binned, file_ids, num_segments=n_files)


class Ltas(NamedTuple):
    freqs: np.ndarray  # bin centers (Hz)
    power_db: np.ndarray

    def band_energy_db(self, f1: float, f2: float) -> float:
        mask = (self.freqs >= f1) & (self.freqs < f2) & np.isfinite(self.power_db)
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
    return ltas_pitch_corrected_batch(
        [x], sr, [pulses], max_frequency, bandwidth,
        shortest_period, longest_period, max_period_factor,
    )[0]


def ltas_pitch_corrected_batch(
    xs,
    sr: float,
    pulses_list,
    max_frequency: float = 5000.0,
    bandwidth: float = 100.0,
    shortest_period: float = 1e-4,
    longest_period: float = 0.02,
    max_period_factor: float = 1.3,
    buf=None,
    defer: bool = False,
) -> "list[Ltas]":
    """Vectorized pitch-corrected LTAS over many files at once.

    Period selection is vectorized per file; the per-period Fourier analyses
    are grouped by FFT size and either batched on the host (no ``buf``) or
    run on device against an uploaded ``ops.framing.CorpusBuffer``
    (:func:`_ltas_group_device`, one program + one tiny transfer per FFT
    size). Same period-validity rules as Praat's Ltas (pitch-corrected):
    duration in [shortest, longest], neighbor-period ratio ≤
    max_period_factor.
    """
    n_bins = int(round(max_frequency / bandwidth))
    freqs_out = (np.arange(n_bins) + 0.5) * bandwidth

    # Collect valid periods across all files: (file_idx, a_sample, length).
    file_ids, seg_a, seg_len = [], [], []
    if buf is not None:
        xs = buf.xs
    xs = [np.asarray(x, dtype=np.float64).reshape(-1) for x in xs]
    for fi, (x, pulses) in enumerate(zip(xs, pulses_list)):
        pulses = np.asarray(pulses, dtype=np.float64).reshape(-1)
        if len(pulses) < 3:
            continue
        # interior pulses: windows [t_i − left/2, t_i + right/2] accepted
        # when BOTH neighbor intervals are in range and their mutual factor
        # is small (Praat PointProcess_Sound_to_Ltas)
        t_mid = pulses[1:-1]
        left = pulses[1:-1] - pulses[:-2]
        right = pulses[2:] - pulses[1:-1]
        with np.errstate(invalid="ignore", divide="ignore"):
            factor = np.maximum(left / right, right / left)
        ok = (
            (left >= shortest_period) & (left <= longest_period)
            & (right >= shortest_period) & (right <= longest_period)
            & (factor <= max_period_factor)
        )
        a = np.round((t_mid - 0.5 * left) * sr).astype(int)
        b = np.round((t_mid + 0.5 * right) * sr).astype(int)
        ok &= (a >= 0) & (b > a + 2) & (b <= len(x))
        if not ok.any():
            continue
        file_ids.append(np.full(int(ok.sum()), fi))
        seg_a.append(a[ok])
        seg_len.append((b - a)[ok])

    accum = np.zeros((len(xs), n_bins))
    counts = np.zeros((len(xs), n_bins))  # per-band contributing-bin counts
    device_parts = []  # per-group device accumulators; summed + synced ONCE
    if file_ids:
        file_ids = np.concatenate(file_ids)
        seg_a = np.concatenate(seg_a)
        seg_len = np.concatenate(seg_len)
        n_ffts = np.power(
            2, np.ceil(np.log2(np.maximum(seg_len * 4, 64))).astype(int)
        )
        for n_fft in np.unique(n_ffts):
            sel = n_ffts == n_fft
            fids, aa, ll = file_ids[sel], seg_a[sel], seg_len[sel]
            f_bins = np.arange(int(n_fft) // 2 + 1) * sr / n_fft
            # Praat's band index is ceiling(f / bandwidth): f = 0 is
            # DROPPED (iband 0) and bins above the LTAS maximum frequency
            # are discarded — clipping them onto the top band used to fold
            # all 5-8 kHz energy into the 4950 Hz bin and bias the
            # Spectral_Tilt fit, whose mask includes that bin center
            bin_raw = np.ceil(f_bins / bandwidth).astype(int) - 1  # 0-based
            in_range = (bin_raw >= 0) & (bin_raw < n_bins)
            bin_idx = np.clip(bin_raw, 0, n_bins - 1)
            # energy per spectrum bin = |X·dt|²·2·df (Praat Spectrum
            # convention); df = sr/n_fft, dt = 1/sr → scale 2/(n_fft·sr)
            scale = 2.0 / (int(n_fft) * sr)
            colsum = np.zeros(n_bins)
            np.add.at(colsum, bin_idx[in_range], 1.0)
            np.add.at(counts, fids, colsum[None, :])
            if buf is not None:
                from .bucketing import pad_frames

                l_max = int(n_fft) // 4  # pow2ceil(4·len) ⇒ len ≤ n_fft/4
                starts = aa + buf.offsets[fids]
                starts_p, n_real = pad_frames(starts.astype(np.int32)[:, None])
                lens_p, _ = pad_frames(ll.astype(np.int32)[:, None])
                fids_p, _ = pad_frames(fids.astype(np.int32)[:, None])
                lens_p = lens_p.copy()
                lens_p[n_real:] = 0  # padded rows contribute zero spectra
                bin_mat = np.zeros((len(f_bins), n_bins), np.float32)
                bin_mat[np.arange(len(f_bins))[in_range], bin_idx[in_range]] = scale
                # Dispatch is async: every group's program is enqueued
                # without waiting; the single np.asarray below pays ONE
                # tunnel round trip for the whole LTAS stage instead of one
                # per FFT-size group.
                device_parts.append(_ltas_group_device(
                    buf.x_cat, jnp.asarray(starts_p[:, 0]),
                    jnp.asarray(lens_p[:, 0]), jnp.asarray(fids_p[:, 0]),
                    jnp.asarray(bin_mat), l_max, int(n_fft), len(xs),
                ))
                continue
            l_max = int(ll.max())
            # gather each period's samples, zero beyond its own length
            gat = np.arange(l_max)[None, :]
            mat = np.zeros((len(aa), l_max))
            for j, fi in enumerate(np.unique(fids)):
                rows = fids == fi
                idx = aa[rows, None] + gat
                m = np.take(xs[fi], np.minimum(idx, len(xs[fi]) - 1))
                mat[rows] = m
            mat *= gat < ll[:, None]
            spec = np.abs(np.fft.rfft(mat, int(n_fft), axis=1)) ** 2 * scale
            spec *= in_range[None, :]
            flat_idx = (fids[:, None] * n_bins + bin_idx[None, :]).ravel()
            np.add.at(accum.ravel(), flat_idx, spec.ravel())

    from .framing import Deferred

    n_files_out = len(xs)
    total = None
    if device_parts:
        total = device_parts[0]
        for p in device_parts[1:]:
            total = total + p

    durations = np.asarray([len(x) / sr for x in xs])

    def _finalize(total_host):
        acc = accum
        if total_host is not None:
            acc = acc + np.asarray(total_host, dtype=np.float64)
        out = []
        for fi in range(n_files_out):
            with np.errstate(divide="ignore", invalid="ignore"):
                # Praat: 10·log10(energy / count · duration / 4e-10);
                # bands no period touched are undefined (NaN)
                level = acc[fi] / counts[fi] * durations[fi] / 4.0e-10
            power_db = np.where(
                counts[fi] > 0, 10.0 * np.log10(np.maximum(level, 1e-300)),
                np.nan,
            )
            out.append(Ltas(freqs_out, power_db))
        return out

    d = Deferred(total, _finalize)
    return d if defer else d.result()
