"""Characterize the three documented Praat approximations (PARITY.md).

No Praat binary exists in this environment, so the three deliberate
approximations cannot be diffed against a live oracle. These tests do the
next best thing (VERDICT r3 item 9): for each approximation they build a
CONSTRUCTED case where the approximated choice measurably changes the
answer, pin OUR behavior on it, and measure the divergence an oracle run
could reveal — so when a live Praat appears, the failure mode is already
characterized and bounded.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# 1. CPPS smoothing kernel: truncated Gaussian (σ = window/4) vs Praat's
#    documented Gaussian / debug-rectangular alternatives
#    (ops/cepstrum._gauss_kernel; PARITY.md approximation 1).
# ---------------------------------------------------------------------------

def _alternating_cepstrogram():
    """A cepstrogram whose peak height alternates hard frame-to-frame:
    time smoothing kernels with different shapes average the alternation
    differently, so CPPS separates Gaussian from rectangular smoothing —
    real-speech cepstrograms vary slowly and hide the kernel shape."""
    from robust_speech_analysis_framework_tpu.ops.cepstrum import (
        PowerCepstrogram,
    )

    sr = 16000.0
    times = np.arange(40) * 0.002
    quefrencies = np.arange(200) / sr  # up to 12.4 ms
    db = np.full((len(times), len(quefrencies)), -40.0)
    peak_bin = 80  # 5 ms -> 200 Hz, inside the [60, 330] Hz search band
    heights = np.where(np.arange(len(times)) % 2 == 0, 0.0, -30.0)
    db[:, peak_bin] = heights
    return PowerCepstrogram(times, quefrencies, db)


def test_cpps_gaussian_vs_rectangular_kernel_is_distinguishable():
    """Pin our Gaussian-smoothed CPPS on the alternating construction and
    measure the divergence a rectangular smoothing kernel would produce.

    Implied oracle bound: if Praat's `Get CPPS` smoothing were rectangular
    rather than Gaussian, our CPPS would diverge by the measured delta
    (>0.3 dB on this construction) on strongly frame-alternating
    cepstrograms; slowly-varying real-speech cepstrograms shrink the
    kernel-shape sensitivity far below that."""
    from unittest import mock

    from robust_speech_analysis_framework_tpu.ops import cepstrum

    cg = _alternating_cepstrogram()
    ours, _ = cepstrum.cpps(cg)

    def rect_kernel(n_window: int) -> np.ndarray:
        half = n_window // 2
        return np.ones(2 * half + 1)

    with mock.patch.object(cepstrum, "_gauss_kernel", rect_kernel):
        rect, _ = cepstrum.cpps(cg)

    assert np.isfinite(ours) and np.isfinite(rect)
    # the construction genuinely distinguishes the kernel shapes
    assert abs(ours - rect) > 0.3, (ours, rect)
    # and our Gaussian behavior is pinned (deterministic host math)
    assert ours == pytest.approx(PINNED_CPPS_GAUSSIAN, rel=1e-6)


# ---------------------------------------------------------------------------
# 2. Pitch-corrected LTAS bin grid: zero-padded pow2 DTFT grid vs Praat's
#    exact-period-length DFT grid (ops/ltas; PARITY.md approximation 2).
# ---------------------------------------------------------------------------

def _pulse_train(sr: int = 16000, f0: float = 100.0, seconds: float = 0.5):
    """Identical damped-resonance periods -> an exactly periodic signal
    whose spectrum BETWEEN harmonics is pure window leakage: the exact
    period-length grid samples only the harmonics (bins at k·f0), while
    the zero-padded pow2 grid also integrates the leakage skirt."""
    period = int(round(sr / f0))
    t = np.arange(period) / sr
    p = np.exp(-t * 700.0) * np.sin(2 * np.pi * 1500.0 * t)
    n_periods = int(seconds * f0)
    x = np.tile(p, n_periods)
    pulses = (np.arange(1, n_periods) * period + period // 2) / sr
    return x, pulses, period


def _exact_grid_ltas(x, sr, pulses, period, n_bins=50, bandwidth=100.0):
    """Praat-style oracle: each accepted period analyzed on its OWN
    exact-length DFT grid (bins at k·sr/len), same selection, energy scale
    and ceil-band mapping as ops/ltas (f=0 dropped), normalized by
    per-band contributing-bin counts."""
    t_mid = pulses[1:-1]
    left = t_mid - pulses[:-2]
    right = pulses[2:] - t_mid
    ok = (
        (left >= 1e-4) & (left <= 0.02) & (right >= 1e-4) & (right <= 0.02)
        & (np.maximum(left / right, right / left) <= 1.3)
    )
    a = np.round((t_mid - 0.5 * left) * sr).astype(int)
    b = np.round((t_mid + 0.5 * right) * sr).astype(int)
    ok &= (a >= 0) & (b > a + 2) & (b <= len(x))
    accum = np.zeros(n_bins)
    counts = np.zeros(n_bins)
    for ai, bi in zip(a[ok], b[ok]):
        seg = x[ai:bi]
        L = len(seg)
        spec = np.fft.rfft(seg, n=L)
        f_bins = np.arange(len(spec)) * sr / L
        bin_raw = np.ceil(f_bins / bandwidth).astype(int) - 1
        in_range = (bin_raw >= 0) & (bin_raw < n_bins)
        energy = (np.abs(spec) ** 2) * 2.0 / (L * sr)
        np.add.at(accum, bin_raw[in_range], energy[in_range])
        np.add.at(counts, bin_raw[in_range], 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        power = accum / np.maximum(counts, 1)
    return 10.0 * np.log10(np.maximum(power / 4e-10, 1e-30))


def test_ltas_pow2_grid_vs_exact_period_grid_divergence_bounded():
    """Pin our pow2-grid LTAS spectral tilt on an exactly periodic pulse
    train and bound its divergence from the exact-period-grid (Praat)
    evaluation of the same periods.

    Measured characterization (the implied oracle bounds): the grid
    choice shifts ABSOLUTE per-band levels by a large, near-UNIFORM
    offset (~−10.9 dB mean here: count-normalizing over the pow2 grid's
    leakage bins dilutes every band alike), but preserves the band-to-band
    SHAPE — the only thing MSHDS consumes: the per-band offset's std is
    <1.5 dB, the Praat slope statistic (low/high band energy difference)
    agrees within 1 dB, and the robust spectral-tilt fit within 1e-4
    dB/Hz. A live-Praat diff should therefore match tilt/slope tightly
    while absolute band levels may sit on a constant offset."""
    from robust_speech_analysis_framework_tpu.ops.cepstrum import (
        _robust_line_fit,
    )
    from robust_speech_analysis_framework_tpu.ops.ltas import (
        Ltas, ltas_pitch_corrected,
    )

    sr = 16000
    x, pulses, period = _pulse_train(sr)
    ours = ltas_pitch_corrected(x, sr, pulses)
    exact_db = _exact_grid_ltas(x, sr, pulses, period)
    exact = Ltas(ours.freqs, exact_db)

    # the construction genuinely distinguishes the grids per band ...
    off = ours.power_db - exact_db
    assert abs(off.mean()) > 5.0
    # ... as a near-uniform level offset (shape preserved)
    assert off.std() < 1.5, off.std()

    # the consumed statistics are robust to the grid choice
    slope_delta = abs(
        ours.slope_db(0, 1000, 1000, 4000) - exact.slope_db(0, 1000, 1000, 4000)
    )
    assert slope_delta < 1.0, slope_delta

    tilt_ours = ours.spectral_tilt(100.0, 5000.0)  # dB/Hz
    freqs = (np.arange(50) + 0.5) * 100.0
    m = (freqs >= 100.0) & (freqs <= 5000.0) & np.isfinite(exact_db)
    tilt_exact = float(_robust_line_fit(freqs[m], exact_db[None, m])[0][0])
    assert abs(tilt_ours - tilt_exact) < 1e-4, (tilt_ours, tilt_exact)
    assert tilt_ours == pytest.approx(PINNED_LTAS_TILT, rel=1e-5)


# ---------------------------------------------------------------------------
# 3. Harmonicity search ceiling: 10·minimum_pitch instead of Praat's
#    Nyquist-ceiling candidate machinery (ops/harmonicity._hnr_from_r;
#    PARITY.md approximation 3).
# ---------------------------------------------------------------------------

def test_harmonicity_ceiling_binds_above_10x_pitch_floor():
    """Pin the documented failure mode: a voice with F0 above
    10·minimum_pitch has its true lag EXCLUDED from the search band, so
    the correlation peak is taken at a period multiple, whose windowed
    estimate is lower → HNR is underestimated relative to a search that
    admits the true lag.

    Implied oracle bound: for F0 = 12× the pitch floor with random-walk
    phase jitter (so correlation DECAYS with lag — a strictly periodic
    tone would correlate equally at every period multiple and hide the
    ceiling), admitting the true lag recovers ~4 dB of HNR on this
    construction; Praat (Nyquist ceiling + path finder) would sit at or
    above the admitted-lag value. Voices with F0 ≤ 10× the floor (every
    Androids speaker) are unaffected — the ceiling exceeds their F0 by
    construction."""
    from robust_speech_analysis_framework_tpu.ops.harmonicity import (
        harmonicity_cc,
    )

    sr = 16000
    rng = np.random.default_rng(5)
    f0 = 900.0  # 12 × the 75 Hz floor: true lag ~17.8 samples < lag_min 21
    n = int(0.4 * sr)
    t = np.arange(n) / sr
    phase = 2 * np.pi * f0 * t + np.cumsum(rng.normal(0, 0.02, size=n))
    x = np.sin(phase) + 0.005 * rng.normal(size=n)

    ceiling_bound = harmonicity_cc(x, sr, minimum_pitch=75.0)
    # admit the true lag by raising the floor (ceiling 10×100 = 1000 Hz);
    # the window also shortens, which only reduces the correlation estimate
    # — so the gain below is attributable to admitting the true lag
    true_lag_ok = harmonicity_cc(x, sr, minimum_pitch=100.0)

    a = float(np.nanmedian(ceiling_bound.hnr_db))
    b = float(np.nanmedian(true_lag_ok.hnr_db))
    assert np.isfinite(a) and np.isfinite(b)
    assert b - a >= 1.0, (a, b)  # the ceiling measurably binds
    assert a == pytest.approx(PINNED_HNR_CEILING_BOUND, abs=1e-3)


# Pinned values: computed once on this rig's numpy/jax-cpu stack; they
# freeze OUR current behavior so any refactor that silently changes an
# approximated quantity fails loudly here rather than drifting.
PINNED_CPPS_GAUSSIAN = 27.125132697210585      # rect kernel: 26.1985
PINNED_LTAS_TILT = -0.005259204152977308       # exact grid: -0.0052534
PINNED_HNR_CEILING_BOUND = 19.85970687866211   # true lag admitted: 24.056
