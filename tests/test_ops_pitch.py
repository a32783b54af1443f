"""Pitch/intensity/harmonicity op tests on synthetic signals."""

import numpy as np
import pytest

from robust_speech_analysis_framework_tpu.ops.pitch import (
    pitch_track_ac,
    pitch_track_cc,
    praat_frame_grid,
)
from robust_speech_analysis_framework_tpu.ops.intensity import intensity_contour
from robust_speech_analysis_framework_tpu.ops.harmonicity import harmonicity_cc

SR = 16000


def harmonic(f0, seconds=0.8, n_harm=9, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    x = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, n_harm))
    return (x / np.abs(x).max()).astype(np.float64)


def test_frame_grid_symmetric():
    n, t0 = praat_frame_grid(16000, 16000.0, 0.04, 0.01)
    assert n == 97
    # symmetric: centers span [t0, t0+(n-1)*dt] centered in [0, 1]
    assert t0 + (n - 1) * 0.01 + t0 == pytest.approx(1.0, abs=1e-9)


@pytest.mark.parametrize("f0", [100.0, 150.0, 220.0, 330.0])
def test_ac_pitch_accuracy(f0):
    pt = pitch_track_ac(harmonic(f0), SR, time_step=0.01, floor=75, ceiling=500)
    v = pt.f0[pt.f0 > 0]
    assert len(v) > 0.9 * len(pt.f0)
    assert abs(np.median(v) - f0) / f0 < 0.01


def test_cc_pitch_accuracy():
    pt = pitch_track_cc(harmonic(180.0), SR, time_step=0.01, floor=75, ceiling=500)
    v = pt.f0[pt.f0 > 0]
    assert abs(np.median(v) - 180.0) / 180.0 < 0.01


def test_noise_is_unvoiced():
    rng = np.random.default_rng(0)
    pt = pitch_track_ac(rng.normal(size=SR), SR, time_step=0.01, floor=75, ceiling=500)
    assert (pt.f0 > 0).mean() < 0.1


def test_silence_tone_boundary():
    x = np.concatenate([np.zeros(SR // 2), 0.5 * harmonic(150, 0.5)])
    pt = pitch_track_ac(x, SR, time_step=0.01, floor=75, ceiling=500)
    first_half = pt.f0[pt.times < 0.45]
    second_half = pt.f0[pt.times > 0.55]
    assert (first_half > 0).mean() < 0.1
    assert (second_half > 0).mean() > 0.8


def test_pitch_summary_stats():
    pt = pitch_track_ac(harmonic(150), SR, time_step=0.01, floor=75, ceiling=500)
    assert pt.mean_hz() == pytest.approx(150.0, rel=0.01)
    assert pt.std_semitones() < 0.2
    # value_at_time interpolation
    assert pt.value_at_time(0.4) == pytest.approx(150.0, rel=0.02)
    assert np.isnan(pt.value_at_time(-1.0))


def test_intensity_absolute_level():
    t = np.arange(SR) / SR
    x = 0.1 * np.sin(2 * np.pi * 1000 * t)
    ic = intensity_contour(x, SR, minimum_pitch=100, time_step=0.005)
    expected = 10 * np.log10((0.1**2 / 2) / 4e-10)
    assert ic.mean_db() == pytest.approx(expected, abs=0.05)
    assert ic.mean_energy_db() == pytest.approx(expected, abs=0.05)
    assert ic.max_db() >= ic.min_db()
    assert ic.quantile(0.5) == pytest.approx(expected, abs=0.1)


def test_intensity_contrast():
    t = np.arange(SR) / SR
    x = np.sin(2 * np.pi * 500 * t) * np.where(t < 0.5, 0.01, 0.3)
    ic = intensity_contour(x, SR, minimum_pitch=100, time_step=0.01)
    assert ic.max_db() - ic.min_db() > 20


def test_hnr_orders():
    clean = harmonic(150)
    rng = np.random.default_rng(1)
    noisy = clean + 0.1 * rng.normal(size=len(clean))
    h_clean = harmonicity_cc(clean, SR, 0.005, 75).mean_db()
    h_noisy = harmonicity_cc(noisy, SR, 0.005, 75).mean_db()
    assert h_clean > 30
    assert 5 < h_noisy < h_clean


def test_hnr_silence_undefined():
    x = np.concatenate([np.zeros(SR // 2), harmonic(150, 0.5)])
    h = harmonicity_cc(x, SR, 0.005, 75)
    early = h.hnr_db[h.times < 0.4]
    assert np.isnan(early).mean() > 0.8


def test_pitch_track_batch_matches_serial_and_handles_short_files():
    from robust_speech_analysis_framework_tpu.ops.pitch import (
        PitchParams,
        pitch_track_batch,
    )

    v = harmonic(150)
    xs = [v[:100], v, v[:50], 0.5 * harmonic(220)]  # short files interleaved
    tracks = pitch_track_batch(
        xs, SR, PitchParams(time_step=0.01, floor=75, ceiling=500)
    )
    assert len(tracks[0].f0) == 0 and len(tracks[2].f0) == 0
    for i in (1, 3):
        ref = pitch_track_ac(xs[i], SR, time_step=0.01, floor=75, ceiling=500)
        assert ((tracks[i].f0 > 0) == (ref.f0 > 0)).all()
        both = (ref.f0 > 0) & (tracks[i].f0 > 0)
        np.testing.assert_allclose(tracks[i].f0[both], ref.f0[both], atol=1e-3)


def test_transition_costs_scale_praat_style_with_time_step():
    """Praat's Pitch_pathFinder multiplies octaveJumpCost and
    voicedUnvoicedCost by 0.01/dx: a DENSER frame grid has more
    transitions per second, so each must cost more to keep the per-second
    penalty constant. With the inverted (dt/0.01) scaling, fine time steps
    under-penalize jumps — on this octave-ambiguous signal (alternating
    fundamental-present / second-harmonic-only stretches) the inverted
    convention produced 7 octave flips at dt=2.5 ms (regression)."""
    from robust_speech_analysis_framework_tpu.ops.pitch import pitch_track_ac

    rng = np.random.default_rng(0)
    t = np.arange(int(1.6 * SR)) / SR
    gate = ((t // 0.2).astype(int) % 2) == 0
    x = np.where(gate, 1.0, 0.06) * np.sin(2 * np.pi * 150 * t) \
        + np.sin(2 * np.pi * 300 * t)
    x = 0.3 * x / np.abs(x).max() + 0.002 * rng.normal(size=len(t))
    for dt in (0.005, 0.0025):
        tr = pitch_track_ac(x, SR, time_step=dt, floor=75, ceiling=600)
        f0 = tr.f0[tr.f0 > 0]
        assert len(f0) > 100
        semis = 12 * np.abs(np.diff(np.log2(np.maximum(f0, 1.0))))
        assert (semis > 6).sum() == 0, f"octave flips at dt={dt}"


def test_point_process_cc_covers_stretch_when_seed_precedes_first_frame():
    """The seed peak regularly lands BEFORE the voiced stretch's first pitch
    frame center; pitch queries must clamp into the stretch (Praat marches
    the whole voiced interval) or the forward march dies at the seed and a
    multi-second stretch collapses to a single pulse (regression)."""
    from robust_speech_analysis_framework_tpu.ops.pitch import pitch_track_ac
    from robust_speech_analysis_framework_tpu.ops.pulses import point_process_cc

    rng = np.random.default_rng(1)
    f0 = 120.0
    n = int(SR * 1.5)
    x = np.zeros(n)
    x[:: int(SR / f0)] = 1.0  # pulse at t=0 pulls the seed before frame 0
    # smear each pulse so peaks are unambiguous
    x = np.convolve(x, np.hanning(48), mode="same")
    x = 0.3 * x / np.abs(x).max() + 0.001 * rng.normal(size=n)
    tr = pitch_track_ac(x, SR, floor=60.0, ceiling=330.0, voicing_threshold=0.3)
    assert (tr.f0 > 0).sum() > 50
    pulses = point_process_cc(x, SR, tr)
    # ~f0 pulses per second over the voiced span
    assert len(pulses) > 0.8 * f0 * (tr.times[-1] - tr.times[0])


def test_point_process_cc_batch_matches_host_oracle():
    """Device/lane-batched pulse marching vs the sequential NumPy oracle:
    >=97% identical pulse positions on synthetic voiced audio (f32 window
    ties account for the rest)."""
    from robust_speech_analysis_framework_tpu.ops.framing import corpus_buffer
    from robust_speech_analysis_framework_tpu.ops.pitch import (
        PitchParams,
        pitch_track_batch,
    )
    from robust_speech_analysis_framework_tpu.ops.pulses import (
        point_process_cc,
        point_process_cc_batch,
    )

    def voiced(seconds, f0, seed):
        # gated speech-like signal (voiced runs + pauses)
        rng = np.random.default_rng(seed)
        t = np.arange(int(seconds * SR)) / SR
        v = sum(np.sin(2 * np.pi * k * f0 * (1 + 0.01 * np.sin(2 * np.pi * 3 * t)) * t) / k
                for k in range(1, 12))
        gate = np.where((t % 0.6) < 0.42, 1.0, 0.02)
        return (0.3 * gate * v / np.abs(v).max()
                + 0.002 * rng.normal(size=len(t)))

    waves = [voiced(3.0 + 0.5 * i, 110 + 30 * i, i) for i in range(3)]
    buf = corpus_buffer(waves, pad=4096, align=8)
    tracks = pitch_track_batch(
        None, SR,
        PitchParams(time_step=0.005, floor=60, ceiling=250, method="cc"),
        buf=buf,
    )
    # two track families in one call (the MSHDS usage shape)
    got = point_process_cc_batch(None, SR, list(tracks) + list(tracks), buf=buf)
    assert len(got) == 6
    total_ref = 0
    for i, x in enumerate(waves):
        ref = point_process_cc(x, SR, tracks[i])
        total_ref += len(ref)
        assert abs(len(got[i]) - len(ref)) <= max(3, len(ref) // 20)
        if len(got[i]):
            overlap = np.isin(np.round(got[i], 9), np.round(ref, 9)).mean()
            assert overlap > 0.97, f"file {i}: overlap {overlap:.3f}"
        np.testing.assert_allclose(got[i], got[i + 3])  # family split intact
    assert total_ref > 100  # the signals produce substantial pulse trains


def test_value_at_time_praat_boundary_semantics():
    """Praat's Sampled_getValueAtX: constant extrapolation from the NEAR
    frame when the far neighbor is unvoiced or out of range (regression:
    0·NaN used to void queries at a voiced stretch's boundary frames)."""
    from robust_speech_analysis_framework_tpu.ops.pitch import PitchTrack

    tr = PitchTrack(
        times=np.array([0.0, 0.005, 0.010, 0.015, 0.020]),
        f0=np.array([100.0, 110.0, 120.0, 130.0, 0.0]),
        strength=np.ones(5),
    )
    # exactly at the last voiced center (neighbor unvoiced)
    assert tr.value_at_time(0.015) == pytest.approx(130.0)
    # near half of the voiced->unvoiced gap: constant extrapolation
    assert tr.value_at_time(0.016) == pytest.approx(130.0)
    # far half of the gap: near frame is unvoiced -> NaN
    assert np.isnan(tr.value_at_time(0.019))
    # within dt/2 before the first center: edge extrapolation
    assert tr.value_at_time(-0.002) == pytest.approx(100.0)
    # beyond dt/2 before the first center: NaN
    assert np.isnan(tr.value_at_time(-0.004))
    # interior voiced-voiced: plain linear interpolation
    assert tr.value_at_time(0.0075) == pytest.approx(115.0)


def test_pitch_params_default_dt_by_method():
    from robust_speech_analysis_framework_tpu.ops.pitch import PitchParams

    assert PitchParams(floor=75.0, method="ac").dt == pytest.approx(0.01)
    assert PitchParams(floor=75.0, method="cc").dt == pytest.approx(1 / 300)
    assert PitchParams(floor=75.0, method="ac", very_accurate=True).dt == (
        pytest.approx(0.02)
    )
