"""openSMILE-equivalent pipeline: functionals, LLDs, SHS pitch, end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.ops.functionals import (
    FUNCTIONAL_NAMES,
    apply_functionals,
    delta_regression,
    smooth_sma,
)
from robust_speech_analysis_framework_tpu.ops.lld_spectral import (
    SPECTRAL_NAMES,
    spectral_llds,
    zero_crossing_rate,
)
from robust_speech_analysis_framework_tpu.features.opensmile import (
    LLD_NAMES,
    OpenSmileExtractor,
    extract_opensmile_features,
    feature_columns,
)

SR = 16000


def _voiced_pulsed(seconds=2.0, f0=140.0):
    t = np.arange(int(seconds * SR)) / SR
    x = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 12))
    x = 0.3 * x / np.abs(x).max()
    return x * np.where((t % 0.7) < 0.45, 1.0, 0.02)


def test_functional_values():
    x = jnp.asarray(np.array([[0.0], [1.0], [2.0], [1.0], [0.0]]))
    f = np.asarray(apply_functionals(x))[:, 0]
    by = dict(zip(FUNCTIONAL_NAMES, f))
    assert by["max"] == 2.0 and by["min"] == 0.0 and by["range"] == 2.0
    assert by["maxPos"] == 2 and by["minPos"] == 0
    assert by["amean"] == pytest.approx(0.8)
    assert by["linregc1"] == pytest.approx(0.0, abs=1e-6)  # symmetric
    # skewness of symmetric-ish data near 0
    assert abs(by["skewness"]) < 1.0


def test_linear_regression_functional():
    t = np.arange(50, dtype=np.float64)
    y = 3.0 * t + 7.0
    f = np.asarray(apply_functionals(jnp.asarray(y[:, None])))[:, 0]
    by = dict(zip(FUNCTIONAL_NAMES, f))
    assert by["linregc1"] == pytest.approx(3.0, rel=1e-5)
    assert by["linregc2"] == pytest.approx(7.0, rel=1e-4)
    assert by["linregerrQ"] == pytest.approx(0.0, abs=1e-6)


def test_smoother_and_deltas():
    x = jnp.asarray(np.array([[1.0], [1.0], [4.0], [1.0], [1.0]]))
    s = np.asarray(smooth_sma(x, 3))[:, 0]
    np.testing.assert_allclose(s, [1.0, 2.0, 2.0, 2.0, 1.0])
    d = np.asarray(delta_regression(jnp.asarray(np.arange(10.0)[:, None]), 2))[:, 0]
    # interior deltas of a ramp = slope 1
    np.testing.assert_allclose(d[2:-2], 1.0, atol=1e-6)


def test_zcr():
    frames = jnp.asarray(np.array([[1.0, -1.0, 1.0, -1.0], [1.0, 1.0, 1.0, 1.0]]))
    z = np.asarray(zero_crossing_rate(frames))
    assert z[0] == pytest.approx(3 / 4)
    assert z[1] == 0.0


def test_spectral_llds_tone():
    n_bins = 257
    mag = np.zeros((3, n_bins), np.float32)
    bin_1k = int(1000 / (SR / 2) * (n_bins - 1))
    mag[:, bin_1k] = 1.0
    out = np.asarray(spectral_llds(jnp.asarray(mag), float(SR)))
    by = dict(zip(SPECTRAL_NAMES, out[1]))
    assert by["fftMag_spectralCentroid"] == pytest.approx(1000.0, abs=20)
    assert by["fftMag_spectralRollOff50.0"] == pytest.approx(1000.0, abs=40)
    assert by["fftMag_spectralEntropy"] < 0.1  # concentrated
    assert by["fftMag_spectralEnergyInBand250-650"] == pytest.approx(0.0, abs=1e-6)
    assert by["fftMag_spectralEnergyInBand1000-4000"] == pytest.approx(1.0, abs=1e-3)
    assert by["fftMag_spectralFlatness"] < 0.1


def test_spectral_llds_silent_frames_finite():
    """Digitally-silent frames (all-zero magnitude) must yield finite LLDs —
    a small variance floor underflows in f32 (std³ ~ 1e-45 flushes to 0) and
    used to turn skewness/kurtosis into 0/0 = NaN, which then poisoned all 40
    skewness/kurtosis functionals of any file with a gated/trimmed stretch."""
    n_bins = 257
    mag = np.zeros((4, n_bins), np.float32)
    bin_1k = int(1000 / (SR / 2) * (n_bins - 1))
    mag[1, bin_1k] = 1.0  # frames 0, 2, 3 stay exactly silent
    out = np.asarray(spectral_llds(jnp.asarray(mag), float(SR)))
    assert np.isfinite(out).all()
    by = dict(zip(SPECTRAL_NAMES, out[0]))
    assert by["fftMag_spectralSkewness"] == 0.0
    assert by["fftMag_spectralKurtosis"] == 0.0


@pytest.mark.slow
def test_extract_single_silent_tail_finite():
    """A file whose tail is exact digital silence (gated recording) must
    still produce a fully-finite 912-feature row."""
    from robust_speech_analysis_framework_tpu.features.opensmile import (
        OpenSmileExtractor,
    )

    x = _voiced_pulsed(1.0)
    x[int(0.7 * len(x)):] = 0.0
    vec = np.asarray(OpenSmileExtractor().extract_single(x))
    assert vec.shape == (912,)
    assert np.isfinite(vec).all()


@pytest.mark.slow
def test_extract_llds_marks_preemphasized_voiced_frames():
    """Voicing through the REAL chain (preemphasis + Hamming + FFT): the
    window taper depresses raw lag-domain autocorrelation so genuinely
    periodic frames used to read 0.6-0.75 and straddle the 0.70 cutoff
    (a 120 Hz pulse train read 0.64 -> F0final, jitter, shimmer and logHNR
    were all zeroed). With Boersma's window correction, periodic frames
    must be ~1.0 and carry a correct F0 (regression)."""
    from robust_speech_analysis_framework_tpu.features.opensmile import (
        LLD_NAMES,
        OpenSmileExtractor,
    )

    rng = np.random.default_rng(0)
    t = np.arange(int(1.2 * SR)) / SR
    # 80 and 100 Hz sit in the band the shared 512-point STFT cannot
    # cover alias-free (lags > n_fft - frame_len): they exercise the
    # dedicated wide voicing transform
    for f0 in (80.0, 100.0, 140.0, 220.0):
        v = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 12))
        x = 0.3 * v / np.abs(v).max() + 0.0005 * rng.normal(size=len(t))
        llds = np.asarray(OpenSmileExtractor().extract_llds(x))
        f0c = llds[:, LLD_NAMES.index("F0final")]
        voc = llds[:, LLD_NAMES.index("voicingFinalUnclipped")]
        assert (f0c > 0).mean() > 0.95, f"{f0}: only {(f0c>0).mean():.0%} voiced"
        assert np.median(voc) > 0.9
        assert np.median(f0c[f0c > 0]) == pytest.approx(f0, rel=0.02)


def test_spline_interp_matrix_matches_scipy_natural_spline():
    """The GEMM-form spectrum interpolation (cSpecScale interpMethod=spline)
    must equal scipy's natural cubic spline at arbitrary points."""
    from scipy.interpolate import CubicSpline

    from robust_speech_analysis_framework_tpu.ops.shs_pitch import (
        _spline_interp_matrix,
    )

    rng = np.random.default_rng(0)
    n = 65
    y = rng.normal(size=n)
    pos = np.sort(rng.uniform(0, n - 1, size=40))
    s = _spline_interp_matrix(n, tuple(pos.tolist()))
    got = s @ y
    ref = CubicSpline(np.arange(n), y, bc_type="natural")(pos)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_shs_pitch_on_harmonic():
    from robust_speech_analysis_framework_tpu.audio.frontend import (
        FrontendConfig, framed_stft, preemphasize, hamming_window)
    from robust_speech_analysis_framework_tpu.ops.shs_pitch import shs_pitch
    from robust_speech_analysis_framework_tpu.ops.lld_spectral import rms_energy

    t = np.arange(SR) / SR
    x = sum(np.sin(2 * np.pi * k * 180.0 * t) / k for k in range(1, 12))
    x = 0.3 * x / np.abs(x).max()
    cfg = FrontendConfig(sample_rate=SR)
    frames, mag = framed_stft(jnp.asarray(x, jnp.float32), cfg)
    win = hamming_window(cfg.frame_len)
    rms = np.asarray(rms_energy(preemphasize(frames) * win))
    f0, voicing = shs_pitch(np.asarray(mag), SR, rms)
    v = f0[f0 > 0]
    assert len(v) > 0.9 * len(f0)
    assert np.median(v) == pytest.approx(180.0, rel=0.01)
    # noise → unvoiced
    rng = np.random.default_rng(0)
    _, magn = framed_stft(jnp.asarray(rng.normal(size=SR) * 0.1, jnp.float32), cfg)
    f0n, _ = shs_pitch(np.asarray(magn), SR, rms)
    assert (f0n > 0).mean() < 0.1


def test_column_count_and_names():
    cols = feature_columns()
    assert len(cols) == 912
    assert len(LLD_NAMES) == 38
    assert len(set(cols)) == 912
    assert "F0final_sma_amean" in cols
    assert "mfcc[12]_sma_de_kurtosis" in cols
    assert "fftMag_spectralFlux_sma_linregerrQ" in cols


def test_column_emission_order_matches_conf_reader():
    """Positional parity: cFunctionals reads lld;lld_de;lld2;lld_de2;lld3;
    lld_de3 (Androids.conf:350), so each smoother group's sma block is
    followed by ITS delta block — not all sma then all de. The reference's
    911-column datasets are consumed positionally after dropping column 0,
    so block boundaries are pinned here."""
    cols = feature_columns()
    assert cols[0] == "pcm_RMSenergy_sma_max"  # group1 sma
    assert cols[192] == "pcm_RMSenergy_sma_de_max"  # group1 de
    assert cols[384] == "pcm_intensity_sma_max"  # group2 sma
    assert cols[456] == "pcm_intensity_sma_de_max"  # group2 de
    assert cols[528] == "fftMag_spectralEnergyInBand250-650_sma_max"
    assert cols[720] == "fftMag_spectralEnergyInBand250-650_sma_de_max"
    # value vector must align with the names: F0final_sma_amean at its
    # position equals the mean of the smoothed F0 contour
    from robust_speech_analysis_framework_tpu.features.opensmile import (
        LLD_NAMES as names,
        OpenSmileExtractor,
    )

    ex = OpenSmileExtractor()
    x = _voiced_pulsed(1.0)
    vec = np.asarray(ex.extract_single(x))
    llds = np.asarray(ex.extract_llds(x))
    f0 = llds[:, names.index("F0final")]
    # sma window 3, edge-renormalized: mean is unchanged up to edges
    got = vec[cols.index("F0final_sma_amean")]
    assert got == pytest.approx(f0.mean(), rel=0.02)
    inten = llds[:, names.index("pcm_intensity")]
    got_i = vec[cols.index("pcm_intensity_sma_amean")]
    assert got_i == pytest.approx(inten.mean(), rel=0.02)


@pytest.mark.slow
def test_extract_batch_drops_subframe_clips_and_duplicate_basenames(tmp_path):
    """A clip shorter than one 25 ms analysis frame must be DROPPED (serial
    semantics) — the masked functionals would otherwise emit a row of ±inf
    max/min — and duplicate basenames must not silently collapse rows."""
    import pandas as pd
    from robust_speech_analysis_framework_tpu.audio.io import write_wav

    ex = OpenSmileExtractor()
    out = ex.extract_batch(
        {"ok.wav": _voiced_pulsed(0.8), "tiny.wav": np.zeros(100, np.float32)},
        verbose=False,
    )
    assert list(out["filename"]) == ["ok.wav"]
    assert np.isfinite(out.drop(columns="filename").to_numpy()).all()

    a = tmp_path / "a"; b = tmp_path / "b"
    a.mkdir(); b.mkdir()
    write_wav(str(a / "rec.wav"), _voiced_pulsed(0.8), SR)
    write_wav(str(b / "rec.wav"), _voiced_pulsed(0.9), SR)
    df_in = pd.DataFrame({"filepath": [str(a / "rec.wav"), str(b / "rec.wav")]})
    out = extract_opensmile_features(df_in, verbose=False)
    assert len(out) == 1  # second duplicate dropped loudly, not merged


@pytest.mark.slow
def test_extract_single_finite():
    ex = OpenSmileExtractor()
    vec = ex.extract_single(_voiced_pulsed())
    assert vec.shape == (912,)
    assert np.isfinite(vec).all()


def test_extract_dataframe_and_failure_semantics(tmp_path):
    import pandas as pd
    from robust_speech_analysis_framework_tpu.audio.io import write_wav

    p = tmp_path / "01_CF56_1.wav"
    write_wav(str(p), _voiced_pulsed(1.0), SR)
    df_in = pd.DataFrame({"filepath": [str(p), "/nonexistent/x.wav"]})
    out = extract_opensmile_features(df_in, verbose=False)
    # unreadable file dropped (reference :89-96), readable one present
    assert out.shape == (1, 913)
    assert out.iloc[0]["filename"] == "01_CF56_1.wav"
    named = out.iloc[0]
    assert named["F0final_sma_amean"] > 50


@pytest.mark.slow
def test_batched_extraction_matches_serial():
    import pandas as pd

    ex = OpenSmileExtractor()
    waves = {
        f"f{i}.wav": _voiced_pulsed(1.0 + 0.1 * i, 120 + 10 * i) for i in range(4)
    }
    cols = feature_columns()
    dfb = ex.extract_batch(waves, verbose=False)
    dfs = ex.extract(waves, batched=False, verbose=False)
    assert dfb.shape == dfs.shape == (4, 913)
    a = dfb.set_index("filename").loc[sorted(waves)][cols].to_numpy()
    b = dfs.set_index("filename").loc[sorted(waves)][cols].to_numpy()
    # identical up to SHS/jitter boundary effects from shared-bucket padding
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-3)
    assert np.nanmedian(rel) < 1e-5
    # voice-quality functionals (jitter/shimmer/logHNR) come from the
    # device period march vs the NumPy oracle in the serial path; on this
    # near-perfectly-periodic synthetic signal logHNR = ln(rho/(1-rho))
    # sits in the rho→1 saturation regime where f32-vs-f64 lag-argmax tie
    # flips are amplified, so that family gets its own looser bound.
    vq_mask = np.array([
        any(k in c for k in ("jitter", "shimmer", "logHNR")) for c in cols
    ])
    assert np.nanmean(rel[:, ~vq_mask]) < 2e-4
    assert np.nanmean(rel[:, vq_mask]) < 5e-2


def test_reference_compat_911_schema():
    """reference_compat drops the first emitted feature → the reference's
    observed 911-column schema (src/opensmile_extractor.py:78-86, nb02
    cell 2 X shape 111×911); values are otherwise identical."""
    from robust_speech_analysis_framework_tpu.features.opensmile import (
        OpenSmileConfig,
    )

    cols911 = feature_columns(reference_compat=True)
    assert len(cols911) == 911
    assert cols911 == feature_columns()[1:]

    wav = _voiced_pulsed(1.0)
    full = OpenSmileExtractor().extract({"a.wav": wav}, verbose=False)
    compat = OpenSmileExtractor(
        OpenSmileConfig(reference_compat=True)
    ).extract({"a.wav": wav}, verbose=False)
    assert compat.shape == (1, 912)  # filename + 911 features
    dropped = feature_columns()[0]
    assert dropped not in compat.columns
    np.testing.assert_allclose(
        compat.iloc[0][cols911].to_numpy(float),
        full.iloc[0][cols911].to_numpy(float),
        rtol=1e-6,
    )


def test_jitter_shimmer_values_match_constructed_ground_truth():
    """Value-level calibration (not just march parity): pulse trains with
    KNOWN period perturbation and amplitude modulation must recover the
    constructed jitterLocal / shimmerLocal within the sample-quantization
    floor (~0.4% at 120 Hz / 16 kHz), and a clean train must read ~0 for
    both with saturated logHNR."""
    from robust_speech_analysis_framework_tpu.ops.jitter import (
        jitter_shimmer_llds,
    )

    rng = np.random.default_rng(3)
    f0 = 120.0
    T0 = SR / f0
    dur = 2.0
    hop = 0.010
    n_frames = int(dur / hop)
    f0c = np.full(n_frames, f0)

    def make(jit_a, shim_a):
        pos, periods, amps = [], [], []
        p = 50.0
        while p < dur * SR - 400:
            T = T0 * (1 + rng.uniform(-jit_a, jit_a))
            A = 1.0 + rng.uniform(-shim_a, shim_a)
            pos.append(p); periods.append(T); amps.append(A)
            p += T
        x = np.zeros(int(dur * SR))
        k = np.hanning(33)
        for q, A in zip(pos, amps):
            i = int(round(q))
            x[i - 16 : i + 17] += A * k
        x = 0.5 * x / np.abs(x).max()
        Ts = np.diff(np.asarray(pos))
        true_j = np.abs(np.diff(Ts)).mean() / Ts.mean()
        As = np.asarray(amps)
        true_s = np.abs(np.diff(As)).mean() / As.mean()
        return x, true_j, true_s

    # clean train: jitter/shimmer ~0, logHNR saturated
    x, _, _ = make(0.0, 0.0)
    llds = jitter_shimmer_llds(x, SR, f0c, hop_s=hop)
    assert llds[:, 0].mean() < 0.008
    assert llds[:, 2].mean() < 0.01
    assert np.median(llds[llds[:, 3] != 0, 3]) > 8

    # known 3% period jitter
    x, true_j, _ = make(0.03, 0.0)
    llds = jitter_shimmer_llds(x, SR, f0c, hop_s=hop)
    got_j = np.median(llds[llds[:, 0] > 0, 0])
    assert got_j == pytest.approx(true_j, rel=0.3)

    # known 12% amplitude shimmer
    x, _, true_s = make(0.0, 0.12)
    llds = jitter_shimmer_llds(x, SR, f0c, hop_s=hop)
    got_s = np.median(llds[llds[:, 2] > 0, 2])
    assert got_s == pytest.approx(true_s, rel=0.25)


@pytest.mark.slow
def test_device_period_marching_matches_numpy_oracle():
    """ops.jitter.mark_periods_batch (vmapped while_loop) vs the NumPy
    marching oracle: same period boundaries on clean voiced audio."""
    from robust_speech_analysis_framework_tpu.ops.jitter import (
        mark_periods,
        mark_periods_batch,
        periods_to_llds,
    )

    waves = [_voiced_pulsed(1.0 + 0.2 * i, 110 + 15 * i) for i in range(3)]
    hop_s = 0.010
    f0s, ns, nf = [], [], []
    bucket = max(len(x) for x in waves)
    stack = np.zeros((len(waves), bucket), np.float32)
    for i, x in enumerate(waves):
        n_frames = len(x) // int(SR * hop_s)
        f0s.append(np.full(n_frames, 110.0 + 15 * i))
        ns.append(len(x))
        nf.append(n_frames)
        stack[i, : len(x)] = x
    t_pad = max(nf)
    f0_pad = np.zeros((len(waves), t_pad), np.float32)
    for i, f in enumerate(f0s):
        f0_pad[i, : len(f)] = f

    got = mark_periods_batch(stack, SR, f0_pad, ns, nf, hop_s=hop_s)
    for i, x in enumerate(waves):
        ref = mark_periods(x.astype(np.float64), SR, f0s[i], hop_s=hop_s)
        # identical marching up to f32-vs-f64 correlation argmax ties:
        # demand exact agreement on ≥97% of boundaries and tight LLDs
        n = min(len(ref.starts), len(got[i].starts))
        assert n > 10
        same = np.mean(ref.starts[:n] == got[i].starts[:n])
        assert same > 0.97, f"file {i}: only {same:.2%} boundaries agree"
        lld_ref = periods_to_llds(ref, f0s[i], SR, hop_s=hop_s)
        lld_got = periods_to_llds(got[i], f0s[i], SR, hop_s=hop_s)
        rel = np.abs(lld_got - lld_ref) / np.maximum(np.abs(lld_ref), 1e-3)
        assert np.nanmean(rel) < 5e-3


def test_device_periods_to_llds_matches_host_prefix_sums():
    """ops.jitter.periods_to_llds_batch (device, f32) vs the host f64
    prefix-sum conversion, fed the SAME device march output — the device
    path is what extract_batch now chains without any mid-bucket sync."""
    import jax

    from robust_speech_analysis_framework_tpu.ops.jitter import (
        mark_periods_batch,
        periods_to_llds,
        periods_to_llds_batch,
    )

    waves = [_voiced_pulsed(1.0 + 0.2 * i, 110 + 15 * i) for i in range(3)]
    hop_s = 0.010
    bucket = max(len(x) for x in waves)
    stack = np.zeros((len(waves), bucket), np.float32)
    f0s, ns, nf = [], [], []
    for i, x in enumerate(waves):
        n_frames = len(x) // int(SR * hop_s)
        f0s.append(np.full(n_frames, 110.0 + 15 * i))
        ns.append(len(x))
        nf.append(n_frames)
        stack[i, : len(x)] = x
    t_pad = max(nf)
    f0_pad = np.zeros((len(waves), t_pad), np.float32)
    for i, f in enumerate(f0s):
        f0_pad[i, : len(f)] = f

    deferred = mark_periods_batch(
        stack, SR, f0_pad, ns, nf, hop_s=hop_s, defer=True
    )
    vq_dev = np.asarray(periods_to_llds_batch(
        deferred.arrays, f0_pad, SR, hop_s=hop_s
    ))
    tracks = deferred.result()
    for i in range(len(waves)):
        ref = periods_to_llds(tracks[i], f0s[i], SR, hop_s=hop_s)
        got = vq_dev[i, : nf[i]]
        rel = np.abs(got - ref[: nf[i]]) / np.maximum(np.abs(ref[: nf[i]]), 1e-3)
        # this grid-aligned synthetic puts period centers EXACTLY on frame
        # boundaries, so f64-vs-f32 rounding flips which segment a boundary
        # period belongs to on a handful of frames (the host's own tie
        # direction is just f64 representation noise); demand tightness
        # everywhere else and rarity of tie flips
        assert np.nanmedian(rel) < 1e-4, np.nanmedian(rel)
        assert np.mean(np.nan_to_num(rel) > 1e-2) < 0.02, np.mean(rel > 1e-2)


@pytest.mark.slow
def test_pipelined_buckets_match_serial_across_many_buckets():
    """extract_batch keeps up to 3 bucket chains in flight; with > 4 length
    buckets the window wraps. Every file must still come back, matching the
    serial path."""
    ex = OpenSmileExtractor()
    waves = {
        f"p{i}.wav": _voiced_pulsed(0.8 + 0.55 * i, 115 + 12 * i)
        for i in range(6)
    }
    dfb = ex.extract_batch(waves, verbose=False)
    assert sorted(dfb["filename"]) == sorted(waves)
    dfs = ex.extract(waves, batched=False, verbose=False)
    cols = feature_columns()
    a = dfb.set_index("filename").loc[sorted(waves)][cols].to_numpy()
    b = dfs.set_index("filename").loc[sorted(waves)][cols].to_numpy()
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-3)
    assert np.nanmedian(rel) < 1e-5
    assert np.nanmean(rel) < 5e-2


@pytest.mark.slow
def test_device_period_marching_matmul_dft_path(monkeypatch):
    """The TPU-backend lag search (GEMM-native DFT correlation, forced here
    via RSAF_FORCE_MATMUL_DFT) must march the same boundaries as the fft
    path and the NumPy oracle."""
    import jax

    from robust_speech_analysis_framework_tpu.ops.jitter import (
        mark_periods,
        mark_periods_batch,
    )

    monkeypatch.setenv("RSAF_FORCE_MATMUL_DFT", "1")
    jax.clear_caches()  # _march_periods_device already traced the fft path
    try:
        x = _voiced_pulsed(1.3, 125).astype(np.float32)
        hop_s = 0.010
        n_frames = len(x) // int(SR * hop_s)
        f0 = np.full(n_frames, 125.0, np.float32)
        got = mark_periods_batch(
            x[None, :], SR, f0[None, :], [len(x)], [n_frames], hop_s=hop_s
        )
        ref = mark_periods(x.astype(np.float64), SR, f0, hop_s=hop_s)
        n = min(len(ref.starts), len(got[0].starts))
        assert n > 10
        agree = np.asarray(got[0].starts[:n]) == ref.starts[:n]
        assert np.mean(agree) > 0.97, f"only {np.mean(agree):.2%} boundaries agree"
        # only compare correlations where the marched boundaries coincide —
        # at a tolerated boundary divergence the two tracks describe
        # different physical periods
        np.testing.assert_allclose(
            got[0].correlations[:n][agree], ref.correlations[:n][agree],
            atol=5e-4,
        )
    finally:
        jax.clear_caches()


@pytest.mark.slow
def test_device_march_split_buffer_fallback(monkeypatch):
    """Waveforms longer than _FUSED_MAX samples can't pack period starts
    into the fused f32 row write exactly; the march must fall back to the
    split int32 + f32 buffers and produce the identical period track (the
    threshold is shrunk here so the fallback runs on a small input)."""
    import jax

    from robust_speech_analysis_framework_tpu.ops import jitter

    x = _voiced_pulsed(1.0, 125).astype(np.float32)
    hop_s = 0.010
    n_frames = len(x) // int(SR * hop_s)
    f0 = np.full(n_frames, 125.0, np.float32)
    args = (x[None, :], SR, f0[None, :], [len(x)], [n_frames])
    fused = jitter.mark_periods_batch(*args, hop_s=hop_s)
    monkeypatch.setattr(jitter, "_FUSED_MAX", 1)
    jax.clear_caches()  # same shapes would hit the fused trace otherwise
    try:
        split = jitter.mark_periods_batch(*args, hop_s=hop_s)
    finally:
        jax.clear_caches()
    np.testing.assert_array_equal(split[0].starts, fused[0].starts)
    np.testing.assert_array_equal(split[0].lengths, fused[0].lengths)
    np.testing.assert_allclose(split[0].amplitudes, fused[0].amplitudes)
    np.testing.assert_allclose(split[0].correlations, fused[0].correlations)


@pytest.mark.slow
@pytest.mark.parametrize("force_matmul", [False, True])
def test_device_march_zero_energy_windows(monkeypatch, force_matmul):
    """Pulses followed by exact digital silence, with the F0 contour labeled
    voiced throughout: the host oracle's direct products are exactly zero in
    the silent stretch (NCC 0, first-lag argmax), while the spectral lag
    search used to amplify transform rounding noise through the 1e-30-floored
    denominator into noise-determined lags (regression for the e_full
    relative-threshold guard in _march_periods_device)."""
    import jax

    from robust_speech_analysis_framework_tpu.ops.jitter import (
        mark_periods,
        mark_periods_batch,
    )

    if force_matmul:
        monkeypatch.setenv("RSAF_FORCE_MATMUL_DFT", "1")
    jax.clear_caches()
    try:
        voiced = _voiced_pulsed(0.7, 125).astype(np.float32)
        x = np.concatenate([voiced, np.zeros(int(SR * 0.6), np.float32)])
        hop_s = 0.010
        n_frames = len(x) // int(SR * hop_s)
        f0 = np.full(n_frames, 125.0, np.float32)
        got = mark_periods_batch(
            x[None, :], SR, f0[None, :], [len(x)], [n_frames], hop_s=hop_s
        )
        ref = mark_periods(x.astype(np.float64), SR, f0, hop_s=hop_s)
        n = min(len(ref.starts), len(got[0].starts))
        assert n > 10
        agree = np.asarray(got[0].starts[:n]) == ref.starts[:n]
        assert np.mean(agree) > 0.97, (
            f"only {np.mean(agree):.2%} boundaries agree through silence"
        )
    finally:
        jax.clear_caches()
