"""MSHDS extractor end-to-end tests on synthetic speech-like audio."""

import numpy as np
import pandas as pd
import pytest

from robust_speech_analysis_framework_tpu.features.mshds import (
    FEATURE_NAMES,
    extract_mshds_features,
    extract_mshds_single,
    speaker_pitch_range,
)

SR = 16000


def _speechlike(f0_base=120.0, seconds_v=0.35, n_bursts=5, seed=0):
    rng = np.random.default_rng(seed)
    parts = []
    for i in range(n_bursts):
        t = np.arange(int(seconds_v * SR)) / SR
        f0 = f0_base + 8 * i
        v = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 12))
        env = np.minimum(1, 12 * np.minimum(t, seconds_v - t))
        parts.append(0.3 * env * v / np.abs(v).max())
        parts.append(np.zeros(int((0.4 if i % 2 == 0 else 0.15) * SR)))
    x = np.concatenate(parts)
    return x + 0.001 * rng.normal(size=len(x))


@pytest.fixture(scope="module")
def speech():
    return _speechlike()


@pytest.fixture(scope="module")
def feats(speech):
    return extract_mshds_single(speech, SR)


def test_all_features_present_and_finite(feats):
    assert set(feats) == set(FEATURE_NAMES)
    finite = {k: np.isfinite(v) for k, v in feats.items()}
    assert all(finite.values()), {k for k, ok in finite.items() if not ok}


def test_feature_plausibility(feats):
    assert 100 < feats["mean_F0"] < 200
    assert 0 < feats["stdev_F0_Semitone"] < 6
    assert 50 < feats["mean_dB"] < 90
    assert feats["HNR_dB"] > 5
    assert 0.3 < feats["Phonation_Ratio"] < 1.0
    assert 0 < feats["Speaking_Rate"] < 8
    assert feats["Articulation_Rate"] >= feats["Speaking_Rate"]
    assert feats["Cepstral_Peak_Prominence"] > 4
    assert 100 < feats["Spectral_Gravity"] < 2000
    assert 100 < feats["mean_F1_Loc"] < 1200


@pytest.mark.slow
def test_formant_pulse_train_oracle():
    """Glottal pulse train through two known resonators (F1 600, F2 1700 Hz)
    with a gated silent tail: every feature must be finite and the formant /
    pitch / CPP estimates must recover the construction. Regression for the
    pulse-march clamp — the seed peak precedes the first pitch frame here,
    which used to collapse the whole stretch to one pulse and NaN the
    pulse-derived features (CPP, formants)."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(1)
    f0 = 120.0
    n = int(SR * 2.0)
    x = np.zeros(n)
    x[: n - 100 : int(SR / f0)] = 1.0

    def resonator(f, bw):
        r = np.exp(-np.pi * bw / SR)
        th = 2 * np.pi * f / SR
        return [1.0], [1.0, -2 * r * np.cos(th), r * r]

    b1, a1 = resonator(600, 80)
    b2, a2 = resonator(1700, 120)
    x = lfilter(b2, a2, lfilter(b1, a1, x))
    x = 0.3 * x / np.abs(x).max() + 0.002 * rng.normal(size=n)
    x[int(0.85 * n):] = 0.0

    row = extract_mshds_single(x, SR)
    assert all(np.isfinite(v) for v in row.values()), \
        {k for k, v in row.items() if not np.isfinite(v)}
    assert row["mean_F0"] == pytest.approx(f0, abs=2.0)
    assert row["Cepstral_Peak_Prominence"] > 8
    assert row["HNR_dB"] > 15
    assert row["mean_F1_Loc"] == pytest.approx(600, abs=80)
    assert row["mean_F2_Loc"] == pytest.approx(1700, abs=200)
    assert row["Phonation_Ratio"] > 0.8


@pytest.mark.slow
def test_batch_extraction_at_48k_sample_rate():
    """The shared corpus-buffer pad must scale with sr: the range-adapted
    intensity window (6.4/50·sr) and harmonicity extension ((4.5+1)/60·sr)
    exceed the old fixed 4096-sample pad above ~32 kHz, which made every
    HNR/intensity stage raise and NaN the whole corpus at 48 kHz."""
    from robust_speech_analysis_framework_tpu.features.mshds import (
        extract_mshds_batch,
    )

    sr48 = 48000
    rng = np.random.default_rng(0)
    t = np.arange(int(1.2 * sr48)) / sr48
    v = sum(np.sin(2 * np.pi * k * 130 * t) / k for k in range(1, 12))
    x = 0.3 * v / np.abs(v).max() + 0.001 * rng.normal(size=len(t))
    df = extract_mshds_batch({"a.wav": x}, sr=sr48, verbose=False)
    row = df.iloc[0]
    assert np.isfinite(row["HNR_dB"]) and row["HNR_dB"] > 10
    assert np.isfinite(row["mean_dB"]) and 50 < row["mean_dB"] < 90
    assert row["mean_F0"] == pytest.approx(130, abs=3)


def test_intensity_matches_analytic_spl():
    """mean_dB of a known-amplitude sine must equal the analytic SPL:
    20·log10(A/√2 / 2e-5) — 0.2 amplitude → 76.99 dB (Praat reference
    pressure 2e-5 Pa; measured error < 0.05 dB)."""
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * 1.5)) / SR
    x = 0.2 * np.sin(2 * np.pi * 140 * t) + 0.0005 * rng.normal(size=len(t))
    row = extract_mshds_single(x, SR)
    expected = 20 * np.log10(0.2 / np.sqrt(2) / 2e-5)
    assert row["mean_dB"] == pytest.approx(expected, abs=0.3)


def test_hnr_matches_constructed_snr():
    """HNR_dB on harmonic + white noise with a KNOWN power ratio must read
    the constructed SNR (Praat's harmonicity is exactly that for stationary
    signals; measured error < 0.2 dB at 10-30 dB)."""
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * 1.5)) / SR
    v = sum(np.sin(2 * np.pi * k * 140 * t) / k for k in range(1, 10))
    v = v / np.sqrt(np.mean(v * v))
    for snr_db in (10.0, 20.0, 30.0):
        noise = rng.normal(size=len(t))
        noise /= np.sqrt(np.mean(noise * noise))
        x = v + noise * 10 ** (-snr_db / 20)
        row = extract_mshds_single(0.2 * x, SR)
        assert row["HNR_dB"] == pytest.approx(snr_db, abs=1.0)


def test_speaker_pitch_range():
    low = _speechlike(f0_base=110)
    hi = _speechlike(f0_base=230)
    assert speaker_pitch_range(low, SR) == (60, 250)
    assert speaker_pitch_range(hi, SR) == (100, 500)
    assert speaker_pitch_range(np.zeros(SR), SR) == (75, 500)


@pytest.mark.slow
def test_dataframe_front_door(tmp_path, speech):
    from robust_speech_analysis_framework_tpu.audio.io import write_wav

    p = tmp_path / "01_CF56_1.wav"
    write_wav(str(p), speech, SR)
    df_in = pd.DataFrame({"filepath": [str(p), str(tmp_path / "missing.wav")]})
    out = extract_mshds_features(df_in, verbose=False)
    assert out.shape == (2, 26)
    assert list(out.columns) == ["filename"] + FEATURE_NAMES
    assert np.isfinite(out.iloc[0]["mean_F0"])
    # missing file → NaN row, not a crash (reference :450-457)
    assert out.iloc[1][FEATURE_NAMES].isna().all()


def test_waveform_injection(speech):
    df_in = pd.DataFrame({"filepath": ["/nonexistent/a.wav"]})
    out = extract_mshds_features(
        df_in, verbose=False, waveforms={"a.wav": speech}
    )
    assert np.isfinite(out.iloc[0]["mean_F0"])


@pytest.mark.slow
def test_batch_extraction_matches_serial(speech):
    """Corpus-batched MSHDS (shared pitch passes) == per-file extraction."""
    from robust_speech_analysis_framework_tpu.features.mshds import (
        extract_mshds_batch,
    )

    waves = {
        "a.wav": speech,
        "b.wav": _speechlike(f0_base=200, seed=3),
    }
    dfb = extract_mshds_batch(waves, SR, n_workers=1, verbose=False).set_index(
        "filename"
    )
    for name, x in waves.items():
        ref = extract_mshds_single(np.asarray(x), SR)
        for k, v in ref.items():
            got = dfb.loc[name, k]
            if np.isnan(v):
                assert np.isnan(got), (name, k)
            else:
                assert got == pytest.approx(v, rel=1e-4, abs=1e-6), (name, k)


@pytest.mark.slow
def test_cpps_short_voiced_segment_nans_whole_file():
    """A voiced segment shorter than one cepstrogram window NaNs the file's
    CPP — and nothing else.

    Reference contract (src/mshds_extractor.py:269-301): every 'V' interval
    goes through 'To PowerCepstrogram'; Praat raises on a segment shorter
    than the 2/pitch_floor analysis window, and that error lands OUTSIDE the
    per-segment try, so the whole file's CPP becomes NaN while the other 24
    features are unaffected. This synthetic file (the bench corpus's f0=150
    member) carries a ~25 ms voiced sliver at t≈5.86 s that trips the wall.
    """
    # mirrors benchmarks.suite._speech(20.0, f0, seed)
    def bench_speech(seconds, f0, seed):
        rng = np.random.default_rng(seed)
        t = np.arange(int(seconds * SR)) / SR
        v = sum(
            np.sin(2 * np.pi * k * f0 * (1 + 0.01 * np.sin(2 * np.pi * 3 * t)) * t) / k
            for k in range(1, 12)
        )
        gate = np.where((t % 0.6) < 0.42, 1.0, 0.02)
        x = 0.3 * gate * v / np.abs(v).max() + 0.002 * rng.normal(size=len(t))
        return (np.clip(np.round(x * 32768.0), -32768, 32767) / 32768.0).astype(
            np.float32
        )

    f = extract_mshds_single(bench_speech(20.0, 150, 2), SR)
    assert np.isnan(f["Cepstral_Peak_Prominence"])
    assert np.isfinite(f["mean_F0"])
    assert np.isfinite(f["HNR_dB"])
    # a sibling file with no sliver keeps a finite CPP
    f_ok = extract_mshds_single(bench_speech(20.0, 120, 0), SR)
    assert np.isfinite(f_ok["Cepstral_Peak_Prominence"])
