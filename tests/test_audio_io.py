"""WAV IO round-trips and format coverage, cross-checked vs scipy.io.wavfile."""

import numpy as np
import pytest
import scipy.io.wavfile as siw

from robust_speech_analysis_framework_tpu.audio import read_wav, write_wav, load_mono_16k


def test_roundtrip_mono(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape == (1000, 1)
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 32767)


def test_roundtrip_stereo_matches_scipy(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.5, 0.5, (500, 2)).astype(np.float32)
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 44100)
    ours, sr = read_wav(p)
    sr2, theirs = siw.read(p)
    assert sr == sr2 == 44100
    np.testing.assert_allclose(ours, theirs.astype(np.float64) / 32768.0, atol=1e-7)


@pytest.mark.parametrize("dtype,scale", [(np.int16, 32768.0), (np.int32, 2**31)])
def test_read_scipy_written_pcm(tmp_path, dtype, scale):
    rng = np.random.default_rng(2)
    pcm = (rng.uniform(-0.5, 0.5, 300) * scale).astype(dtype)
    p = str(tmp_path / "p.wav")
    siw.write(p, 8000, pcm)
    y, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(y[:, 0], pcm.astype(np.float64) / scale, atol=1e-9)


def test_read_float32_wav(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.normal(size=200).astype(np.float32)
    p = str(tmp_path / "f.wav")
    siw.write(p, 22050, x)
    y, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(y[:, 0], x, rtol=1e-6)


def test_read_24bit(tmp_path):
    # scipy can't write 24-bit; craft one manually from our 16-bit writer bytes
    import struct
    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = b"".join(struct.pack("<i", int(v) << 8)[1:] for v in vals)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000 * 3, 3, 24)
        + b"data" + struct.pack("<I", len(raw))
    )
    p = "/tmp/t24.wav"
    with open(p, "wb") as fh:
        fh.write(hdr + raw)
    y, sr = read_wav(p)
    np.testing.assert_allclose(
        y[:, 0], vals.astype(np.float64) / (1 << 23), atol=1e-9
    )


def test_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        read_wav(str(p))


def test_load_mono_16k_downmixes_and_resamples(tmp_path):
    rng = np.random.default_rng(4)
    t = np.arange(32000) / 32000.0
    x = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 440 * t)], axis=1)
    p = str(tmp_path / "st.wav")
    write_wav(p, x * 0.5, 32000)
    mono = load_mono_16k(p)
    assert mono.ndim == 1
    assert abs(len(mono) - 16000) <= 1
