"""Native C++ decoder: parity with the Python codec + batch path."""

import os
import time

import numpy as np
import pytest

from robust_speech_analysis_framework_tpu.audio.io import read_wav, write_wav
from robust_speech_analysis_framework_tpu.audio import native_io

pytestmark = pytest.mark.skipif(
    not native_io.native_available(), reason="native library unavailable"
)


@pytest.fixture
def wavs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        x = rng.uniform(-0.8, 0.8, size=(1000 + 100 * i, 2)).astype(np.float32)
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, x, 22050)
        paths.append(p)
    return paths


def test_single_decode_matches_python(wavs):
    for p in wavs:
        native, sr_n = native_io.decode_mono(p)
        ref, sr_p = read_wav(p)
        assert sr_n == sr_p
        np.testing.assert_allclose(native, ref.mean(axis=1), atol=1e-6)


def test_batch_decode(wavs):
    results = native_io.decode_batch_mono(wavs + ["/nonexistent/x.wav"], n_threads=4)
    assert len(results) == len(wavs) + 1
    assert results[-1] is None
    for p, item in zip(wavs, results):
        assert item is not None
        x, sr = item
        ref, _ = read_wav(p)
        np.testing.assert_allclose(x, ref.mean(axis=1), atol=1e-6)


def test_load_corpus_mono_16k(wavs):
    out = native_io.load_corpus_mono_16k(wavs)
    assert len(out) == len(wavs)
    for p in wavs:
        name = os.path.basename(p)
        ref, sr = read_wav(p)
        expected = -(-ref.shape[0] * 16000 // 22050)
        assert abs(len(out[name]) - expected) <= 1


def test_float32_wav(tmp_path):
    import scipy.io.wavfile as siw

    x = np.random.default_rng(1).normal(size=500).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    siw.write(p, 16000, x)
    got, sr = native_io.decode_mono(p)
    assert sr == 16000
    np.testing.assert_allclose(got, x, atol=1e-7)


def test_corrupt_file(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"RIFFxxxxWAVEjunk")
    with pytest.raises(ValueError):
        native_io.decode_mono(str(p))


def test_load_corpus_duplicate_basenames_raise(tmp_path):
    a = tmp_path / "s1"; a.mkdir()
    b = tmp_path / "s2"; b.mkdir()
    x = np.zeros((1600, 1), dtype=np.float32)
    for d in (a, b):
        write_wav(str(d / "clip_001.wav"), x, 16000)
    with pytest.raises(ValueError, match="duplicate basenames"):
        native_io.load_corpus_mono_16k([str(a / "clip_001.wav"), str(b / "clip_001.wav")])
