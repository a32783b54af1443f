"""Wav2Vec2 JAX model + extractor: parity vs HF torch, chunk semantics."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training/inference-heavy (pytest.ini)

import jax
import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    port_hf_state_dict,
)
from robust_speech_analysis_framework_tpu.features.wav2vec2 import Wav2Vec2Extractor


@pytest.fixture(scope="module")
def hf_pair():
    """Random-init 2-layer HF model + ported params (no network needed)."""
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config as HFCfg, Wav2Vec2Model as HFModel

    torch.manual_seed(0)
    hf = HFModel(HFCfg(num_hidden_layers=2)).eval()
    params = port_hf_state_dict({k: v.numpy() for k, v in hf.state_dict().items()})
    return hf, params


def test_output_length_formula():
    cfg = Wav2Vec2Config()
    # 5 s at 16 kHz → 249 frames (stride 320, receptive field 400)
    assert cfg.output_length(80000) == 249
    assert cfg.output_length(16000) == 49
    assert cfg.output_length(8000) == 24


def test_parity_vs_hf_single(hf_pair):
    import torch

    hf, params = hf_pair
    model = Wav2Vec2Model(Wav2Vec2Config(num_layers=2))
    wav = np.random.default_rng(0).normal(size=(1, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
    ours, _ = model.apply(params, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_parity_vs_hf_ragged_batch(hf_pair):
    import torch

    hf, params = hf_pair
    model = Wav2Vec2Model(Wav2Vec2Config(num_layers=2))
    rng = np.random.default_rng(1)
    lens = [16000, 9000, 12345]
    wavs = [rng.normal(size=l).astype(np.float32) * 0.1 for l in lens]
    padded = np.zeros((3, 16000), np.float32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
    ours, out_lens = model.apply(
        params, jnp.asarray(padded), lengths=jnp.asarray(lens)
    )
    ours, out_lens = np.asarray(ours), np.asarray(out_lens)
    for i, w in enumerate(wavs):
        with torch.no_grad():
            ref = hf(torch.tensor(w[None])).last_hidden_state.numpy()[0]
        assert out_lens[i] == ref.shape[0]
        np.testing.assert_allclose(ours[i, : out_lens[i]], ref, atol=2e-5)


def _tiny_extractor(params=None):
    return Wav2Vec2Extractor(
        params=params, config=Wav2Vec2Config(num_layers=2), batch_size=4,
        allow_random_init=True,
    )


def test_extractor_chunk_boundaries():
    ex = _tiny_extractor()
    sr = 16000
    # 11 s file: chunk starts at 0, 4, 8 s → chunks of 5, 5, 3 s
    wav = np.zeros(11 * sr, np.float32)
    chunks = ex._chunk(wav)
    assert [len(c) for c in chunks] == [5 * sr, 5 * sr, 3 * sr]
    # 16.2 s: starts 0,4,8,12,16 → 5,5,5,4.2,0.2 s; the 0.2 s tail dropped
    wav = np.zeros(int(16.2 * sr), np.float32)
    assert [len(c) for c in ex._chunk(wav)] == [
        5 * sr, 5 * sr, 5 * sr, int(4.2 * sr)
    ]


def test_extractor_sequence_shapes_and_overlap_duplication():
    ex = _tiny_extractor()
    cfg = ex.config
    sr = 16000
    rng = np.random.default_rng(2)
    seqs = ex.extract_sequences(
        {
            "a.wav": rng.normal(size=9 * sr).astype(np.float32) * 0.1,
            "short.wav": np.zeros(1000, np.float32),  # < 0.5 s → skipped
            "b.wav": rng.normal(size=4 * sr).astype(np.float32) * 0.1,
        },
        verbose=False,
    )
    assert set(seqs) == {"a.wav", "b.wav"}
    # 9 s → chunk starts 0/4/8 s → chunks 5 s, 5 s, 1 s; the 1 s overlaps are
    # NOT trimmed (reference quirk), so frames = 249 + 249 + 49
    assert seqs["a.wav"].shape == (
        2 * cfg.output_length(5 * sr) + cfg.output_length(sr), 768
    )
    assert seqs["b.wav"].shape == (cfg.output_length(4 * sr), 768)


def test_extractor_batched_equals_unbatched(hf_pair):
    """Corpus-batched extraction must equal one-chunk-at-a-time HF inference."""
    import torch

    hf, params = hf_pair
    ex = _tiny_extractor(params=params)
    sr = 16000
    rng = np.random.default_rng(3)
    wav = rng.normal(size=int(6.5 * sr)).astype(np.float32) * 0.1
    seqs = ex.extract_sequences({"x.wav": wav}, verbose=False)

    # reference-style serial chunking: 5 s chunk + 2.5 s chunk
    refs = []
    for start in (0, 4 * sr):
        c = wav[start : start + 5 * sr]
        with torch.no_grad():
            refs.append(hf(torch.tensor(c[None])).last_hidden_state.numpy()[0])
    ref = np.vstack(refs)
    assert seqs["x.wav"].shape == ref.shape
    np.testing.assert_allclose(seqs["x.wav"], ref, atol=3e-5)


def test_mean_pool_embeddings():
    ex = _tiny_extractor()
    sr = 16000
    df = ex.extract_embeddings(
        {"a.wav": np.random.default_rng(4).normal(size=2 * sr).astype(np.float32)},
        verbose=False,
    )
    assert df.shape == (1, 769)
    assert "filename" in df.columns
    assert "dim_767" in df.columns


def test_sharded_extraction_matches_unsharded():
    """dp/mp-sharded chunk batches must produce identical embeddings."""
    from robust_speech_analysis_framework_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    sr = 16000
    waves = {f"s{i}.wav": rng.normal(size=6 * sr).astype(np.float32) * 0.1
             for i in range(3)}
    base = Wav2Vec2Extractor(config=Wav2Vec2Config(num_layers=2), batch_size=4, allow_random_init=True)
    mesh = make_mesh(8, mp=2)
    with mesh:
        sharded = Wav2Vec2Extractor(
            params=base.params, config=Wav2Vec2Config(num_layers=2),
            batch_size=4, mesh=mesh,
        )
        out_sharded = sharded.extract_sequences(waves, verbose=False)
    out_base = base.extract_sequences(waves, verbose=False)
    assert set(out_sharded) == set(out_base)
    for k in out_base:
        np.testing.assert_allclose(out_sharded[k], out_base[k], atol=2e-4)


def test_int16_upload_is_lossless_on_pcm_lattice():
    """upload_dtype=int16 must be bit-exact for waveforms on the x/32768
    PCM lattice (what audio.io.load_mono_16k produces for un-resampled
    16-bit WAVs): the dequantized device waveform equals the f32 one."""
    cfg = Wav2Vec2Config(num_layers=2)
    rng = np.random.default_rng(11)
    sr = 16000
    waves = {
        "a.wav": (rng.integers(-20000, 20000, size=sr) / 32768.0).astype(
            np.float32
        )
    }
    base = Wav2Vec2Extractor(config=cfg, batch_size=4, allow_random_init=True)
    quant = Wav2Vec2Extractor(
        params=base.params, config=cfg, batch_size=4, upload_dtype=np.int16
    )
    a = base.extract_sequences(waves, verbose=False)["a.wav"]
    b = quant.extract_sequences(waves, verbose=False)["a.wav"]
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="normalize"):
        Wav2Vec2Extractor(
            params=base.params, config=cfg, upload_dtype=np.int16,
            normalize=True,
        )


def test_reduced_precision_fast_path_close_to_f32():
    """bf16 compute + f16 sequence download: output is still handed out as
    f32 and stays within ~1e-2 cosine distance of the strict path."""
    cfg = Wav2Vec2Config(num_layers=2)
    rng = np.random.default_rng(12)
    sr = 16000
    waves = {"a.wav": rng.normal(size=sr).astype(np.float32) * 0.1}
    base = Wav2Vec2Extractor(config=cfg, batch_size=4, allow_random_init=True)
    fast = Wav2Vec2Extractor(
        params=base.params, config=cfg, batch_size=4,
        compute_dtype="bfloat16", sequence_transfer_dtype=np.float16,
        upload_dtype=np.int16,
    )
    assert fast.config.compute_dtype == "bfloat16"
    a = base.extract_sequences(waves, verbose=False)["a.wav"]
    b = fast.extract_sequences(waves, verbose=False)["a.wav"]
    assert b.dtype == np.float32
    assert a.shape == b.shape
    cos = float(
        (a * b).sum()
        / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    )
    assert cos > 0.99, cos
    # pooled-embedding path under the same options
    df = fast.extract_embeddings(waves, verbose=False)
    ref = base.extract_embeddings(waves, verbose=False)
    ours = df[[f"dim_{k}" for k in range(768)]].to_numpy()
    theirs = ref[[f"dim_{k}" for k in range(768)]].to_numpy()
    np.testing.assert_allclose(ours, theirs, atol=0.05, rtol=0.05)


def test_int16_sequence_transfer_meets_contract():
    """int16 per-frame quantized sequence download ('exact16' preset's
    transfer): with f32 compute the only error is the 1/32767-of-frame-max
    quantization — Frobenius relative error must sit inside the north-star
    <=1e-4 feature-error contract (BASELINE.md), unlike the bf16-compute
    presets (~1% measured)."""
    cfg = Wav2Vec2Config(num_layers=2)
    rng = np.random.default_rng(13)
    sr = 16000
    waves = {
        "a.wav": rng.normal(size=sr).astype(np.float32) * 0.1,
        "b.wav": rng.normal(size=2 * sr).astype(np.float32) * 0.05,
    }
    base = Wav2Vec2Extractor(config=cfg, batch_size=4, allow_random_init=True)
    q16 = Wav2Vec2Extractor(
        params=base.params, config=cfg, batch_size=4,
        sequence_transfer_dtype=np.int16,
    )
    for name in waves:
        a = base.extract_sequences(waves, verbose=False)[name]
        b = q16.extract_sequences(waves, verbose=False)[name]
        assert b.dtype == np.float32 and a.shape == b.shape
        fro = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert fro <= 1e-4, fro
        fmax = np.abs(a).max(axis=1, keepdims=True)
        # half a quantization step + f32 arithmetic rounding slack
        assert (np.abs(a - b) <= fmax * (1.0 / 65534.0 + 2e-6) + 1e-9).all()


def test_int24_sequence_transfer_meets_elementwise_contract():
    """int16+int8-residual download ('exact24' preset, 3 bytes/element):
    quantization step is scale/(32767*254) ≈ 1.2e-7 of the frame max, so
    the MAX ELEMENTWISE relative error (floored at 1e-3 of the global
    magnitude, the benchmark's accuracy metric) must pass the ≤1e-4
    contract on its strict elementwise reading — the property no
    16-bit-only transfer achieves (exact16 measures ~1.5e-2 elementwise)."""
    cfg = Wav2Vec2Config(num_layers=2)
    rng = np.random.default_rng(17)
    sr = 16000
    waves = {
        "a.wav": rng.normal(size=sr).astype(np.float32) * 0.1,
        "b.wav": rng.normal(size=2 * sr).astype(np.float32) * 0.05,
    }
    base = Wav2Vec2Extractor(config=cfg, batch_size=4, allow_random_init=True)
    q24 = Wav2Vec2Extractor(
        params=base.params, config=cfg, batch_size=4,
        sequence_transfer_dtype="int24",
    )
    for name in waves:
        a = base.extract_sequences(waves, verbose=False)[name]
        b = q24.extract_sequences(waves, verbose=False)[name]
        assert b.dtype == np.float32 and a.shape == b.shape
        floor = 1e-3 * float(np.abs(a).max())
        max_rel = float(
            np.max(np.abs(a - b) / np.maximum(np.abs(a), floor))
        )
        assert max_rel <= 1e-4, max_rel


def test_int8_sequence_transfer_close_to_f32():
    """int8 per-frame max-abs quantized sequence download ('fastest'
    preset's transfer): values dequantize on host to within ~0.5% of the
    strict f32 stream (quantization step = frame max / 127), handed out
    as f32 arrays of identical shape."""
    cfg = Wav2Vec2Config(num_layers=2)
    rng = np.random.default_rng(12)
    sr = 16000
    waves = {
        "a.wav": rng.normal(size=sr).astype(np.float32) * 0.1,
        "b.wav": rng.normal(size=2 * sr).astype(np.float32) * 0.05,
    }
    base = Wav2Vec2Extractor(config=cfg, batch_size=4, allow_random_init=True)
    q8 = Wav2Vec2Extractor(
        params=base.params, config=cfg, batch_size=4,
        sequence_transfer_dtype=np.int8,
    )
    for name in waves:
        a = base.extract_sequences(waves, verbose=False)[name]
        b = q8.extract_sequences(waves, verbose=False)[name]
        assert b.dtype == np.float32
        assert a.shape == b.shape
        # per-frame error bound: half a quantization step (frame_max/254)
        # plus the f16 scale's own rounding (~5e-4 relative)
        fmax = np.abs(a).max(axis=1, keepdims=True)
        bound = fmax / 254.0 + 1e-3 * fmax + 1e-7
        assert (np.abs(a - b) <= bound).all()
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.9999, cos


def test_int8_transfer_rejected_for_unknown_dtype():
    with pytest.raises(ValueError, match="sequence_transfer_dtype"):
        Wav2Vec2Extractor(
            config=Wav2Vec2Config(num_layers=2), allow_random_init=True,
            sequence_transfer_dtype=np.int32,
        )


def test_random_init_guard():
    """No-weights construction refuses; explicit opt-in warns and marks
    .pretrained False (VERDICT r1: the reference always runs pretrained
    wav2vec2-base-960h, src/foundation_model_extractor.py:39,66-72)."""
    with pytest.raises(ValueError, match="pretrained"):
        Wav2Vec2Extractor(config=Wav2Vec2Config(num_layers=2))
    with pytest.warns(UserWarning, match="RANDOM"):
        ex = Wav2Vec2Extractor(
            config=Wav2Vec2Config(num_layers=2), allow_random_init=True
        )
    assert ex.pretrained is False


def test_front_doors_handle_empty_dataframe():
    """A corpus with no Interview-Task yields an EMPTY (column-less)
    DataFrame; the front doors must return empty results instead of
    KeyError'ing on the missing filepath column (experiments.py runs them
    on interview_df unconditionally)."""
    import pandas as pd

    from robust_speech_analysis_framework_tpu.features.wav2vec2 import (
        extract_wav2vec2_embeddings,
        extract_wav2vec2_sequences,
    )

    empty = pd.DataFrame()
    assert extract_wav2vec2_sequences(empty) == {}
    assert extract_wav2vec2_embeddings(empty).empty


class TestResidentSequences:
    """Fused extract→train handoff (VERDICT r4 item 4): sequences extracted
    straight into a device-resident buffer, no host round trip."""

    def _corpus(self, n=3, seed=0):
        rng = np.random.default_rng(seed)
        # lengths spanning multi-chunk (>5 s) and partial final chunks
        secs = [6.2, 4.0, 9.5, 5.0, 1.1][:n]
        return {
            f"f{i}.wav": (0.1 * rng.normal(size=int(s * 16000))).astype(np.float32)
            for i, s in enumerate(secs)
        }

    def test_matches_extract_sequences(self):
        ex = _tiny_extractor()
        waves = self._corpus(5)
        host = ex.extract_sequences(waves, verbose=False)
        res = ex.extract_sequences_resident(waves, verbose=False)
        assert set(res.keys()) == set(host.keys())
        for name, seq in host.items():
            got = res[name]
            assert got.shape == seq.shape
            np.testing.assert_allclose(got, seq, atol=1e-5, rtol=1e-5)
        # padding beyond each row's length is exactly zero (scatter masks)
        x = np.asarray(res.x)
        for name in res.names:
            i = res.row(name)
            assert np.all(x[i, int(res.lengths[i]):] == 0.0)

    def test_short_file_skipped(self):
        ex = _tiny_extractor()
        res = ex.extract_sequences_resident(
            {"x.wav": np.zeros(1000, np.float32)}, verbose=False
        )
        assert len(res) == 0

    def test_regroup_matches_host_aggregation(self):
        from robust_speech_analysis_framework_tpu.data.aggregate import (
            aggregate_interview_sequences,
        )
        import pandas as pd

        ex = _tiny_extractor()
        waves = self._corpus(4)
        host = ex.extract_sequences(waves, verbose=False)
        res = ex.extract_sequences_resident(waves, verbose=False)
        meta = pd.DataFrame([
            {"filename": "f0.wav", "unique_participant_id": "p0"},
            {"filename": "f2.wav", "unique_participant_id": "p0"},
            {"filename": "f1.wav", "unique_participant_id": "p1"},
            {"filename": "f3.wav", "unique_participant_id": "p2"},
            {"filename": "missing.wav", "unique_participant_id": "p3"},
        ])
        want = aggregate_interview_sequences(host, meta)
        groups = {
            pid: list(g["filename"])
            for pid, g in meta.groupby("unique_participant_id", sort=False)
        }
        got = res.regroup(groups)
        assert set(got.keys()) == set(want.keys())
        for pid in want:
            np.testing.assert_allclose(
                got[pid], want[pid], atol=1e-5, rtol=1e-5
            )

    def test_dl_cv_on_resident_matches_host(self):
        """The CV engine consumes a ResidentSequences with identical results
        to the same sequences passed as host arrays."""
        import pandas as pd

        from robust_speech_analysis_framework_tpu.eval.dl_cv import (
            run_dl_standard_kfold_cv,
        )

        ex = _tiny_extractor()
        rng = np.random.default_rng(3)
        waves = {
            f"{i:02d}_{'P' if i % 2 else 'C'}":
                (0.1 * rng.normal(size=int(16000 * (1 + 0.2 * i))
                                  )).astype(np.float32)
            for i in range(20)
        }
        res = ex.extract_sequences_resident(waves, verbose=False)
        host = ex.extract_sequences(waves, verbose=False)
        meta = pd.DataFrame([
            {"unique_participant_id": k,
             "label": "Patient" if k.endswith("P") else "Control"}
            for k in waves
        ])
        hp = {"learning_rate": 1e-3, "dropout_rate": 0.3,
              "cnn_out_channels": 32, "lstm_hidden_dim": 64,
              "activation_fn": "silu"}
        kw = dict(n_splits=2, epochs=2, patience=3, batch_size=4)
        df_r, _, _, w_r = run_dl_standard_kfold_cv(res, meta, hp, **kw)
        df_h, _, _, w_h = run_dl_standard_kfold_cv(host, meta, hp, **kw)
        pd.testing.assert_frame_equal(df_r, df_h, atol=1e-5)
        np.testing.assert_allclose(w_r, w_h, atol=1e-5, rtol=1e-4)
