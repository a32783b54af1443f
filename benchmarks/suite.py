"""Full benchmark suite over the BASELINE.json config set.

Measures, on the current JAX backend (TPU when available):

1. MSHDS 25-feature extraction throughput (audio-sec/sec);
2. openSMILE-style 912-feature extraction throughput over a reading-set-like
   batch;
3. Wav2Vec2 sequence-embedding extraction throughput (batched chunks);
4. CNN-LSTM inference p50 latency + audio-sec/sec (the bench.py headline);
5. a standard 5-fold SVM + a short CNN-LSTM CV round (end-to-end eval path).

Synthetic speech-like audio stands in for the corpus (no corpus audio ships
with the reference checkout — its data/ holds LFS pointers only). Results
are written to ``benchmarks/results.json``.

Run: ``python -m benchmarks.suite [--quick]``
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SR = 16000


def _speech(seconds: float, f0: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    v = sum(np.sin(2 * np.pi * k * f0 * (1 + 0.01 * np.sin(2 * np.pi * 3 * t)) * t) / k
            for k in range(1, 12))
    gate = np.where((t % 0.6) < 0.42, 1.0, 0.02)
    x = (0.3 * gate * v / np.abs(v).max()
         + 0.002 * rng.normal(size=len(t)))
    # quantize to 16-bit PCM like a decoded corpus WAV (the real pipeline
    # feeds n/32768 floats; this also engages the extractors' lossless
    # int16 upload fast path)
    return (np.clip(np.round(x * 32768.0), -32768, 32767) / 32768.0
            ).astype(np.float32)


def bench_mshds(n_files: int, seconds: float) -> dict:
    import pandas as pd

    from robust_speech_analysis_framework_tpu.features.mshds import (
        extract_mshds_batch,
    )

    # NB: at 20 s the f0=150/210 members carry a ~25 ms voiced sliver that
    # NaNs their CPP column by design (reference src/mshds_extractor.py:
    # 269-301 wall; locked by tests/test_mshds.py::
    # test_cpps_short_voiced_segment_nans_whole_file). mean_F0 stays finite,
    # so the nan_rows guard below is unaffected.
    waves = {f"f{i}.wav": _speech(seconds, 120 + 15 * i, i) for i in range(n_files)}
    warm = {f"w{i}.wav": _speech(seconds, 125 + 15 * i, 70 + i) for i in range(n_files)}
    extract_mshds_batch(warm, SR, n_workers=8, verbose=False)  # compile
    # first pass carries residual data-dependent compiles/cache loads; the
    # steady state (what a real 111-file/~1h-audio corpus amortizes to) is
    # the headline, taken as best-of-3 so a single bad tunnel window cannot
    # masquerade as a code regression (round 3's 814→413 audio-s/s swing
    # was never attributed); all repeats are recorded alongside.
    t0 = time.perf_counter()
    out = extract_mshds_batch(waves, SR, n_workers=8, verbose=False)
    dt_first = time.perf_counter() - t0
    repeats = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = extract_mshds_batch(waves, SR, n_workers=8, verbose=False)
        repeats.append(time.perf_counter() - t0)
    dt = min(repeats)
    nan_rows = int(out["mean_F0"].isna().sum())
    if nan_rows > n_files // 4:
        # a wedged device client NaN-fills rows; let the isolated-stage retry
        # rerun this in a fresh process
        raise RuntimeError(f"mshds extraction produced {nan_rows} NaN rows")
    return {
        "audio_seconds": n_files * seconds,
        "wall_seconds": dt,
        "nan_rows": nan_rows,
        "audio_sec_per_sec": n_files * seconds / dt,
        "first_pass_audio_sec_per_sec": n_files * seconds / dt_first,
        "repeat_audio_sec_per_sec": [n_files * seconds / r for r in repeats],
        # dominant link payload: int16 waveform upload (the 25 feature
        # values per file coming back are noise) — lets run_stage label the
        # stage compute- vs link-bound against the measured link bandwidth
        "payload_up_mb": n_files * seconds * SR * 2 / 2**20,
        "payload_down_mb": 0.0,
    }


def bench_opensmile(n_files: int, seconds: float) -> dict:
    from robust_speech_analysis_framework_tpu.features.opensmile import OpenSmileExtractor

    ex = OpenSmileExtractor()
    warm = {f"w{i}.wav": _speech(seconds, 140, 90 + i) for i in range(n_files)}
    ex.extract_batch(warm, verbose=False)  # compile at the batch shape
    waves = {f"f{i}.wav": _speech(seconds, 120 + 15 * i, i) for i in range(n_files)}
    t0 = time.perf_counter()
    df = ex.extract_batch(waves, verbose=True)
    dt_first = time.perf_counter() - t0
    repeats = []
    for _ in range(3):  # best-of-3 steady state (see bench_mshds)
        t0 = time.perf_counter()
        df = ex.extract_batch(waves, verbose=True)
        repeats.append(time.perf_counter() - t0)
    dt = min(repeats)
    if len(df) != n_files:
        raise RuntimeError(f"extraction incomplete: {len(df)}/{n_files} rows")
    return {
        "audio_seconds": n_files * seconds,
        "wall_seconds": dt,
        "audio_sec_per_sec": n_files * seconds / dt,
        "first_pass_audio_sec_per_sec": n_files * seconds / dt_first,
        "repeat_audio_sec_per_sec": [n_files * seconds / r for r in repeats],
        # int16 waveform upload dominates; the (B, 12, 38)×2 functional
        # blocks coming back are ~4 KB/file
        "payload_up_mb": n_files * seconds * SR * 2 / 2**20,
        "payload_down_mb": n_files * 2 * 12 * 38 * 4 / 2**20,
    }


def bench_wav2vec2(n_files: int, seconds: float) -> dict:
    """Both reference wav2vec2 paths: full (T,768) sequences (nb03) and
    on-device mean-pooled embeddings (nb01/SVM). The sequences number is
    transfer-bound on this rig — the chip tunnel caps at ~50 MB/s and the
    per-audio-second payload is 64 KB up + 153 KB down in f32. The headline
    numbers use the reduced-transfer paths (int16 upload, bf16 compute;
    'fast' = f16 sequence download, 32 KB up + 77 KB down; 'fastest' = int8
    per-frame-quantized download, 32 KB up + ~39 KB down; both cosine
    >0.9999 vs strict — tests/test_wav2vec2.py); strict-f32 numbers are
    reported alongside."""
    import warnings

    from robust_speech_analysis_framework_tpu.features.wav2vec2 import Wav2Vec2Extractor

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # int16 upload is BIT-EXACT for 16-bit-PCM-derived audio (every
        # corpus WAV, and _speech's lattice-quantized synthesis): the
        # strict path keeps f32 compute + f32 download and still halves
        # its host→device stream
        strict = Wav2Vec2Extractor(
            batch_size=16, allow_random_init=True, upload_dtype=np.int16
        )
    fast = Wav2Vec2Extractor(
        params=strict.params, batch_size=16, compute_dtype="bfloat16",
        sequence_transfer_dtype=np.float16, upload_dtype=np.int16,
    )
    fastest = Wav2Vec2Extractor(
        params=strict.params, batch_size=16, compute_dtype="bfloat16",
        sequence_transfer_dtype=np.int8, upload_dtype=np.int16,
    )
    # f32 compute + per-frame int16-quantized download: frame-scale
    # relative error ~3e-5 (inside the ≤1e-4 contract on the FROBENIUS
    # reading; its max ELEMENTWISE error is ~1.5e-2) at half the f32
    # download bytes
    exact16 = Wav2Vec2Extractor(
        params=strict.params, batch_size=16,
        sequence_transfer_dtype=np.int16, upload_dtype=np.int16,
    )
    # f32 compute + int16+int8-residual download (3 bytes/element): max
    # ELEMENTWISE relative error ~6e-5 — passes the ≤1e-4 contract on the
    # strict elementwise reading, at 75% of the f32 download bytes
    exact24 = Wav2Vec2Extractor(
        params=strict.params, batch_size=16,
        sequence_transfer_dtype="int24", upload_dtype=np.int16,
    )
    warm = {f"w{i}.wav": _speech(5.0, 140, i) for i in range(2)}
    # 3x the shared file count: at 5 s chunks/16-chunk batches the other
    # stages' corpus is only ~2 batches, which measures ramp, not the
    # pipelined steady state a real (~1 h audio) corpus runs at
    n_files = 3 * n_files
    waves = {f"f{i}.wav": _speech(seconds, 120 + 10 * i, i) for i in range(n_files)}
    out = {"audio_seconds": n_files * seconds}

    # Accuracy of the reduced-transfer presets against the BASELINE.md
    # contract ("<=1e-4 relative feature error"): measured against the
    # strict-f32 path on real bench audio, as (a) max elementwise
    # |Δ|/max(|strict|, 1e-3·scale) — floored so near-zero features don't
    # report meaningless ratios — and (b) Frobenius-norm relative error.
    probe = {k: waves[k] for k in list(waves)[:2]}
    ref_seq = strict.extract_sequences(probe, verbose=False)
    for label, ex in (
        ("fast", fast), ("fastest", fastest), ("exact16", exact16),
        ("exact24", exact24),
    ):
        max_rel = fro_rel = 0.0
        for name, r in ref_seq.items():
            a = ex.extract_sequences({name: probe[name]}, verbose=False)[name]
            floor = 1e-3 * float(np.max(np.abs(r)))
            max_rel = max(max_rel, float(np.max(
                np.abs(a - r) / np.maximum(np.abs(r), floor)
            )))
            fro_rel = max(fro_rel, float(
                np.linalg.norm(a - r) / np.linalg.norm(r)
            ))
        out[f"{label}_max_rel_error"] = max_rel
        out[f"{label}_fro_rel_error"] = fro_rel
    for label, ex in (
        ("strict_f32", strict), ("fast", fast), ("fastest", fastest),
        ("exact16", exact16), ("exact24", exact24),
    ):
        ex.extract_sequences(warm, verbose=False)  # compile
        if label in ("strict_f32", "fast"):  # pooled path: f32 vs bf16 only
            ex.extract_embeddings(warm, verbose=False)
        t0 = time.perf_counter()
        ex.extract_sequences(waves, verbose=False)
        dt = time.perf_counter() - t0
        out[f"{label}_audio_sec_per_sec"] = n_files * seconds / dt
        if label in ("strict_f32", "fast"):
            t0 = time.perf_counter()
            ex.extract_embeddings(waves, verbose=False)
            dt_emb = time.perf_counter() - t0
            out[f"{label}_embeddings_audio_sec_per_sec"] = (
                n_files * seconds / dt_emb
            )
    # The HEADLINE number (and vs_baseline) is the contract number: the
    # fastest preset whose measured MAX ELEMENTWISE relative error vs
    # strict f32 is ≤1e-4 (the strict reading of BASELINE.md's "≤1e-4
    # relative feature error" — no silent dependence on the norm choice;
    # Frobenius errors are reported alongside per preset). Faster
    # out-of-contract presets are reported as side metrics only.
    presets = ("fast", "fastest", "exact16", "exact24")
    contract = [
        l for l in presets if out.get(f"{l}_max_rel_error", 1.0) <= 1e-4
    ]
    best_contract = max(
        ["strict_f32"] + contract,
        key=lambda l: out[f"{l}_audio_sec_per_sec"],
    )
    out["contract_preset"] = best_contract
    out["contract_audio_sec_per_sec"] = out[
        f"{best_contract}_audio_sec_per_sec"
    ]
    best_any = max(
        ("strict_f32",) + presets,
        key=lambda l: out[f"{l}_audio_sec_per_sec"],
    )
    out["offcontract_preset"] = best_any
    out["offcontract_audio_sec_per_sec"] = out[f"{best_any}_audio_sec_per_sec"]
    out["offcontract_max_rel_error"] = out.get(f"{best_any}_max_rel_error", 0.0)
    out["headline_preset"] = best_contract
    out["headline_max_rel_error"] = out.get(f"{best_contract}_max_rel_error", 0.0)
    out["audio_sec_per_sec"] = out["contract_audio_sec_per_sec"]
    out["wall_seconds"] = n_files * seconds / out["audio_sec_per_sec"]
    # link payload of the headline (contract) preset: int16 chunk upload
    # (5 s chunks / 4 s step → ×1.25 overlap duplication) down against the
    # per-element sequence download bytes of the preset
    seq_bytes = {"strict_f32": 4.0, "fast": 2.0, "fastest": 1.0,
                 "exact16": 2.0, "exact24": 3.0}[best_contract]
    frames = n_files * seconds * 1.25 * 49.9
    out["payload_up_mb"] = n_files * seconds * 1.25 * SR * 2 / 2**20
    out["payload_down_mb"] = frames * 768 * seq_bytes / 2**20
    # MFU of the contract preset's encoder program: one 16-chunk batch
    # covers 16 × 4 s (step) of real audio, so batches/s = aps / 64
    import jax.numpy as jnp

    ex = {"strict_f32": strict, "fast": fast, "fastest": fastest,
          "exact16": exact16, "exact24": exact24}[best_contract]
    batch = jnp.zeros((ex.batch_size, ex.chunk_size),
                      jnp.dtype(ex.upload_dtype))
    lens = jnp.full((ex.batch_size,), ex.chunk_size, jnp.int32)
    cost = _program_cost(ex._forward, ex.params, batch, lens)
    if cost:
        out["flops_per_batch"] = cost["flops"]
        wall_per_batch = (ex.batch_size * 4.0) / out["audio_sec_per_sec"]
        _attach_mfu(out, cost["flops"], wall_per_batch)
    out["embeddings_audio_sec_per_sec"] = out["fast_embeddings_audio_sec_per_sec"]
    # the link's speed-of-light for this preset: zero-compute throughput if
    # the measured link were the only cost. Recorded so a below-target
    # contract number is attributable (VERDICT r4 item 4: ">=300 au-s/s or
    # a documented proof the tunnel floor makes that unreachable").
    try:
        link = link_probe()
        up_per_as = 1.25 * SR * 2 / 2**20  # int16 chunks, x1.25 overlap
        down_per_as = 1.25 * 49.9 * 768 * seq_bytes / 2**20
        out["link_floor_audio_sec_per_sec"] = 1.0 / (
            up_per_as / link["up_mb_per_s"]
            + down_per_as / link["down_mb_per_s"]
        )
        out["link_floor_probe"] = link
    except Exception:
        pass
    return out


def bench_wav2vec2_fused(n_files: int, seconds: float) -> dict:
    """Fused extract→train handoff vs the round-trip path (VERDICT r4
    item 4): extract the corpus's Wav2Vec2 sequences and run a CNN-LSTM
    standard K-fold on them, (a) fused — sequences scatter straight into a
    device-resident corpus, zero sequence download — and (b) unfused —
    sequences stream to host, then re-upload into a DeviceCorpus (the
    reference artifact flow, src/foundation_model_extractor.py:97-124 →
    dl_cv_strategies.py)."""
    import warnings

    import pandas as pd

    from robust_speech_analysis_framework_tpu.features.wav2vec2 import (
        Wav2Vec2Extractor,
    )
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        run_dl_standard_kfold_cv,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ex = Wav2Vec2Extractor(
            batch_size=16, allow_random_init=True, upload_dtype=np.int16
        )
    n_files = max(n_files * 3, 20)  # >=20 participants for the inner split
    waves = {
        f"{i:02d}_{'P' if i % 2 else 'C'}": _speech(seconds, 120 + 4 * i, i)
        for i in range(n_files)
    }
    meta = pd.DataFrame([
        {"unique_participant_id": k,
         "label": "Patient" if k.endswith("P") else "Control"}
        for k in waves
    ])
    hp = {"learning_rate": 1e-3, "dropout_rate": 0.3,
          "cnn_out_channels": 64, "lstm_hidden_dim": 64,
          "activation_fn": "silu"}
    kw = dict(n_splits=3, epochs=3, patience=4, batch_size=4)

    # warm both paths (compile + AOT loads) at the MEASURED corpus shape —
    # same file count and lengths, different audio — otherwise whichever
    # path runs first eats every shape-specific compile and the comparison
    # measures compile order, not the handoff (observed: fused 'slower' 9×)
    warm = {
        f"{i:02d}_{'P' if i % 2 else 'C'}": _speech(seconds, 130 + 4 * i,
                                                    1000 + i)
        for i in range(n_files)
    }
    wmeta = pd.DataFrame([
        {"unique_participant_id": k,
         "label": "Patient" if k.endswith("P") else "Control"}
        for k in warm
    ])
    run_dl_standard_kfold_cv(
        ex.extract_sequences_resident(warm, verbose=False), wmeta, hp, **kw)
    run_dl_standard_kfold_cv(
        ex.extract_sequences(warm, verbose=False), wmeta, hp, **kw)

    t0 = time.perf_counter()
    res = ex.extract_sequences_resident(waves, verbose=False)
    run_dl_standard_kfold_cv(res, meta, hp, **kw)
    fused_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    host_seqs = ex.extract_sequences(waves, verbose=False)
    run_dl_standard_kfold_cv(host_seqs, meta, hp, **kw)
    unfused_dt = time.perf_counter() - t0

    frames = sum(s.shape[0] for s in host_seqs.values())
    audio = n_files * seconds
    return {
        "audio_seconds": audio,
        "fused_seconds": fused_dt,
        "unfused_seconds": unfused_dt,
        "fused_audio_sec_per_sec": audio / fused_dt,
        "unfused_audio_sec_per_sec": audio / unfused_dt,
        "speedup": unfused_dt / fused_dt,
        # by construction: the fused path downloads per-fold logits/metrics
        # only — no (T,768) sequence ever crosses the link
        "fused_sequence_download_mb": 0.0,
        "unfused_sequence_download_mb": frames * 768 * 4 / 2**20,
        "unfused_sequence_reupload_mb": (
            float(np.prod(res.x.shape)) * 4 / 2**20
        ),
        "wall_seconds": fused_dt,
        "payload_up_mb": audio * 1.25 * SR * 2 / 2**20,
        "payload_down_mb": 0.0,
    }


# Peak dense-matmul throughput per chip used for MFU reporting, by
# device_kind. TPU v5e: 197 TFLOP/s bf16 (XLA's DEFAULT matmul precision on
# TPU feeds the MXU bf16 inputs with f32 accumulation at full rate, so this
# is the honest peak for f32-declared models too). Unknown kinds → no MFU.
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _program_cost(fn, *args) -> dict:
    """XLA's own cost analysis for one jitted program: analytic FLOPs +
    bytes accessed. Returns {} when the backend doesn't expose it."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes_accessed": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return {}


def _attach_mfu(result: dict, flops_per_call: float, wall_per_call: float):
    """result gains mfu = achieved FLOP/s over the chip's dense peak."""
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "")
    peak = _PEAK_FLOPS.get(kind)
    if peak and flops_per_call and wall_per_call > 0:
        result["achieved_tflops"] = flops_per_call / wall_per_call / 1e12
        result["mfu"] = flops_per_call / wall_per_call / peak
        result["peak_tflops_assumed"] = peak / 1e12


def bench_cnn_lstm() -> dict:
    import jax
    import jax.numpy as jnp

    from benchmarks.flagship import PAD_LEN, SEQ_LEN, build_forward

    BATCH, FPS = 128, 49.9
    if jax.default_backend() == "cpu":
        BATCH = 8  # CPU baseline at the torch-baseline batch size
    # shared flagship program (disk-AOT-backed, byte-identical to the one
    # the driver's bench.py measures — this run pre-seeds its caches)
    fwd, variables, lengths = build_forward(BATCH)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, PAD_LEN, 768)), jnp.float32
    )
    np.asarray(fwd(variables, x, lengths))
    times = []
    for i in range(5 if BATCH > 8 else 2):
        t0 = time.perf_counter()
        np.asarray(fwd(variables, x + jnp.float32(i * 1e-6), lengths))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio = x.shape[0] * SEQ_LEN / FPS
    out = {"p50_batch_seconds": p50, "batch": int(x.shape[0]),
           "audio_sec_per_sec": audio / p50,
           # full per-rep list (the extraction stages' best-of-3 analogue):
           # round-over-round drift is attributable at a glance
           "repeat_audio_sec_per_sec": [audio / t for t in times]}
    cost = _program_cost(fwd, variables, x, lengths)
    if cost:
        out["flops_per_batch"] = cost["flops"]
        _attach_mfu(out, cost["flops"], p50)
    # the timed loop reads the (BATCH, 2) logits back and perturbs x on
    # device — payloads are negligible, so this stage is compute-bound by
    # construction; the transfer-bound stages record payload fields instead
    return out


def bench_cv(quick: bool) -> dict:
    import pandas as pd

    from robust_speech_analysis_framework_tpu.eval.svm_cv import (
        run_svm_standard_kfold_cv,
    )
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        run_dl_standard_kfold_cv,
    )

    # Warm the device link before any timed first pass: the tunneled
    # backend's first RPC after an idle window has been observed to stall
    # for minutes (observed 124s/407s outliers on an 0.5s measurement).
    # A throwaway compile + round trip absorbs the wedge so the timings
    # below measure OUR first-pass cost (trace + cache load + upload),
    # not the link's wake-up.
    import jax
    import jax.numpy as jnp

    warm = np.random.default_rng(1).normal(size=(256, 256)).astype(np.float32)
    np.asarray(jax.jit(lambda a: (a @ a).sum())(jnp.asarray(warm)))

    from robust_speech_analysis_framework_tpu.utils.profiling import (
        span_report,
    )

    rng = np.random.default_rng(0)
    n, d = 110, 911
    X = pd.DataFrame(rng.normal(size=(n, d)))
    X.columns = [f"f{i}" for i in range(d)]
    y = (rng.random(n) > 0.5).astype(int)
    span_report(reset=True)
    t0 = time.perf_counter()
    run_svm_standard_kfold_cv(X, y, n_features_to_select=50)
    svm_dt = time.perf_counter() - t0
    svm_spans = span_report(reset=True)
    # steady state: on an accelerator backend the batched device SMO's
    # one-off jit compile is out of the way — this is what a sweep of 18
    # experiments actually runs at
    t0 = time.perf_counter()
    run_svm_standard_kfold_cv(X, y, n_features_to_select=50)
    svm_dt2 = time.perf_counter() - t0

    seqs, rows = {}, []
    for i in range(20):
        pid = f"{i:02d}_{'P' if i % 2 else 'C'}"
        seqs[pid] = rng.normal(size=(rng.integers(64, 256), 768)).astype(np.float32)
        rows.append({"unique_participant_id": pid,
                     "label": "Patient" if i % 2 else "Control"})
    hp = {"learning_rate": 1e-3, "dropout_rate": 0.3, "cnn_out_channels": 32,
          "lstm_hidden_dim": 64, "activation_fn": "silu"}
    meta = pd.DataFrame(rows)
    epochs = 2 if quick else 5
    span_report(reset=True)
    t0 = time.perf_counter()
    run_dl_standard_kfold_cv(seqs, meta, hp, n_splits=3,
                             epochs=epochs, patience=10, batch_size=4)
    dl_dt = time.perf_counter() - t0
    dl_spans = span_report(reset=True)
    # second round: every program is live, so this is the steady state a
    # real tuning sweep (hundreds of trials of the same shapes) runs at;
    # the first round is dominated by XLA compile/cache loading
    t0 = time.perf_counter()
    run_dl_standard_kfold_cv(seqs, meta, hp, n_splits=3,
                             epochs=epochs, patience=10, batch_size=4)
    dl_dt2 = time.perf_counter() - t0
    # One TPE-style tuning trial — the reference's dominant workload is
    # 25 of these per outer fold (src/dl_cv_strategies.py:197-254: 3 inner
    # folds × 15 fixed epochs × batch 4).
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        _TrainerCache, _as_device_corpus, _inner_cv_score,
        align_sequences_and_labels,
    )

    X, yv, _ = align_sequences_and_labels(seqs, meta)
    Xc = _as_device_corpus(X)
    cache = _TrainerCache(input_dim=768)
    inner_epochs = 3 if quick else 15
    _inner_cv_score(cache, hp, Xc, yv, 3, inner_epochs, 4, 42)  # compile
    t0 = time.perf_counter()
    _inner_cv_score(cache, hp, Xc, yv, 3, inner_epochs, 4, 42)
    trial_dt = time.perf_counter() - t0

    # A whole ask-8 round drawn from the FULL production search space (12
    # architectures) through the production sampler path — per-round
    # architecture commitment (_suggest_round) keeps all 8 trials in one
    # lane-vmapped program — vs the same 8 trials one at a time (the
    # reference runs all trials strictly sequentially,
    # src/dl_cv_strategies.py:308-310).
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        DEFAULT_SEARCH_SPACE, _inner_cv_scores_batch, _suggest_round,
    )
    from robust_speech_analysis_framework_tpu.tune import Study, TPESampler

    study = Study(direction="maximize", sampler=TPESampler(seed=7))
    plist = _suggest_round([study.ask() for _ in range(8)],
                           DEFAULT_SEARCH_SPACE)
    _inner_cv_scores_batch(cache, plist, Xc, yv, 3, inner_epochs, 4, 42)
    _inner_cv_score(cache, plist[0], Xc, yv, 3, inner_epochs, 4, 42)  # compile
    t0 = time.perf_counter()
    _inner_cv_scores_batch(cache, plist, Xc, yv, 3, inner_epochs, 4, 42)
    batched_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in plist:
        _inner_cv_score(cache, p, Xc, yv, 3, inner_epochs, 4, 42)
    sequential_dt = time.perf_counter() - t0

    return {"svm_standard_5fold_seconds": svm_dt, "dl_3fold_seconds": dl_dt,
            "svm_standard_5fold_steady_seconds": svm_dt2,
            "dl_3fold_steady_seconds": dl_dt2,
            "dl_tuning_trial_seconds": trial_dt,
            "dl_tuning_trials8_batched_seconds": batched_dt,
            "dl_tuning_trials8_sequential_seconds": sequential_dt,
            "dl_tuning_trials8_speedup": sequential_dt / batched_dt,
            # named first-pass cost decomposition (utils.profiling spans):
            # AOT deserialize vs trace+export vs init vs corpus upload
            "svm_first_pass_spans": svm_spans,
            "dl_first_pass_spans": dl_spans}


def _battery_svm_datasets(rng) -> dict:
    """Synthetic stand-ins for the nb02 cell-2 dataset grid: 3 feature sets
    (MSHDS d=25, openSMILE d=911, Wav2Vec2 d=768) × reading (n=111) /
    interview (n=109) / combined (d doubled) — the shapes the real
    18-experiment battery solves (BASELINE.json config 5)."""
    import pandas as pd

    dims = {"mshds": 25, "opensmile": 911, "wav2vec2": 768}
    out = {}
    for fs, d in dims.items():
        for kind, n, dd in (("reading", 111, d), ("interview", 109, d),
                            ("combined", 109, 2 * d)):
            y = (rng.random(n) > 0.5).astype(int)
            X = rng.normal(size=(n, dd)) + 0.3 * y[:, None] * rng.normal(size=dd)
            out[f"{fs}_{kind}"] = (pd.DataFrame(
                X, columns=[f"f{i}" for i in range(dd)]
            ), y)
    return out


def _battery_sequence_sets(rng, n_participants: int,
                           t_range=(512, 2048)):
    """Synthetic participant sequence sets for the 6 CNN-LSTM experiments.

    ``t_range`` defaults to reference scale: per-participant Wav2Vec2
    sequences are thousands of frames (one ~88 s reading file is (4378,
    768), SURVEY §6.4; aggregated interview sessions are longer still), and
    the combined set vstacks reading+interview (≈2×). Tiny toy lengths
    would over-weight per-step dispatch overhead on both sides of the
    comparison and under-represent the compute the reference battery
    actually runs."""
    import pandas as pd

    rows = []
    sets = {"reading": {}, "interview": {}, "combined": {}}
    lo, hi = t_range
    for i in range(n_participants):
        pid = f"{i:02d}_{'P' if i % 2 else 'C'}"
        r = rng.normal(size=(int(rng.integers(lo, hi)), 768)).astype(np.float32)
        iv = rng.normal(size=(int(rng.integers(lo, hi)), 768)).astype(np.float32)
        sets["reading"][pid] = r
        sets["interview"][pid] = iv
        sets["combined"][pid] = np.vstack([r, iv])
        rows.append({"unique_participant_id": pid,
                     "label": "Patient" if i % 2 else "Control"})
    return sets, pd.DataFrame(rows)


def bench_battery(quick: bool) -> dict:
    """BASELINE.json config 5 end to end: the full 18-experiment SVM battery
    (9 datasets × standard k=25 / nested grid) plus the 6 CNN-LSTM
    experiments (3 data types × tuned TPE / standard K-fold) on synthetic
    reference-shaped data, timed as ONE wall-clock number — first pass
    (fresh process: trace + AOT/XLA cache loads + upload) and steady state.
    This is where per-shape compile walls either amortize or drown the
    steady-state wins; the reference runs the same battery as sequential
    libsvm/torch loops (src/cv_strategies.py:136-147, dl_cv_strategies.py:
    308-310)."""
    import jax
    import jax.numpy as jnp

    from robust_speech_analysis_framework_tpu.eval.svm_cv import (
        run_svm_nested_kfold_cv, run_svm_standard_kfold_cv,
    )
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        run_dl_nested_cv, run_dl_standard_kfold_cv,
    )

    from robust_speech_analysis_framework_tpu.utils.profiling import (
        span_report,
    )

    # absorb tunnel wake-up so the timings measure our cost, not the link's
    np.asarray(jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256))))

    rng = np.random.default_rng(0)
    svm_sets = _battery_svm_datasets(rng)
    # the nested engine's final training carves an 80/20 split
    # (train_test_indices n_splits=5) out of each outer-train split, which
    # needs ≥5 members per class there: with 2 outer folds that means
    # ≥20 participants
    n_parts = 20 if quick else 24
    # quick mode keeps toy lengths (CI-speed smoke); the measured battery
    # runs reference-scale sequences (see _battery_sequence_sets)
    seq_sets, meta = _battery_sequence_sets(
        rng, n_parts, t_range=(64, 192) if quick else (512, 2048)
    )
    n_trials = 2 if quick else 4
    epochs = 2
    inner_epochs = 2
    trial_batch = n_trials

    # one resident upload per sequence set, shared by the nested AND
    # standard engines and by the steady pass — built lazily INSIDE the
    # timed region so the first pass honestly pays the (single) upload
    from robust_speech_analysis_framework_tpu.train.loops import (
        ResidentCorpus,
    )

    resident: dict = {}

    def get_set(kind):
        if kind not in resident:
            resident[kind] = ResidentCorpus(seq_sets[kind])
        return resident[kind]

    def run_once() -> dict:
        t0 = time.perf_counter()
        for name, (X, y) in svm_sets.items():
            run_svm_standard_kfold_cv(
                X, y, n_features_to_select=min(25, X.shape[1])
            )
            run_svm_nested_kfold_cv(X, y)
        svm_dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for kind in seq_sets:
            seqs = get_set(kind)
            df, _, _ = run_dl_nested_cv(
                seqs, meta, n_splits_outer=2, n_splits_inner=3,
                n_trials=n_trials, epochs=epochs, patience=epochs + 1,
                batch_size=4, inner_epochs=inner_epochs, inner_batch_size=4,
                trial_batch=trial_batch,
            )
            best = df.loc[df["f1_score"].idxmax()]["best_params"]
            run_dl_standard_kfold_cv(
                seqs, meta, best, n_splits=3, epochs=epochs,
                patience=epochs + 1, batch_size=4,
            )
        dl_dt = time.perf_counter() - t0
        return {"svm18_seconds": svm_dt, "dl6_seconds": dl_dt,
                "battery_seconds": svm_dt + dl_dt}

    span_report(reset=True)
    first = run_once()
    first_spans = span_report(reset=True)
    steady = run_once()
    return {
        **{k: v for k, v in first.items()},
        **{f"{k.replace('_seconds', '')}_steady_seconds": v
           for k, v in steady.items()},
        "n_svm_experiments": 2 * len(svm_sets),
        "n_dl_experiments": 2 * len(seq_sets),
        # first-pass decomposition (utils.profiling spans): AOT deserialize
        # vs trace+export vs init vs corpus upload — what the cold wall IS
        "first_pass_spans": first_spans,
    }


STAGES = ["mshds_extract", "opensmile_extract", "wav2vec2_extract",
          "wav2vec2_fused", "cnn_lstm_infer", "cv_round", "battery"]


def link_probe(n_mb: int = 8) -> dict:
    """Host↔device link bandwidth at measurement time.

    The sequence-transfer stages (wav2vec2 sequences, openSMILE fetches)
    are bound by this link on the tunneled dev rig, and it fluctuates by
    >4× with external load — recording it alongside the throughput numbers
    makes a bad-window measurement recognizable as such."""
    import jax
    import jax.numpy as jnp

    a = np.ones((n_mb << 20) // 4, np.float32)
    up = jnp.zeros(8)  # connection warm-up
    np.asarray(up)
    t0 = time.perf_counter()
    d = jnp.asarray(a)
    d.block_until_ready()
    up_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(d)
    down_s = time.perf_counter() - t0
    return {"up_mb_per_s": n_mb / up_s, "down_mb_per_s": n_mb / down_s}


def run_stage(name: str, quick: bool) -> dict:
    n_files = 3 if quick else 8
    seconds = 5.0 if quick else 20.0
    if name == "mshds_extract":
        return bench_mshds(n_files, seconds)
    if name == "opensmile_extract":
        return bench_opensmile(n_files, seconds)
    if name == "wav2vec2_extract":
        return bench_wav2vec2(n_files, seconds)
    if name == "wav2vec2_fused":
        return bench_wav2vec2_fused(n_files, seconds)
    if name == "cnn_lstm_infer":
        return bench_cnn_lstm()
    if name == "cv_round":
        return bench_cv(quick)
    if name == "battery":
        return bench_battery(quick)
    raise ValueError(name)


def _attach_link_bound(result: dict) -> None:
    """link_bound_fraction = the fraction of the stage's steady wall that
    pure payload transfer at the measured link bandwidth would take — ≥ ~1
    means the stage is running at the link's speed of light; ≪ 1 means the
    wall is compute (or dispatch overhead), not the link."""
    link = result.get("link") or {}
    wall = result.get("wall_seconds") or 0.0
    up = result.get("payload_up_mb")
    down = result.get("payload_down_mb")
    if not (wall and link.get("up_mb_per_s") and up is not None):
        return
    transfer_s = up / link["up_mb_per_s"]
    if down and link.get("down_mb_per_s"):
        transfer_s += down / link["down_mb_per_s"]
    result["link_bound_fraction"] = transfer_s / wall


def _load_json(path):
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return {}


def _attach_ratio(name: str, result: dict, baselines: dict) -> None:
    """Annotate ``result`` with vs_baseline against the stored CPU numbers.

    Extraction/inference stages compare audio-sec/sec; the cv_round stage
    compares wall seconds (lower is better, so ratio = baseline/ours)."""
    base = baselines.get(name)
    if not base or "error" in result:
        return
    try:
        if "audio_sec_per_sec" in result and "audio_sec_per_sec" in base:
            result["vs_baseline"] = (
                result["audio_sec_per_sec"] / base["audio_sec_per_sec"]
            )
            result["baseline_impl"] = base.get("impl", "jax-cpu")
        elif name == "battery":
            for key in ("battery_seconds", "svm18_seconds", "dl6_seconds",
                        "battery_steady_seconds"):
                ours = result.get(key)
                b = base.get(key)
                if key == "battery_steady_seconds" and not b:
                    b = base.get("battery_seconds")
                if ours and b:
                    result[f"vs_baseline_{key}"] = b / ours
            result["baseline_impl"] = base.get("impl", "jax-cpu")
        elif name == "cv_round":
            for key in ("svm_standard_5fold_seconds", "dl_3fold_seconds",
                        "dl_tuning_trial_seconds"):
                if key in result and base.get(key):
                    result[f"vs_baseline_{key}"] = base[key] / result[key]
            for stage in ("dl_3fold", "svm_standard_5fold"):
                # steady-vs-steady when the baseline recorded one, else the
                # baseline's first pass (older baselines.json files)
                ours = result.get(f"{stage}_steady_seconds")
                base_steady = base.get(f"{stage}_steady_seconds") or base.get(
                    f"{stage}_seconds"
                )
                if ours and base_steady:
                    result[f"vs_baseline_{stage}_steady"] = base_steady / ours
            # the end-to-end tuning-round win: the reference runs trials
            # strictly sequentially (src/dl_cv_strategies.py:308-310), so
            # the honest baseline for one ask-8 round is 8 sequential CPU
            # trials; ours is the lane-batched device round
            seq_cpu = base.get("dl_tuning_trials8_sequential_seconds")
            ours_batched = result.get("dl_tuning_trials8_batched_seconds")
            if seq_cpu and ours_batched:
                result["vs_baseline_dl_tuning_trials8_round"] = (
                    seq_cpu / ours_batched
                )
            result["baseline_impl"] = base.get("impl", "jax-cpu")
    except Exception:
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--stage", default=None, help="run ONE stage inline")
    parser.add_argument("--inline", action="store_true",
                        help="run all stages in this process (no isolation)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (baseline measurement)")
    parser.add_argument(
        "--baseline", action="store_true",
        help="measure every stage on the CPU backend and store the numbers "
             "in benchmarks/baselines.json (the 'reference CPU' side of "
             "BASELINE.md:41-43; note this host is 1-core)",
    )
    args = parser.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        # the site hook re-pins JAX_PLATFORMS at interpreter start; the
        # config flag is authoritative (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    if args.stage:
        result = run_stage(args.stage, args.quick)
        try:
            result["link"] = link_probe()
        except Exception:
            pass
        _attach_link_bound(result)
        print("STAGE_RESULT " + json.dumps(result))
        return

    if args.baseline:
        import subprocess
        import sys

        base_path = os.path.join(os.path.dirname(__file__), "baselines.json")
        baselines = _load_json(base_path)
        for name in STAGES:
            cmd = [sys.executable, "-m", "benchmarks.suite",
                   "--stage", name, "--cpu"]
            if args.quick:
                cmd.append("--quick")
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=3600,
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
                line = next(
                    (l for l in proc.stdout.splitlines()
                     if l.startswith("STAGE_RESULT ")), None,
                )
                if line:
                    entry = json.loads(line[len("STAGE_RESULT "):])
                    entry["impl"] = "jax-cpu"
                    entry["nproc"] = os.cpu_count()
                    if name == "cnn_lstm_infer" and name in baselines and \
                            baselines[name].get("impl") == "torch-cpu":
                        # keep the torch-CPU number as the reference-stack
                        # baseline; store the jax-cpu one alongside
                        baselines["cnn_lstm_infer_jaxcpu"] = entry
                    else:
                        baselines[name] = entry
                    print(f"{name}: {json.dumps(entry)}")
                else:
                    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
                    print(f"{name}: ERROR {' | '.join(tail[-3:])[:300]}")
            except subprocess.TimeoutExpired:
                print(f"{name}: timeout")
            print(f"  ({time.perf_counter() - t0:.1f}s)")
        with open(base_path, "w") as fh:
            json.dump(baselines, fh, indent=2)
        print(f"written: {base_path}")
        return

    import subprocess
    import sys

    import jax

    results = {"backend": jax.default_backend()}
    for name in STAGES:
        t0 = time.perf_counter()
        if args.inline:
            try:
                results[name] = run_stage(name, args.quick)
            except Exception as e:
                results[name] = {"error": str(e)[:300]}
        else:
            # Each stage in its own process: a wedged device client (remote
            # backends occasionally poison a process) can't sink the rest.
            # One retry per stage — a fresh process clears a wedged client.
            cmd = [sys.executable, "-m", "benchmarks.suite", "--stage", name]
            if args.quick:
                cmd.append("--quick")
            for attempt in range(2):
                try:
                    proc = subprocess.run(
                        cmd, capture_output=True, text=True, timeout=3600,
                        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    )
                    line = next(
                        (l for l in proc.stdout.splitlines()
                         if l.startswith("STAGE_RESULT ")), None,
                    )
                    if line:
                        results[name] = json.loads(line[len("STAGE_RESULT "):])
                        break
                    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
                    results[name] = {"error": " | ".join(tail[-3:])[:300]}
                except subprocess.TimeoutExpired:
                    results[name] = {"error": "stage timeout"}
        results[name]["total_seconds"] = time.perf_counter() - t0
        _attach_ratio(
            name, results[name],
            _load_json(os.path.join(os.path.dirname(__file__), "baselines.json")),
        )
        print(f"{name}: {json.dumps(results[name])}")

    out = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"written: {out}")


if __name__ == "__main__":
    main()
