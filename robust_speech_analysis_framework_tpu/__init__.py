"""robust_speech_analysis_framework_tpu — a TPU-native speech analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`ayushpradhan-dev/robust-speech-analysis-framework` (depression detection from
speech on the Androids Corpus): batched acoustic feature extraction (MSHDS-25,
openSMILE-style 911-feature functionals, Wav2Vec2 embeddings), classifiers
(linear SVM, CNN-LSTM) and standard/nested cross-validation engines — designed
TPU-first (SPMD over device meshes, functional transforms, fused kernels)
rather than as a port of the reference's per-file CPU loops.

Subpackage map (mirrors SURVEY.md §2 component inventory):
  audio/      WAV IO, resampling, framed STFT→mel→MFCC front end
  ops/        DSP building blocks (pitch, formants, cepstrum, functionals, ...)
  features/   MSHDS-25, openSMILE-911 and Wav2Vec2 extractors
  models/     CNN-LSTM (Flax), Wav2Vec2-base (JAX), linear SVM
  data/       Androids corpus loader, session aggregation, bucketed batching
  train/      jitted train loops, schedulers, checkpoints
  eval/       stratified K-fold splits, metrics, SVM/DL CV engines
  tune/       TPE hyperparameter search (Optuna-equivalent, host-side)
  parallel/   mesh/sharding helpers for multi-chip extraction + training
  utils/      logging, profiling, misc
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("RSAF_NO_COMPILE_CACHE") not in ("1", "true"):
    # Persistent XLA compilation cache: the corpus-batched DSP ops compile
    # one program per (bucketed shape, params) and TPU compiles are tens of
    # seconds — caching them across processes turns every re-run's warmup
    # from minutes into seconds. Opt out with RSAF_NO_COMPILE_CACHE=1.
    import jax as _jax

    def _machine_tag() -> str:
        # CPU-feature fingerprint in the default cache path: XLA:CPU AOT
        # entries compiled on a host with different ISA features load with
        # "could lead to SIGILL" warnings when the cache directory migrates
        # between machines (observed on this rig). A per-feature-set subdir
        # keeps each machine's entries to itself. TPU entries are unaffected
        # either way.
        try:
            import hashlib

            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        return hashlib.sha1(
                            " ".join(sorted(line.split()[2:])).encode()
                        ).hexdigest()[:10]
        except Exception:
            pass
        import platform

        return platform.machine() or "unknown"

    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
        _os.path.expanduser("~/.cache/rsaf_xla"), _machine_tag()
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the option
        pass
