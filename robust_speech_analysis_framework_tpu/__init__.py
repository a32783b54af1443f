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
