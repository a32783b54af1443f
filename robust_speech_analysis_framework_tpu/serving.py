"""Single-call inference: audio file(s) → classification.

The reference has no serving path (models only exist inside CV loops); this
module provides the deployment story: a :class:`Predictor` that owns the
Wav2Vec2 feature extractor and a trained CNN-LSTM, loads weights from either
this framework's checkpoints (train/checkpoints.py schema) or the
reference's torch ``.pt`` artifacts (models/torch_port.py), and serves
``predict(waveform)`` / ``predict_files(paths)`` with jitted, bucketed
inference.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .features.wav2vec2 import Wav2Vec2Extractor
from .models import CNNLSTM

LABELS = {0: "Control", 1: "Patient"}


@dataclass
class Prediction:
    label: str
    probability: float  # P(Patient)
    logits: np.ndarray
    latency_seconds: float


class Predictor:
    def __init__(
        self,
        model: CNNLSTM,
        variables,
        extractor: Optional[Wav2Vec2Extractor] = None,
        min_bucket: int = 256,
    ):
        self.model = model
        self.variables = variables
        # may be None: predict_sequence() works on precomputed embeddings;
        # the waveform entry points check via _require_extractor
        self.extractor = extractor
        self.min_bucket = min_bucket
        self._forward = jax.jit(
            lambda v, x, l: self.model.apply(v, x, train=False, lengths=l)
        )

    # --- constructors ------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, extractor=None, **kwargs) -> "Predictor":
        """Load a framework checkpoint (train/checkpoints.py schema)."""
        from .train.checkpoints import load_model_checkpoint, unflatten_params

        payload = load_model_checkpoint(path)
        hp = payload["hyperparameters"]
        model = CNNLSTM(
            input_dim=int(hp.get("input_dim", 768)),
            cnn_out_channels=int(hp.get("cnn_out_channels", 128)),
            lstm_hidden_dim=int(hp.get("lstm_hidden_dim", 128)),
            dropout_rate=float(hp.get("dropout_rate", 0.5)),
            activation_fn=str(hp.get("activation_fn", "silu")),
        )
        example = jnp.zeros((1, 8, model.input_dim))
        template = model.init(jax.random.PRNGKey(0), example, train=False)
        variables = unflatten_params(template, payload["model_state_dict"])
        return cls(model, variables, extractor, **kwargs)

    @classmethod
    def from_reference_checkpoint(cls, path: str, extractor=None, **kwargs) -> "Predictor":
        """Load a reference torch ``final_tuned_cnn_lstm_*.pt`` artifact."""
        from .models.torch_port import load_reference_checkpoint

        model, variables, _ = load_reference_checkpoint(path)
        return cls(model, variables, extractor, **kwargs)

    # --- inference ---------------------------------------------------------

    def _require_extractor(self) -> Wav2Vec2Extractor:
        if self.extractor is None:
            raise ValueError(
                "Predicting from audio needs a Wav2Vec2Extractor with "
                "pretrained weights (the classifier consumes "
                "wav2vec2-base-960h embeddings; random weights would give "
                "garbage predictions). Build one with "
                "Wav2Vec2Extractor.from_hf_checkpoint(path) and pass it to "
                "the Predictor (CLI: predict --wav2vec2-checkpoint PATH), "
                "or call predict_sequence() with precomputed embeddings."
            )
        return self.extractor

    def predict_sequence(self, sequence: np.ndarray) -> Prediction:
        """Classify a precomputed (T, D) embedding sequence."""
        from .data.batching import pad_batch

        t0 = time.perf_counter()
        batch, lengths = pad_batch([np.asarray(sequence, np.float32)],
                                   min_bucket=self.min_bucket)
        logits = np.asarray(
            self._forward(self.variables, jnp.asarray(batch), jnp.asarray(lengths))
        )[0]
        probs = np.exp(logits - logits.max())
        probs = probs / probs.sum()
        label_idx = int(np.argmax(logits))
        return Prediction(
            label=LABELS[label_idx],
            probability=float(probs[1]),
            logits=logits,
            latency_seconds=time.perf_counter() - t0,
        )

    def predict(self, waveform: np.ndarray) -> Prediction:
        """Classify a 16 kHz mono waveform (extraction + model)."""
        t0 = time.perf_counter()
        seqs = self._require_extractor().extract_sequences(
            {"_": waveform}, verbose=False
        )
        if "_" not in seqs:
            raise ValueError("audio too short for feature extraction (<0.5 s)")
        pred = self.predict_sequence(seqs["_"])
        return Prediction(
            label=pred.label,
            probability=pred.probability,
            logits=pred.logits,
            latency_seconds=time.perf_counter() - t0,
        )

    def predict_files(
        self, paths: Sequence[str], skip_failed: bool = False
    ) -> Dict[str, Prediction]:
        """Batch-classify audio files (native decode when available).

        Raises ValueError naming any file that could not be decoded or was
        too short for feature extraction (<0.5 s); pass ``skip_failed=True``
        to omit such files from the result instead.
        """
        from .audio.native_io import load_corpus_mono_16k

        waves = load_corpus_mono_16k(paths)
        seqs = self._require_extractor().extract_sequences(waves, verbose=False)
        failed = [os.path.basename(p) for p in paths
                  if os.path.basename(p) not in seqs]
        if failed and not skip_failed:
            raise ValueError(
                f"{len(failed)} file(s) could not be classified (decode failure "
                f"or <0.5 s audio): {failed[:5]}; pass skip_failed=True to omit"
            )
        return {name: self.predict_sequence(seq) for name, seq in seqs.items()}
